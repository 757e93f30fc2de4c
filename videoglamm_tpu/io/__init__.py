from .import_torch import (compose_videoglamm_params, import_clip_vision,
                           import_internvideo2, import_phi3, import_projector,
                           import_sam2, import_sam2_hiera,
                           import_text_hidden_fcs, import_videoglamm, t2j)
from .checkpoint import CheckpointManager, load_params, save_params
from .import_torch import (merge_lora_state_dict, quantize_phi3_params,
                           quantize_videoglamm_llm)
