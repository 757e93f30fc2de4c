from .clip_vit import CLIPVisionTower
from .internvideo2 import InternVideo2Tower
from .phi3 import Phi3ForCausalLM, init_kv_cache
from .projectors import TextHiddenFCs, VisionProjector, build_visual_prefix
from .multimodal import SplicedBatch, splice_visual_prefix
from .videoglamm import VideoGLaMM, VideoGLaMMOutput, ce_loss_fn, dice_loss, \
    sigmoid_ce_loss
from .sam1 import SAM1, SAM1ImageEncoder, SAM1MaskDecoder
from .sam1_predictor import SAM1AutomaticMaskGenerator, SAM1ImagePredictor
from .llama import LlamaForCausalLM, init_llama_kv_cache
