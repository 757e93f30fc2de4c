from .attention import dot_product_attention, flash_attention
from .norms import layer_norm, rms_norm
from .pooling import adaptive_avg_pool2d
from .resize import resize_bicubic, resize_bilinear, resize_nearest
from .connected_components import (connected_components,
                                   postprocess_mask_scores,
                                   remove_small_objects_device)
from .quant import dequant_matmul, quantize_int8
