from .attention import dot_product_attention, flash_attention
from .norms import layer_norm, rms_norm
from .pooling import adaptive_avg_pool2d
from .resize import resize_bicubic, resize_bilinear, resize_nearest
