from .sam2_base import SAM2Base
from .image_predictor import SAM2ImagePredictor
from .interactive import SAM2InteractivePredictor
from .amg import SAM2AutomaticMaskGenerator
from .video_predictor import track_video

__all__ = ["SAM2Base", "SAM2ImagePredictor", "SAM2InteractivePredictor",
           "SAM2AutomaticMaskGenerator", "track_video"]
