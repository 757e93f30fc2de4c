from .import_torch import (import_clip_vision, import_internvideo2,
                           import_phi3, t2j)
