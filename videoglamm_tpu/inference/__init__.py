from .generate import GenerateResult, generate_with_prefix
from .pipeline import GroundedInference, InferenceResult
