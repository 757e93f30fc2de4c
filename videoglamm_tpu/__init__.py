"""videoglamm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for pixel-level
visual grounding in videos, providing the full capabilities of VideoGLaMM
(mbzuai-oryx/VideoGLaMM, CVPR 2025) re-designed TPU-first.

Subpackages
-----------
- ``ops``       : Pallas kernels + TPU-friendly numeric primitives (flash attention,
                  fused norms, torch-exact pooling/resize, connected components).
- ``models``    : pure-functional flax model components — CLIP ViT, InternVideo2,
                  Phi-3 LLM with paged KV cache, SAM-2 pixel decoder, projectors,
                  and the VideoGLaMM composite.
- ``parallel``  : device-mesh construction + GSPMD partitioning rules.
- ``data``      : conversation templating, tokenization, preprocessing, datasets.
- ``training``  : losses, LoRA, sharded train step, checkpointing.
- ``inference`` : KV-cache generation + end-to-end grounded inference pipelines.
- ``evals``     : GCG / DAVIS J&F / grounding metrics.
"""

__version__ = "0.1.0"
