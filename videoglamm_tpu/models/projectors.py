"""V->L and L->V adapters.

- `VisionProjector`: mm_projector (1408->hidden) / image_mm_projector
  (1024->hidden); types linear | mlp2x_gelu | identity (reference:
  model/videogpt_plus/model/multimodal_projector/builder.py:5-55).
- `TextHiddenFCs`: [SEG] hidden-state -> SAM prompt space, Linear+ReLU+Linear
  (reference: model/VideoGLaMM.py:133-145; dropout(0.0) omitted).
- `build_visual_prefix`: chunked-video + context-image feature pooling and
  merge, producing the fixed [context(T*144) ; video(T*64)] token layout
  (reference: arch.py:164-191 `project`, apply_adaptive_avg_pooling).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pooling import adaptive_pool_tokens
from .common import Dense


class VisionProjector(nn.Module):
    projector_type: str
    output_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.projector_type == "identity":
            return x
        if self.projector_type == "linear":
            return Dense(self.output_dim, dtype=self.dtype, name="fc0")(x)
        if self.projector_type == "mlp2x_gelu":
            h = Dense(self.output_dim, dtype=self.dtype, name="fc0")(x)
            h = nn.gelu(h, approximate=False)
            return Dense(self.output_dim, dtype=self.dtype, name="fc1")(h)
        raise ValueError(f"unknown projector {self.projector_type}")


class TextHiddenFCs(nn.Module):
    """Projects [SEG]-token LLM hidden states into the pixel-decoder prompt
    space (out_dim=256)."""
    out_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = Dense(d, dtype=self.dtype, name="fc0")(x)
        h = jax.nn.relu(h)
        return Dense(self.out_dim, dtype=self.dtype, name="fc1")(h)


def build_visual_prefix(video_tokens, context_tokens, *, chunk_size: int,
                        video_pool, context_pool):
    """Produce the LLM visual prefix.

    Args:
      video_tokens:   [B, T, L_v, H] projected InternVideo2 patch tokens
                      (per frame; already through mm_projector).
      context_tokens: [B, T, L_c, H] projected CLIP patch tokens
                      (already through image_mm_projector).
    Returns:
      [B, T*pc + T*pv, H] with context tokens first (reference arch.py:182-191).
    """
    B, T, Lv, H = video_tokens.shape
    pooled_video = adaptive_pool_tokens(
        video_tokens.reshape(B * T, Lv, H), video_pool)
    pooled_video = pooled_video.reshape(B, T * video_pool[0] * video_pool[1], H)

    Lc = context_tokens.shape[2]
    pooled_ctx = adaptive_pool_tokens(
        context_tokens.reshape(B * T, Lc, H), context_pool)
    pooled_ctx = pooled_ctx.reshape(
        B, T * context_pool[0] * context_pool[1], H)

    return jnp.concatenate([pooled_ctx, pooled_video], axis=1)
