"""Position encodings for the SAM-2 stack.

Behavioral contracts from the reference
(/root/reference/VideoGLaMM/model/segment_anything_2/sam2/modeling/
position_encoding.py): sine grid PE (normalized, temperature 1e4) for the FPN
levels and memory encoder; random-Fourier PE for the prompt encoder / SAM
dense PE. Both are precomputed host-side (numpy) for static grid sizes —
they are constants under jit.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _sine_pe_np(h: int, w: int, num_pos_feats: int, temperature: float = 10000.0,
                normalize: bool = True) -> np.ndarray:
    """[h, w, 2*num_half] sine PE; num_pos_feats is the FULL channel count."""
    half = num_pos_feats // 2
    y = np.arange(1, h + 1, dtype=np.float64)[:, None] * np.ones((1, w))
    x = np.arange(1, w + 1, dtype=np.float64)[None, :] * np.ones((h, 1))
    if normalize:
        eps = 1e-6
        scale = 2 * math.pi
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(half, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    # interleave sin/cos over pairs
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])],
                  axis=3).reshape(h, w, -1)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])],
                  axis=3).reshape(h, w, -1)
    return np.concatenate([py, px], axis=2).astype(np.float32)


def sine_pe(h: int, w: int, channels: int) -> jnp.ndarray:
    """[h, w, channels] PositionEmbeddingSine equivalent (channels-last)."""
    return jnp.asarray(_sine_pe_np(h, w, channels))


def random_pe_grid(gauss_matrix, h: int, w: int) -> jnp.ndarray:
    """[h, w, C] PositionEmbeddingRandom over a grid. gauss_matrix: [2, C/2]."""
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # [h,w,2]
    return random_pe_coords(gauss_matrix, grid)


def random_pe_coords(gauss_matrix, coords01) -> jnp.ndarray:
    """coords01: [..., 2] in [0,1] -> [..., C]."""
    c = 2.0 * coords01 - 1.0
    c = c @ gauss_matrix.astype(c.dtype)
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def sine_pe_1d(pos, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """get_1d_sine_pe equivalent: pos [...], -> [..., dim]."""
    half = dim // 2
    dim_t = temperature ** (jnp.arange(half, dtype=jnp.float32) / half)
    p = pos.astype(jnp.float32)[..., None] / dim_t
    return jnp.concatenate([jnp.sin(p), jnp.cos(p)], axis=-1)
