"""Adaptive average pooling with exact torch bin-edge semantics.

The reference pools visual tokens with F.adaptive_avg_pool2d
(/root/reference/VideoGLaMM/model/videogpt_plus/model/arch.py:88-96):
256->64 video tokens (16x16 -> 8x8) and 576->144 context tokens
(24x24 -> 12x12). Torch's bins are [floor(i*H/out), ceil((i+1)*H/out));
we reproduce them exactly via a precomputed pooling matrix applied as a
matmul — MXU-friendly and bit-comparable for both divisible and
non-divisible sizes.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool2d(x, output_size):
    """x: [..., H, W, C] -> [..., oh, ow, C] (channels-last)."""
    oh, ow = output_size
    H, W = x.shape[-3], x.shape[-2]
    ph = jnp.asarray(_pool_matrix(H, oh), dtype=jnp.float32)
    pw = jnp.asarray(_pool_matrix(W, ow), dtype=jnp.float32)
    xf = x.astype(jnp.float32)
    y = jnp.einsum("oh,...hwc->...owc", ph, xf)
    y = jnp.einsum("pw,...owc->...opc", pw, y)
    return y.astype(x.dtype)


def adaptive_pool_tokens(tokens, output_size):
    """Pool a square token grid: [..., L, C] with L = g*g -> [..., oh*ow, C].

    Mirrors apply_adaptive_avg_pooling (reference arch.py:88-96)."""
    L, C = tokens.shape[-2], tokens.shape[-1]
    g = int(round(L ** 0.5))
    assert g * g == L, f"token count {L} is not a square"
    x = tokens.reshape(tokens.shape[:-2] + (g, g, C))
    y = adaptive_avg_pool2d(x, output_size)
    oh, ow = output_size
    return y.reshape(tokens.shape[:-2] + (oh * ow, C))
