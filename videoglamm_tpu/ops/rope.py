"""Rotary position embeddings.

Used by the LLM (Phi-3/Llama half-rotation RoPE) and by SAM-2 memory
attention (2-D axial RoPE, reference model/segment_anything_2/sam2/modeling/
position_encoding.py + sam/transformer.py:327 area).
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def rope_frequencies(head_dim: int, theta: float = 10000.0) -> np.ndarray:
    return 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))


def rope_cos_sin(positions, head_dim: int, theta: float = 10000.0):
    """cos/sin tables for half-rotation RoPE. positions: [...] int ->
    cos,sin: [..., head_dim] (frequencies tiled twice, HF layout)."""
    inv = jnp.asarray(rope_frequencies(head_dim, theta), jnp.float32)
    ang = positions.astype(jnp.float32)[..., None] * inv  # [..., hd/2]
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang), jnp.sin(ang)


def rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope(x, cos, sin):
    """x: [B, H, S, D]; cos/sin: [S, D] or [B, S, D] broadcastable.

    Computed in x's dtype (HF casts the f32 cos/sin tables to the query
    dtype before the multiply — modeling_phi3 apply_rotary_pos_emb); an
    f32 upcast here materialized three [B, H, S, D] f32 relayouts per layer
    at prefill scale (~1.5 ms/layer on v5e)."""
    if cos.ndim == 2:
        cos = cos[None, None]
        sin = sin[None, None]
    elif cos.ndim == 3:
        cos = cos[:, None]
        sin = sin[:, None]
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    return x * cos + rotate_half(x) * sin


# ---------------------------------------------------------------------------
# 2-D axial RoPE (SAM-2 memory attention / RoPEAttention)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=16)
def _axial_cis_np(dim: int, end_x: int, end_y: int, theta: float):
    """Complex rotation table over a (end_x, end_y) grid; dim is per-head dim.
    Half the dim rotates with x-coordinate, half with y-coordinate."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[: dim // 4].astype(np.float64) / dim))
    t = np.arange(end_x * end_y, dtype=np.float64)
    t_x = t % end_x
    t_y = t // end_x
    fx = np.outer(t_x, freqs)
    fy = np.outer(t_y, freqs)
    cis_x = np.exp(1j * fx)  # [L, dim/4]
    cis_y = np.exp(1j * fy)
    cis = np.concatenate([cis_x, cis_y], axis=-1)  # [L, dim/2]
    return cis.astype(np.complex64)


def axial_rope_cos_sin(dim: int, end_x: int, end_y: int, theta: float = 10000.0):
    cis = _axial_cis_np(dim, end_x, end_y, theta)
    return jnp.asarray(cis.real), jnp.asarray(cis.imag)  # [L, dim/2] each


def apply_axial_rope(x, cos, sin, repeat_to_len: int | None = None):
    """Apply interleaved complex rotation. x: [B, H, S, D] with D even;
    pairs (x[2i], x[2i+1]) rotate by table row i%L when repeat_to_len covers
    longer sequences (rope_k_repeat in the reference)."""
    B, H, S, D = x.shape
    L = cos.shape[0]
    if S != L:
        reps = -(-S // L)
        cos = jnp.tile(cos, (reps, 1))[:S]
        sin = jnp.tile(sin, (reps, 1))[:S]
    xf = x.astype(jnp.float32).reshape(B, H, S, D // 2, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    c = cos[None, None]
    s = sin[None, None]
    yr = xr * c - xi * s
    yi = xr * s + xi * c
    y = jnp.stack([yr, yi], axis=-1).reshape(B, H, S, D)
    return y.astype(x.dtype)
