"""Fused normalization kernels.

Replaces the reference's flash-attn fused DropoutAddRMSNorm CUDA kernels
(/root/reference/VideoGLaMM/model/videogpt_plus/model/internvideo/internvideo2.py:24-32)
with Pallas TPU kernels (plain jnp on CPU; XLA fuses those fine there).
Statistics are always computed in float32 regardless of input dtype.

Both norms carry a custom_vjp whose backward recomputes through the jnp
reference implementation — the kernels are forward-only, but training paths
(LoRA'd LLM RMSNorms, trainable mask-decoder LayerNorms) still differentiate
on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rms_norm_ref(x, weight, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def _layer_norm_ref(x, weight, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _rms_kernel(x_ref, w_ref, o_ref, *, eps, d):
    x = x_ref[:].astype(jnp.float32)
    if x.shape[-1] != d:   # lane padding: zeros don't perturb the sums
        mask = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) < d
        x = jnp.where(mask, x, 0.0)
    var = jnp.sum(x * x, axis=-1, keepdims=True) / d
    o_ref[:] = (x * jax.lax.rsqrt(var + eps)
                * w_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _rows_blocks(x, block_rows):
    orig_shape = x.shape
    d = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    block_rows = min(block_rows, _round_up(rows, 8))
    pad = (-rows) % block_rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    return x2, rows, d, block_rows


@functools.partial(jax.jit, static_argnames=("eps", "block_rows"))
def _rms_norm_pallas(x, weight, eps: float, block_rows: int = 256):
    x2, rows, d, block_rows = _rows_blocks(x, block_rows)
    dp = _round_up(d, 128)
    if dp != d:
        x2 = jnp.pad(x2, ((0, 0), (0, dp - d)))
        weight = jnp.pad(weight, (0, dp - d))
    out = pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps, d=d),
        grid=(x2.shape[0] // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, dp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
    )(x2, weight)
    return out[:rows, :d].reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rms_norm_tpu(x, weight, eps):
    return _rms_norm_pallas(x, weight, eps)


def _rms_fwd(x, weight, eps):
    return _rms_norm_pallas(x, weight, eps), (x, weight)


def _rms_bwd(eps, res, g):
    x, weight = res
    _, vjp = jax.vjp(lambda x, w: _rms_norm_ref(x, w, eps), x, weight)
    return vjp(g)


_rms_norm_tpu.defvjp(_rms_fwd, _rms_bwd)


def rms_norm(x, weight, eps: float = 1e-6):
    """RMSNorm over the last dim. x: [..., d], weight: [d]."""
    if jax.default_backend() == "tpu" and x.size >= (1 << 16):
        return _rms_norm_tpu(x, weight, float(eps))
    return _rms_norm_ref(x, weight, eps)


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps, d, has_bias):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.sum(x, axis=-1, keepdims=True) / d
    xc = x - mean
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) / d
    y = xc * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)
    if has_bias:
        y = y + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows"))
def _layer_norm_pallas(x, weight, bias, eps: float, block_rows: int = 256):
    # keep the caller's 3D layout: flattening [B, R, d] with a non-sublane-
    # aligned R (CLIP's 577) into [B*R, d] forces a physical relayout copy
    # that costs more than the norm itself. Grid = (B, ceil(R/block)); edge
    # blocks are implicitly padded by Pallas and the stats are row-local,
    # so padded rows never pollute valid ones.
    d = x.shape[-1]
    x3 = x.reshape(-1, x.shape[-2] if x.ndim >= 2 else 1, d) \
        if x.ndim != 3 else x
    B, R, _ = x3.shape
    block_rows = min(block_rows, _round_up(R, 8))
    nb = -(-R // block_rows)
    has_bias = bias is not None
    args = (x3, weight) + ((bias,) if has_bias else (weight,))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps, d=d, has_bias=has_bias),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, block_rows, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda b, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x.dtype),
    )(*args)
    return out.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_tpu(x, weight, bias, eps):
    return _layer_norm_pallas(x, weight, bias, eps)


def _ln_fwd(x, weight, bias, eps):
    return _layer_norm_pallas(x, weight, bias, eps), (x, weight, bias)


def _ln_bwd(eps, res, g):
    x, weight, bias = res
    _, vjp = jax.vjp(lambda x, w, b: _layer_norm_ref(x, w, b, eps),
                     x, weight, bias)
    return vjp(g)


_layer_norm_tpu.defvjp(_ln_fwd, _ln_bwd)


def layer_norm(x, weight, bias=None, eps: float = 1e-5):
    """LayerNorm over the last dim.

    Lane-aligned widths (d % 128 == 0) big enough to amortize a kernel
    launch take a fused single-pass Pallas kernel: XLA lowers the f32-stats
    two-pass norm to a ~90 GB/s kLoop fusion (0.44 ms per [16,577,1024]
    call in CLIP — 21 ms of the 49 ms tower). Narrow unaligned widths
    (Hiera's 144/288/576 spatial LNs) stay on XLA, where the norm fuses
    into neighboring elementwise ops and the Pallas pad would dominate
    (SAM encode measured 244 -> 265 ms / 8 frames on an earlier
    all-Pallas attempt)."""
    d = x.shape[-1]
    if (jax.default_backend() == "tpu" and d % 128 == 0
            and x.size >= (1 << 16)):
        return _layer_norm_tpu(x, weight, bias, float(eps))
    return _layer_norm_ref(x, weight, bias, eps)
