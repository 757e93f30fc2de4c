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


def layer_norm(x, weight, bias=None, eps: float = 1e-5):
    """LayerNorm over the last dim. Stays on XLA everywhere: a fused Pallas
    kernel was tried and measured SLOWER in-model (it breaks XLA's fusion
    of the norm into neighboring elementwise ops, adding materialization
    boundaries — SAM encode regressed 244 -> 265 ms / 8 frames)."""
    return _layer_norm_ref(x, weight, bias, eps)
