"""Fused normalization kernels.

Replaces the reference's flash-attn fused DropoutAddRMSNorm CUDA kernels
(/root/reference/VideoGLaMM/model/videogpt_plus/model/internvideo/internvideo2.py:24-32)
with a Pallas TPU kernel (on TPU) or plain jnp (CPU; XLA fuses these anyway).
Statistics are always computed in float32 regardless of input dtype.
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


def _rms_kernel(x_ref, w_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    o_ref[:] = (x * jax.lax.rsqrt(var + eps)
                * w_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows"))
def _rms_norm_pallas(x, weight, eps: float, block_rows: int = 256):
    orig_shape = x.shape
    d = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    block_rows = min(block_rows, rows)
    pad = (-rows) % block_rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    n_blocks = x2.shape[0] // block_rows
    out = pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
    )(x2, weight)
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)


def rms_norm(x, weight, eps: float = 1e-6):
    """RMSNorm over the last dim. x: [..., d], weight: [d]."""
    if jax.default_backend() == "tpu" and x.shape[-1] % 128 == 0:
        return _rms_norm_pallas(x, weight, float(eps))
    return _rms_norm_ref(x, weight, eps)


def layer_norm(x, weight, bias=None, eps: float = 1e-5):
    """LayerNorm over the last dim (XLA fuses this well on its own)."""
    return _layer_norm_ref(x, weight, bias, eps)
