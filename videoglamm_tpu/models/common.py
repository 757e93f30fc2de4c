"""Shared flax building blocks used across towers / decoders."""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import dot_product_attention, layer_norm, rms_norm


class LayerNorm(nn.Module):
    """LayerNorm with f32 statistics (torch-parity semantics)."""
    eps: float = 1e-5
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        w = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (d,), jnp.float32) \
            if self.use_bias else None
        return layer_norm(x, w, b, eps=self.eps)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def weight(self, d):
        """Raw scale param — lets fused decode kernels consume the norm
        weight directly (scripts/decode_mlp_experiment.py) without changing the tree."""
        return self.param("scale", nn.initializers.ones, (d,), jnp.float32)

    def __call__(self, x):
        return rms_norm(x, self.weight(x.shape[-1]), eps=self.eps)


class QDense(nn.Module):
    """Weight-only int8 linear: params {kernel: int8 [in, out],
    scale: f32 [out]} consumed by the fused dequant matmul (ops/quant.py).
    Bias-free (the quantized paths are the LLM's bias-free projections)."""
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def weights(self, in_features):
        """Raw (kernel int8, scale f32) params — consumed directly by the
        fused decode kernels (scripts/decode_mlp_experiment.py); same tree as __call__."""
        k = self.param("kernel", nn.initializers.zeros,
                       (in_features, self.features), jnp.int8)
        s = self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32)
        return k, s

    def __call__(self, x):
        from ..ops.quant import dequant_matmul
        k, s = self.weights(x.shape[-1])
        return dequant_matmul(x.astype(self.dtype), k, s)


class QDense4(nn.Module):
    """Weight-only int4 linear: params {kernel: packed int8 [in//2, out],
    scale: f32 [in//group, out]} consumed by the Pallas unpack-fused matvec
    (ops/quant.py dequant4_matmul). Experimental serving mode — gate on the
    int4 parity test before enabling for real deployments."""
    features: int
    dtype: jnp.dtype = jnp.bfloat16
    group: int = 128

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import dequant4_matmul
        K = x.shape[-1]
        g = min(self.group, K)          # tiny configs: one group
        k = self.param("kernel", nn.initializers.zeros,
                       (K // 2, self.features), jnp.int8)
        s = self.param("scale", nn.initializers.ones,
                       (K // g, self.features), jnp.float32)
        return dequant4_matmul(x.astype(self.dtype), k, s, group=g)


class HeadPaddedQKV(nn.Module):
    """Fused qkv projection emitting heads PRE-PADDED to 128 lanes: the
    zero pad happens in the WEIGHTS ([in, 3*dim] -> [in, 3*H*128] scatter),
    so the matmul itself writes the kernel-aligned layout and no activation
    relayout ever materializes (the per-head 72 -> 128 activation pad was
    what sank the round-2 super-window fold). Param tree matches Dense
    ({kernel [in, 3*dim], bias [3*dim]}) for checkpoint compatibility."""
    dim: int
    num_heads: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hd = self.dim // self.num_heads
        H3 = 3 * self.num_heads
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], 3 * self.dim), jnp.float32)
        kp = jnp.pad(k.reshape(x.shape[-1], H3, hd),
                     ((0, 0), (0, 0), (0, 128 - hd)))
        y = jnp.einsum("...i,io->...o", x,
                       kp.reshape(x.shape[-1], H3 * 128).astype(self.dtype),
                       preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (3 * self.dim,),
                           jnp.float32)
            bp = jnp.pad(b.reshape(H3, hd), ((0, 0), (0, 128 - hd)))
            y = y + bp.reshape(H3 * 128).astype(jnp.float32)
        return y.astype(self.dtype)


class PadConsumingProj(nn.Module):
    """Output projection consuming head-padded activations ([.., H*128]):
    the weight rows at pad lanes are zero, so the padded layout feeds the
    matmul directly. Param tree matches Dense ({kernel [H*hd, out]})."""
    dim_in: int
    num_heads: int
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hd = self.dim_in // self.num_heads
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.dim_in, self.features), jnp.float32)
        kp = jnp.pad(k.reshape(self.num_heads, hd, self.features),
                     ((0, 0), (0, 128 - hd), (0, 0)))
        y = jnp.einsum("...i,io->...o", x,
                       kp.reshape(self.num_heads * 128,
                                  self.features).astype(self.dtype),
                       preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(jnp.float32)
        return y.astype(self.dtype)


def Dense(features, use_bias=True, dtype=jnp.bfloat16, name=None,
          kernel_init=nn.initializers.lecun_normal()):
    """nn.Dense factory with f32 params + configurable compute dtype.

    A factory (not a wrapper module) keeps param paths flat
    (`<name>/kernel`), which the torch-checkpoint importers rely on."""
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, kernel_init=kernel_init,
                    name=name)


class MultiHeadAttention(nn.Module):
    """Standard MHA over [B, S, D] built on the framework attention op
    (Pallas flash on TPU)."""
    num_heads: int
    head_dim: Optional[int] = None
    qkv_bias: bool = True
    out_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context=None, *, causal: bool = False,
                 kv_lens=None, bias=None):
        context = x if context is None else context
        d = x.shape[-1]
        hd = self.head_dim or d // self.num_heads
        inner = self.num_heads * hd

        q = Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                  name="q_proj")(x)
        k = Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                  name="k_proj")(context)
        v = Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                  name="v_proj")(context)

        B, S = x.shape[0], x.shape[1]
        if (context is x and not causal and kv_lens is None
                and bias is None):
            # plain self-attention: BSHD kernel path, no head transposes
            from ..ops.attention import attention_bshd
            o = attention_bshd(q.reshape(B, S, self.num_heads, hd),
                               k.reshape(B, S, self.num_heads, hd),
                               v.reshape(B, S, self.num_heads, hd))
            o = o.reshape(B, S, inner)
        else:
            def split(t, s):
                return t.reshape(t.shape[0], s, self.num_heads,
                                 hd).transpose(0, 2, 1, 3)

            o = dot_product_attention(split(q, S),
                                      split(k, context.shape[1]),
                                      split(v, context.shape[1]),
                                      causal=causal, kv_lens=kv_lens,
                                      bias=bias)
            o = o.transpose(0, 2, 1, 3).reshape(B, S, inner)
        return Dense(d, use_bias=self.out_bias, dtype=self.dtype,
                     name="out_proj")(o)


def gelu_exact(x):
    """torch nn.GELU default (erf form) when computing in f32 — golden
    parity vs the reference torch modules.

    In sub-f32 storage dtypes the tanh approximation is used instead: its
    deviation from erf is <= 5e-4 absolute (20x below the bf16 rounding
    quantum at the worst point, x~2.6), while the erf lowering costs ~0.09
    ms of VPU time per 9.4M elements on v5e — ~5 ms/frame summed over
    Hiera-L's MLPs."""
    if x.dtype in (jnp.float32, jnp.float64):
        return nn.gelu(x, approximate=False)
    return nn.gelu(x, approximate=True)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: Optional[int] = None
    activation: Callable = gelu_exact
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        h = Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        h = self.activation(h)
        return Dense(out_dim, dtype=self.dtype, name="fc2")(h)


class MLPBlock(nn.Module):
    """N-layer MLP with ReLU between layers (SAM-style heads)."""
    hidden_dim: int
    out_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            dim = self.out_dim if last else self.hidden_dim
            x = Dense(dim, dtype=self.dtype, name=f"layers_{i}")(x)
            if not last:
                x = jax.nn.relu(x)
        if self.sigmoid_output:
            x = jax.nn.sigmoid(x)
        return x


def patchify_conv(x, kernel, bias, patch: int):
    """Non-overlapping patch embedding as a reshaped matmul (MXU-friendly;
    avoids conv for stride==kernel). x: [B, H, W, C], kernel: [p, p, C, D]."""
    B, H, W, C = x.shape
    p = patch
    D = kernel.shape[-1]
    x = x.reshape(B, H // p, p, W // p, p, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, (H // p) * (W // p), p * p * C)
    w = kernel.reshape(p * p * C, D)
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    y = y.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y  # [B, L, D]
