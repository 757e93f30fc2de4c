"""Static-shape KV cache shared by the Phi-3 and Llama decoders.

Layout: [L, B, Hkv, max_len, hd], attention-ready (no transpose between the
cache and the attention op — a whole-cache transpose per layer per decode
step costs ~1.4 GB/step of HBM traffic at flagship scale). The stacked
leading L axis rides the layer-scan carry so per-layer updates stay tiny
in-place dynamic slices.

Optional int8 quantization (`quant_kv=True`): K/V are stored as per-token,
per-head symmetric int8 with f32 scales ([L, B, Hkv, max_len]) in a
TOKEN-MAJOR flat layout ([L, B, max_len, Hkv*hd]) — one contiguous row per
token, sized for the Pallas decode kernel's whole-row DMA blocks
(ops/attention.py:decode_attention_quant). Decode is
HBM-bound — at flagship scale the bf16 cache streams ~1.3 GB per generated
token next to 3.7 GB of int8 weights; int8 KV halves that stream and halves
cache residency (batch-4 serving OOMed 16 GB HBM on 4x1.4 GB bf16 caches).
Dequantization is expressed inline (convert * scale) so XLA fuses it into
the attention dot's operand load — the cache streams from HBM as int8, the
same fusion the int8 weight path relies on (ops/quant.py:dequant_matmul).

The reference has no KV cache at all (decode recomputes the full prefix,
/root/reference/VideoGLaMM/model/VideoGLaMM.py:789-806); quantized serving
caches are a TPU-native addition, gated by the same parity methodology as
int8 weights (tests/test_int8_parity.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_cache(num_layers: int, batch: int, num_kv_heads: int, max_len: int,
               head_dim: int, dtype=jnp.bfloat16, quant_kv: bool = False):
    shape = (num_layers, batch, num_kv_heads, max_len, head_dim)
    if not quant_kv:
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    # int8 K/V are TOKEN-MAJOR flat ([L, B, C, Hkv*hd]): the Pallas decode
    # kernel (ops/attention.py:decode_attention_quant) streams whole-token
    # rows as one contiguous DMA block per grid step — a head-major layout
    # forces a (B, Hkv, nk) grid of tiny programs whose per-step fixed cost
    # dominates (measured 11.18 vs 8.29 ms/token at flagship scale).
    # Decode writes also become a single contiguous row per token.
    flat = (num_layers, batch, max_len, num_kv_heads * head_dim)
    sshape = shape[:-1]
    return {
        "k": jnp.zeros(flat, jnp.int8),
        "v": jnp.zeros(flat, jnp.int8),
        "k_scale": jnp.zeros(sshape, jnp.float32),
        "v_scale": jnp.zeros(sshape, jnp.float32),
    }


def _quantize(x):
    """[B, H, S, hd] -> (int8 same shape, f32 [B, H, S]) per-token/head."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def write(cache, layer_idx, kn, vn, starts):
    """Write this block's K/V into the stacked cache at each row's start
    position. kn/vn: [B, Hkv, S, hd]; starts: [B]. Writes are per-row
    in-place dynamic slices, statically unrolled over the small batch — a
    vmapped update materialized the whole layer slab per step (batch-2
    serving measured 11.75 vs 13.58 f/s/chip)."""
    B, Hkv, S, hd = kn.shape
    if "k_scale" in cache:
        kq, ks = _quantize(kn)
        vq, vs = _quantize(vn)
        # token-major flat rows for the int8 cache ([B, S, Hkv*hd]); at
        # decode (S == 1) the transpose is free and the write is one
        # contiguous row per batch element
        kq = kq.transpose(0, 2, 1, 3).reshape(B, S, Hkv * hd)
        vq = vq.transpose(0, 2, 1, 3).reshape(B, S, Hkv * hd)
        writes = (("k", kq, "tok"), ("v", vq, "tok"),
                  ("k_scale", ks, "sc"), ("v_scale", vs, "sc"))
    else:
        writes = (("k", kn.astype(cache["k"].dtype), "head"),
                  ("v", vn.astype(cache["v"].dtype), "head"))

    cache = dict(cache)
    for name, val, kind in writes:
        buf = cache[name]
        for b in range(B):
            idx = {"head": (layer_idx, b, 0, starts[b], 0),
                   "tok": (layer_idx, b, starts[b], 0),
                   "sc": (layer_idx, b, 0, starts[b])}[kind]
            buf = jax.lax.dynamic_update_slice(buf, val[None, b:b + 1], idx)
        cache[name] = buf
    return cache


def update_and_fetch(cache, layer_idx, kn, vn, starts, compute_dtype):
    """Write this block's K/V into the stacked cache and return the updated
    cache plus this layer's attention-ready K/V slabs.

    kn/vn: [B, Hkv, S, hd] (post-RoPE K, head-transposed V); starts: [B]
    per-row write offsets (positions are contiguous per row).

    Returns (cache, k_att, v_att, k_scale, v_scale). For a bf16 cache the
    scales are None and k_att/v_att are this layer's head-major slabs. For
    the int8 cache:
    - decode (S == 1): k_att/v_att are the FULL STACKED int8 buffers
      ([L, B, C, Hkv*hd]) and the stacked scales come back separately for
      the quant-aware attention path — a dequantized bf16 copy of the
      whole cache per step is exactly the HBM stream int8 KV exists to
      avoid, and `convert*scale` does NOT fuse into an XLA dot operand
      (measured 12.78 vs 13.62 f/s/chip); the scales instead fold into the
      logits (k, an output dim of QK^T) and into the probs (v, pre-
      contraction) in ops/attention.py, and the Pallas decode kernel
      selects the layer via scalar prefetch (caller passes layer_idx to
      dot_product_attention) so no 2x slab copy is ever materialized.
    - prefill (S > 1): one dequantized bf16 slab is materialized so the
      compute-bound prefill keeps its Pallas flash path (~27 MB/layer,
      negligible next to the prefill matmuls).
    """
    cache = write(cache, layer_idx, kn, vn, starts)
    B, Hkv, S, hd = kn.shape
    quant = "k_scale" in cache

    if quant and S == 1:
        # decode: hand back the FULL stacked int8 cache + scales untouched —
        # the Pallas decode kernel selects the layer inside its BlockSpec
        # index maps via scalar prefetch (ops/attention.py:
        # decode_attention_quant), so no XLA dynamic-slice ever materializes
        # a 2x copy of the layer slab just to feed the kernel (measured
        # ~31 us/layer/token of pure copy at flagship scale)
        return cache, cache["k"], cache["v"], cache["k_scale"], cache["v_scale"]

    k_att = jax.lax.dynamic_index_in_dim(cache["k"], layer_idx, 0,
                                         keepdims=False)
    v_att = jax.lax.dynamic_index_in_dim(cache["v"], layer_idx, 0,
                                         keepdims=False)
    if not quant:
        return cache, k_att, v_att, None, None

    ks_l = jax.lax.dynamic_index_in_dim(cache["k_scale"], layer_idx, 0,
                                        keepdims=False)
    vs_l = jax.lax.dynamic_index_in_dim(cache["v_scale"], layer_idx, 0,
                                        keepdims=False)
    # prefill: materialize one dequantized head-major bf16 slab so the
    # compute-bound prefill keeps its Pallas flash path
    C = k_att.shape[1]
    k_att = k_att.reshape(B, C, Hkv, hd).transpose(0, 2, 1, 3).astype(
        compute_dtype) * ks_l[..., None].astype(compute_dtype)
    v_att = v_att.reshape(B, C, Hkv, hd).transpose(0, 2, 1, 3).astype(
        compute_dtype) * vs_l[..., None].astype(compute_dtype)
    return cache, k_att, v_att, None, None
