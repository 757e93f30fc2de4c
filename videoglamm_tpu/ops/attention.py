"""Attention ops.

One attention entrypoint for every stack in the framework (LLM, CLIP,
InternVideo2, Hiera, SAM decoder, memory attention) — replacing the
reference's three attention paths (external flash_attn CUDA package for
InternVideo2, a vestigial Triton kernel, and eager torch SDPA; see
/root/reference/VideoGLaMM/model/videogpt_plus/model/internvideo/flash_attention_class.py:13-75
and model/llava/model/language_model/mpt/flash_attn_triton.py).

- `flash_attention`: Pallas TPU kernel, blockwise online-softmax, O(S) memory,
  supports causal masking and right-padded KV lengths. Used on TPU.
- `dot_product_attention`: dispatcher with an XLA fallback (used on CPU/tests
  and as the differentiation path — backward recomputes through the XLA
  implementation under `jax.custom_vjp`).

Shapes follow [B, H, S, D] (batch, heads, sequence, head_dim).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# XLA reference implementation (CPU path + VJP backward)
# ---------------------------------------------------------------------------
def _attention_xla(q, k, v, *, causal: bool, sm_scale: float,
                   kv_lens: Optional[jax.Array], bias: Optional[jax.Array],
                   kv_mask: Optional[jax.Array] = None,
                   q_start: Optional[jax.Array] = None):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    # keep operands in their storage dtype with f32 accumulation: an
    # explicit astype(f32) materializes an upcast copy of the whole KV
    # cache every decode step (~2.8 GB/step at flagship scale)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * sm_scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        # q_start gives the absolute KV position of query 0 (prefill over a
        # right-padded batch => 0; single-token decode => kv_len-1). Without
        # it, queries are assumed to be the LAST Sq valid tokens.
        if q_start is not None:
            offs = q_start
        elif kv_lens is not None:
            offs = kv_lens - Sq
        else:
            offs = jnp.full((B,), Sk - Sq, jnp.int32)
        qi = jnp.arange(Sq)[None, :, None] + offs[:, None, None]  # [B,Sq,1]
        ki = jnp.arange(Sk)[None, None, :]
        logits = jnp.where((qi >= ki)[:, None], logits, NEG_INF)
    if kv_lens is not None:
        valid = jnp.arange(Sk)[None, :] < kv_lens[:, None]  # [B, Sk]
        logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------
def _flash_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                  *, causal: bool, sm_scale: float, block_q: int, block_k: int,
                  sq: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    i = pl.program_id(1)
    kv_len = kvlen_ref[pl.program_id(0), 0]
    q_offset = kvlen_ref[pl.program_id(0), 1]

    q_start = i * block_q
    k_start = j * block_k

    # Skip blocks that are fully masked out.
    causal_live = True if not causal else (
        q_start + q_offset + block_q - 1 >= k_start)
    len_live = k_start < kv_len

    @pl.when(jnp.logical_and(causal_live, len_live))
    def _compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale

        col = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = col < kv_len
        if causal:
            row = q_start + q_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(mask, row >= col)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_ref[:, 0:1] + jnp.sum(p, axis=1, keepdims=True)

        v = v_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_ref[:, 0:1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale", "block_q", "block_k"))
def _flash_fwd(q, k, v, kv_lens, q_start, *, causal, sm_scale, block_q=512,
               block_k=512):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    block_q = min(block_q, _round_up(Sq, 128))
    block_k = min(block_k, _round_up(Sk, 128))
    Dp = _round_up(D, 128)
    Sqp = _round_up(Sq, block_q)
    Skp = _round_up(Sk, block_k)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Sqp - Sq), (0, Dp - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Skp - Sk), (0, Dp - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Skp - Sk), (0, Dp - D)))
    qp = qp.reshape(B * H, Sqp, Dp)
    kp = kp.reshape(B * H, Skp, Dp)
    vp = vp.reshape(B * H, Skp, Dp)

    # per-(b, h) program scalars: [kv_len, q_offset]
    scalars = jnp.stack([
        jnp.repeat(kv_lens.astype(jnp.int32), H),
        jnp.repeat(q_start.astype(jnp.int32), H),
    ], axis=1)

    grid = (B * H, Sqp // block_q, Skp // block_k)
    kernel = functools.partial(
        _flash_kernel, causal=causal, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, sq=Sq)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, Dp), lambda b, i, j, kvl: (b, i, 0)),
                pl.BlockSpec((1, block_k, Dp), lambda b, i, j, kvl: (b, j, 0)),
                pl.BlockSpec((1, block_k, Dp), lambda b, i, j, kvl: (b, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, Dp), lambda b, i, j, kvl: (b, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, Dp), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Sqp, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(scalars, qp, kp, vp)

    return out.reshape(B, H, Sqp, Dp)[:, :, :Sq, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention_custom(q, k, v, kv_lens, q_start, causal, sm_scale):
    return _flash_fwd(q, k, v, kv_lens, q_start, causal=causal,
                      sm_scale=sm_scale)


def _flash_attention_fwd_rule(q, k, v, kv_lens, q_start, causal, sm_scale):
    out = _flash_fwd(q, k, v, kv_lens, q_start, causal=causal,
                     sm_scale=sm_scale)
    return out, (q, k, v, kv_lens, q_start)


def _flash_attention_bwd_rule(causal, sm_scale, res, g):
    import numpy as np
    q, k, v, kv_lens, q_start = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _attention_xla(q_, k_, v_, causal=causal,
                                          sm_scale=sm_scale, kv_lens=kv_lens,
                                          bias=None, q_start=q_start), q, k, v)
    dq, dk, dv = vjp(g)
    dlens = np.zeros(kv_lens.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dlens, dlens.copy()


_flash_attention_custom.defvjp(_flash_attention_fwd_rule, _flash_attention_bwd_rule)


def flash_attention(q, k, v, *, causal: bool = False,
                    kv_lens: Optional[jax.Array] = None,
                    q_start: Optional[jax.Array] = None,
                    sm_scale: Optional[float] = None):
    """Pallas flash attention. q/k/v: [B, H, S, D]. q_start: [B] absolute KV
    position of query 0 (defaults to kv_lens - Sq: decode convention)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if kv_lens is None:
        kv_lens = jnp.full((q.shape[0],), k.shape[2], jnp.int32)
    if q_start is None:
        q_start = kv_lens - q.shape[2]
    return _flash_attention_custom(q, k, v, kv_lens, q_start, causal,
                                   float(sm_scale))


# ---------------------------------------------------------------------------
# Dispatcher
# ---------------------------------------------------------------------------
def dot_product_attention(q, k, v, *, causal: bool = False,
                          kv_lens: Optional[jax.Array] = None,
                          kv_mask: Optional[jax.Array] = None,
                          bias: Optional[jax.Array] = None,
                          q_start: Optional[jax.Array] = None,
                          sm_scale: Optional[float] = None,
                          force_xla: bool = False):
    """Attention entrypoint used by all model stacks.

    Uses the Pallas flash kernel on TPU for long sequences; falls back to the
    XLA implementation on CPU, for biased/per-token-masked attention (small
    decoders + memory attention), and for short sequences where a fused XLA
    softmax wins. kv_mask: [B, Sk] bool — True = attendable.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    on_tpu = jax.default_backend() == "tpu"
    # the Pallas kernel wins on long sequences; for short/windowed attention
    # (Hiera windows, SAM decoder) the fused XLA softmax is faster — kernel
    # dispatch + Dp/block padding dominate below ~1k tokens
    long_enough = q.shape[2] >= 1024 and k.shape[2] >= 1024
    if (force_xla or bias is not None or kv_mask is not None or not on_tpu
            or not long_enough):
        return _attention_xla(q, k, v, causal=causal, sm_scale=sm_scale,
                              kv_lens=kv_lens, bias=bias, kv_mask=kv_mask,
                              q_start=q_start)
    return flash_attention(q, k, v, causal=causal, kv_lens=kv_lens,
                           q_start=q_start, sm_scale=sm_scale)
