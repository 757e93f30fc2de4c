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
                   q_start: Optional[jax.Array] = None,
                   k_scale: Optional[jax.Array] = None,
                   v_scale: Optional[jax.Array] = None):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    # keep operands in their storage dtype with f32 accumulation: an
    # explicit astype(f32) materializes an upcast copy of the whole KV
    # cache every decode step (~2.8 GB/step at flagship scale).
    #
    # Quant-aware path (int8 KV cache, k_scale/v_scale [B, H, Sk]): k/v
    # arrive as INT8 and their per-token/head scales are folded where they
    # cost nothing — the K scale onto the logits (the KV position is an
    # OUTPUT dim of QK^T) and the V scale onto the probs (pre-contraction).
    # Dequantizing up front materializes a bf16 copy of the whole cache per
    # decode step, un-doing the int8 stream (12.78 vs 13.62 f/s measured).
    if k_scale is not None:
        k = k.astype(q.dtype)  # fused into the dot's operand load
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * sm_scale
    if k_scale is not None:
        logits = logits * k_scale[:, :, None, :].astype(jnp.float32)
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
    if v_scale is not None:
        probs = probs * v_scale[:, :, None, :].astype(jnp.float32)
        v = v.astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------
def _flash_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                  acc_ref, m_ref, l_ref,
                  *, causal: bool, sm_scale: float, block_q: int, block_k: int,
                  sq: int, need_lse: bool = True):
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
    live = jnp.logical_and(causal_live, len_live)
    # interior blocks need NO mask at all: every column is within kv_len and
    # (for causal) every row index >= every column index. The softmax tail
    # is VPU-bound at prefill scale (~255M exps/layer next to ~3.4 us of MXU
    # per block), so skipping the iota/compare/select mask chain on interior
    # blocks is a real win, not a cleanup.
    interior = k_start + block_k <= kv_len
    if causal:
        interior = jnp.logical_and(
            interior, q_start + q_offset >= k_start + block_k - 1)

    def _tile(masked: bool):
        # operands stay in their storage dtype: bf16 into the MXU with f32
        # accumulation is ~8x the f32-operand throughput (and matches the
        # XLA path's preferred_element_type semantics)
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale

        if masked:
            col = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
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

        v = v_ref[0]
        pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(jnp.logical_and(live, interior))
    def _compute_interior():
        _tile(False)

    @pl.when(jnp.logical_and(live, jnp.logical_not(interior)))
    def _compute_masked():
        _tile(True)

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_ref[:, 0:1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / safe_l).astype(o_ref.dtype)
        if need_lse:
            # logsumexp rows for the backward (lane-broadcast layout keeps
            # every read/write column-oriented — no 1D relayouts)
            lse = jnp.where(l == 0.0, NEG_INF,
                            m_ref[:, 0:1] + jnp.log(safe_l))
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pick_block(S: int, cap: int = 1152) -> int:
    """Block size for one flash grid axis: the largest block whose padded
    length stays within 10% of the best achievable. Bigger blocks win even
    when they waste FLOPs at the causal diagonal — a 3456-token causal
    layer sweeps 2.68 ms at 1152x1152 vs 3.75 at 512x512 (fewer online-
    softmax rescaling passes; the MXU sees longer runs)."""
    cands = (1152, 1024, 768, 512, 384, 256, 128)
    min_sp = min(_round_up(S, b) for b in cands if b <= cap)
    for b in cands:
        if b <= cap and _round_up(S, b) <= 1.1 * min_sp:
            return b
    return 128


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale", "block_q",
                                              "block_k", "need_lse"))
def _flash_fwd(q, k, v, kv_lens, q_start, *, causal, sm_scale, block_q=None,
               block_k=None, need_lse=True):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    block_q = _pick_block(Sq) if block_q is None else \
        min(block_q, _round_up(Sq, 128))
    block_k = _pick_block(Sk) if block_k is None else \
        min(block_k, _round_up(Sk, 128))
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
        block_q=block_q, block_k=block_k, sq=Sq, need_lse=need_lse)

    if need_lse:
        lse_spec = pl.BlockSpec((1, block_q, 128),
                                lambda b, i, j, kvl: (b, i, 0))
        lse_shape = jax.ShapeDtypeStruct((B * H, Sqp, 128), jnp.float32)
    else:
        # inference path: the lse rows are never read — route every grid
        # step's (unwritten) lse block to one tiny aliased buffer so the
        # pipeline stops streaming ~56 MB of f32 rows per layer to HBM
        lse_spec = pl.BlockSpec((1, block_q, 128),
                                lambda b, i, j, kvl: (0, 0, 0))
        lse_shape = jax.ShapeDtypeStruct((1, block_q, 128), jnp.float32)

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, Dp), lambda b, i, j, kvl: (b, i, 0)),
                pl.BlockSpec((1, block_k, Dp), lambda b, i, j, kvl: (b, j, 0)),
                pl.BlockSpec((1, block_k, Dp), lambda b, i, j, kvl: (b, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, Dp),
                             lambda b, i, j, kvl: (b, i, 0)),
                lse_spec,
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, Dp), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Sqp, Dp), q.dtype),
            lse_shape,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(scalars, qp, kp, vp)

    out = out.reshape(B, H, Sqp, Dp)[:, :, :Sq, :D]
    return out, (lse[:, :, :1] if need_lse else None)


# ---------------------------------------------------------------------------
# Pallas flash attention (backward)
# ---------------------------------------------------------------------------
def _bwd_common(q, k, do, v, lse, delta, k_start, q_global, kv_len, causal,
                sm_scale, block_q, block_k):
    """Shared tile math: returns (p, ds) f32 for one (q-block, k-block)
    pair. Operands stay in storage dtype (bf16 MXU, f32 accumulation).
    q_global: absolute row index of the block's first query."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    col = k_start + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    mask = col < kv_len
    if causal:
        row = q_global + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        mask = jnp.logical_and(mask, row >= col)
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)            # [bq, bk]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * sm_scale
    return p, ds


def _flash_bwd_dq_kernel(kvlen_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, acc_ref,
                         *, causal: bool, sm_scale: float, block_q: int,
                         block_k: int):
    i, j = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kv_len = kvlen_ref[pl.program_id(0), 0]
    q_offset = kvlen_ref[pl.program_id(0), 1]
    q_start, k_start = i * block_q, j * block_k
    causal_live = True if not causal else (
        q_start + q_offset + block_q - 1 >= k_start)

    @pl.when(jnp.logical_and(causal_live, k_start < kv_len))
    def _compute():
        k = k_ref[0]
        _, ds = _bwd_common(
            q_ref[0], k, do_ref[0], v_ref[0],
            lse_ref[0][:, 0:1], delta_ref[0][:, 0:1],
            k_start, q_start + q_offset, kv_len, causal, sm_scale,
            block_q, block_k)
        acc_ref[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(kvlen_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                          *, causal: bool, sm_scale: float, block_q: int,
                          block_k: int):
    j, i = pl.program_id(1), pl.program_id(2)   # note: k blocks outer
    nq = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    kv_len = kvlen_ref[pl.program_id(0), 0]
    q_offset = kvlen_ref[pl.program_id(0), 1]
    q_start, k_start = i * block_q, j * block_k
    causal_live = True if not causal else (
        q_start + q_offset + block_q - 1 >= k_start)

    @pl.when(jnp.logical_and(causal_live, k_start < kv_len))
    def _compute():
        q = q_ref[0]
        do = do_ref[0]
        p, ds = _bwd_common(
            q, k_ref[0], do, v_ref[0],
            lse_ref[0][:, 0:1], delta_ref[0][:, 0:1],
            k_start, q_start + q_offset, kv_len, causal, sm_scale,
            block_q, block_k)
        # contract over the query dim (dim 0 of both) — no transposes
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale", "block_q",
                                             "block_k"))
def _flash_bwd(q, k, v, kv_lens, q_start, out, lse, g, *, causal, sm_scale,
               block_q=None, block_k=None):
    """Blockwise recompute-style backward: dq over (q-block x k-block) with
    the k loop innermost; dk/dv with the q loop innermost. O(S) memory —
    logits are never materialized (reference capability:
    model/llava/.../flash_attn_triton.py fwd+bwd).

    Default blocks are bwd-specific: the fwd-tuned 1152 cap OOMs scoped
    VMEM for the bwd kernels (two f32 accumulators + 6 input blocks exceed
    the 16 MB limit at the flagship train shape [2,32,3456,96] — a hard
    compile failure, not a slowdown). Among legal sizes a v5e sweep at
    that shape measured 384x768 fastest (15.5 ms vs 16.3-16.9 for
    384/512/768 squares), though repeat runs show ±25% tunnel variance —
    treat the ordering as indicative; the cap is the load-bearing part."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    block_q = _pick_block(Sq, cap=384) if block_q is None else \
        min(block_q, _round_up(Sq, 128))
    if block_k is None:
        block_k = 768 if _round_up(Sk, 768) <= 1.15 * Sk else \
            _pick_block(Sk, cap=512)
    else:
        block_k = min(block_k, _round_up(Sk, 128))
    Dp = _round_up(D, 128)
    Sqp = _round_up(Sq, block_q)
    Skp = _round_up(Sk, block_k)

    # delta = rowsum(dO * O) (f32), lane-broadcast like lse
    delta = jnp.einsum("bhqd,bhqd->bhq", g.astype(jnp.float32),
                       out.astype(jnp.float32))
    delta = jnp.pad(delta.reshape(B * H, Sq), ((0, 0), (0, Sqp - Sq)))
    delta = jnp.broadcast_to(delta[..., None], (B * H, Sqp, 128))
    lse_p = jnp.pad(lse, ((0, 0), (0, Sqp - lse.shape[1]), (0, 127)))
    lse_p = jnp.broadcast_to(lse_p[:, :, :1], (B * H, Sqp, 128))

    def pad3(x, S, Sp):
        return jnp.pad(x, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D))
                       ).reshape(B * H, Sp, Dp)

    qp, dop = pad3(q, Sq, Sqp), pad3(g, Sq, Sqp)
    kp, vp = pad3(k, Sk, Skp), pad3(v, Sk, Skp)

    scalars = jnp.stack([
        jnp.repeat(kv_lens.astype(jnp.int32), H),
        jnp.repeat(q_start.astype(jnp.int32), H),
    ], axis=1)

    nq, nk = Sqp // block_q, Skp // block_k

    q_spec = pl.BlockSpec((1, block_q, Dp), lambda b, i, j, kvl: (b, i, 0))
    row_spec = pl.BlockSpec((1, block_q, 128), lambda b, i, j, kvl: (b, i, 0))
    k_spec = pl.BlockSpec((1, block_k, Dp), lambda b, i, j, kvl: (b, j, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, causal=causal,
                          sm_scale=sm_scale, block_q=block_q,
                          block_k=block_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, nq, nk),
            in_specs=[q_spec, k_spec, k_spec, q_spec, row_spec, row_spec],
            out_specs=q_spec,
            scratch_shapes=[pltpu.VMEM((block_q, Dp), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Sqp, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(scalars, qp, kp, vp, dop, lse_p, delta)

    # dk/dv: k blocks in the middle (parallel), q blocks innermost
    q_spec_t = pl.BlockSpec((1, block_q, Dp), lambda b, j, i, kvl: (b, i, 0))
    row_spec_t = pl.BlockSpec((1, block_q, 128),
                              lambda b, j, i, kvl: (b, i, 0))
    k_spec_t = pl.BlockSpec((1, block_k, Dp), lambda b, j, i, kvl: (b, j, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, causal=causal,
                          sm_scale=sm_scale, block_q=block_q,
                          block_k=block_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, nk, nq),
            in_specs=[q_spec_t, k_spec_t, k_spec_t, q_spec_t, row_spec_t,
                      row_spec_t],
            out_specs=[k_spec_t, k_spec_t],
            scratch_shapes=[pltpu.VMEM((block_k, Dp), jnp.float32),
                            pltpu.VMEM((block_k, Dp), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((B * H, Skp, Dp), k.dtype),
                   jax.ShapeDtypeStruct((B * H, Skp, Dp), v.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(scalars, qp, kp, vp, dop, lse_p, delta)

    dq = dq.reshape(B, H, Sqp, Dp)[:, :, :Sq, :D]
    dk = dk.reshape(B, H, Skp, Dp)[:, :, :Sk, :D]
    dv = dv.reshape(B, H, Skp, Dp)[:, :, :Sk, :D]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention_custom(q, k, v, kv_lens, q_start, causal, sm_scale):
    out, _ = _flash_fwd(q, k, v, kv_lens, q_start, causal=causal,
                        sm_scale=sm_scale, need_lse=False)
    return out


def _flash_attention_fwd_rule(q, k, v, kv_lens, q_start, causal, sm_scale):
    out, lse = _flash_fwd(q, k, v, kv_lens, q_start, causal=causal,
                          sm_scale=sm_scale)
    return out, (q, k, v, kv_lens, q_start, out, lse)


def _flash_attention_bwd_rule(causal, sm_scale, res, g):
    import numpy as np
    q, k, v, kv_lens, q_start, out, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, kv_lens, q_start, out, lse, g,
                            causal=causal, sm_scale=sm_scale)
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
# Batched single-block attention (small windows)
# ---------------------------------------------------------------------------
def _window_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                   s_valid: int, g: int):
    """G (batch*head) rows of full self-attention per program. Each row is a
    single [Sp, Sp] block — whole-row softmax, no online rescaling. Padded
    KV columns (>= s_valid) are masked; padded query rows are sliced off by
    the caller."""
    for i in range(g):
        q = q_ref[i]
        k = k_ref[i]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        if s_valid < k.shape[0]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < s_valid, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[i],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[i] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def _window_attention_fwd(q, k, v, *, sm_scale):
    """Non-causal full self-attention for short sequences (<= 512 tokens),
    e.g. Hiera window attention where XLA's materialized-logits path is
    ~6x off the streaming bound at [16 windows, 8 heads, 256, 72]. Folds
    (batch, head) pairs into per-program groups so block DMAs amortize."""
    B, H, S, D = q.shape
    Sp = _round_up(S, 128)
    Dp = _round_up(D, 128)
    BH = B * H

    # VMEM per group row: q/k/v/o blocks + the [Sp, Sp] f32 logits
    per_g = 3 * Sp * Dp * 2 + Sp * Sp * 4 + Sp * Dp * 4
    G = max(1, min(8, (8 << 20) // per_g, BH))
    BHp = _round_up(BH, G)

    def prep(x):
        x = x.reshape(BH, S, D)
        return jnp.pad(x, ((0, BHp - BH), (0, Sp - S), (0, Dp - D)))

    qp, kp, vp = prep(q), prep(k), prep(v)
    out = pl.pallas_call(
        functools.partial(_window_kernel, sm_scale=sm_scale, s_valid=S, g=G),
        grid=(BHp // G,),
        in_specs=[pl.BlockSpec((G, Sp, Dp), lambda b: (b, 0, 0))] * 3,
        out_specs=pl.BlockSpec((G, Sp, Dp), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BHp, Sp, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(qp, kp, vp)
    return out[:BH, :S, :D].reshape(B, H, S, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _window_attention(q, k, v, sm_scale):
    return _window_attention_fwd(q, k, v, sm_scale=sm_scale)


def _window_attention_fwd_rule(q, k, v, sm_scale):
    return _window_attention_fwd(q, k, v, sm_scale=sm_scale), (q, k, v)


def _window_attention_bwd_rule(sm_scale, res, g):
    # short sequences: the XLA recompute backward is cheap and exact
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _attention_xla(q, k, v, causal=False,
                                       sm_scale=sm_scale, kv_lens=None,
                                       bias=None), q, k, v)
    return vjp(g)


_window_attention.defvjp(_window_attention_fwd_rule,
                         _window_attention_bwd_rule)


# ---------------------------------------------------------------------------
# Tiny-window attention (windows packed into full 128-sublane MXU tiles)
# ---------------------------------------------------------------------------
def _smallwin_kernel(x_ref, o_ref, *, sm_scale: float, S: int, H: int,
                     hd: int, P: int, T: int, tile: int):
    """Block-diagonal attention over S-token windows, S in {16, 32, 64}.

    x_ref: [F, S, 3*H*hd] fused-qkv windows (P = tile // S windows pack one
    tile-row MXU group; F = P*T windows per program). Heads live at their
    NATURAL unpadded lane offsets — per-head operands are in-register lane
    slices of the tile, so HBM never sees padded activations (the head-
    padded projection route costs 1.78x activation bandwidth at hd=72,
    which is why it loses at these window sizes). Logits exist only in
    registers/VMEM: one [tile, tile] f32 block per (group, head) with the
    cross-window region masked before a whole-row softmax.

    `tile` trades MXU depth against VPU/FLOP waste: at tile=128 each dot is
    pipeline-latency-bound (128 rows); bigger tiles make fewer, deeper dots
    but mask-waste grows as tile/S on the exp/sum passes."""
    C = H * hd
    # static cross-window mask: row and col attend iff same S-token window
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0) // S
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1) // S
    same_win = row == col
    for t in range(T):
        xt = x_ref[t * P:(t + 1) * P]                    # [P, S, 3C]
        xt = xt.reshape(tile, 3 * C)
        outs = []
        for h in range(H):
            q = xt[:, h * hd:(h + 1) * hd]
            k = xt[:, C + h * hd:C + (h + 1) * hd]
            v = xt[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = jnp.where(same_win, s * sm_scale, NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append(o / l)
        o = outs[0] if H == 1 else jnp.concatenate(outs, axis=1)
        o_ref[t * P:(t + 1) * P] = o.reshape(P, S, C).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "head_dim",
                                             "sm_scale", "interpret"))
def _smallwin_fwd(qkv, *, num_heads, head_dim, sm_scale, interpret=False):
    NW, S, C3 = qkv.shape
    H, hd = num_heads, head_dim
    # MXU tile: 256 measured best at the stage-1/2 bench shapes (8192
    # windows; ms per attention op, v5e): stage1 2.26/1.99/OOM at
    # 128/256/512, stage2 1.47/1.29/OOM. Bigger tiles make fewer,
    # pipeline-deeper dots but the masked-softmax VPU work grows as
    # tile/S, and Mosaic allocates the [tile, tile] f32 logits PER
    # unrolled (group, head) iteration — 512 blows the 16 MB scoped VMEM.
    import os
    tile = int(os.environ.get("VGT_SMALLWIN_TILE", "256"))
    while tile > 128 and NW % (tile // S):
        tile //= 2
    P = tile // S
    # tile groups per program: bounded by scoped VMEM — in/out blocks
    # (double-buffered) plus per-unrolled-iteration logits/operand temps
    # (Mosaic does not reuse scratch across the static T x H loop)
    T = int(os.environ.get("VGT_SMALLWIN_T", "8"))

    def _vmem(t):
        blocks = P * t * S * (C3 + C3 // 3) * 2 * 2
        temps = t * H * (tile * tile * 4 + 4 * tile * hd * 4)
        return blocks + temps

    while T > 1 and (NW % (P * T) or _vmem(T) > (12 << 20)):
        T -= 1
    F = P * T
    out = pl.pallas_call(
        functools.partial(_smallwin_kernel, sm_scale=sm_scale, S=S, H=H,
                          hd=hd, P=P, T=T, tile=tile),
        grid=(NW // F,),
        in_specs=[pl.BlockSpec((F, S, C3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((F, S, C3 // 3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NW, S, C3 // 3), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(qkv)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _smallwin_tpu(qkv, num_heads, head_dim, sm_scale):
    return _smallwin_fwd(qkv, num_heads=num_heads, head_dim=head_dim,
                         sm_scale=sm_scale)


def _smallwin_xla(qkv, num_heads, sm_scale):
    NW, S, C3 = qkv.shape
    x = qkv.reshape(NW, S, 3, num_heads, C3 // (3 * num_heads))
    return _attention_xla_bshd(x[:, :, 0], x[:, :, 1], x[:, :, 2],
                               sm_scale).reshape(NW, S, C3 // 3)


def _smallwin_fwd_rule(qkv, num_heads, head_dim, sm_scale):
    return _smallwin_fwd(qkv, num_heads=num_heads, head_dim=head_dim,
                         sm_scale=sm_scale), qkv


def _smallwin_bwd_rule(num_heads, head_dim, sm_scale, qkv, g):
    _, vjp = jax.vjp(lambda q: _smallwin_xla(q, num_heads, sm_scale), qkv)
    return vjp(g)


_smallwin_tpu.defvjp(_smallwin_fwd_rule, _smallwin_bwd_rule)


def attention_packed_qkv_smallwin(qkv, num_heads: int, head_dim: int, *,
                                  sm_scale: Optional[float] = None):
    """Self-attention over tiny fixed windows straight from a fused qkv
    projection. qkv: [NW, S, 3*H*hd] with S (tokens per window) in
    {16, 32, 64} — each program packs 128//S windows into full 128-row MXU
    tiles with a block-diagonal mask, so Hiera stage-1/2/4 window attention
    never materializes f32 logits or head-transposed copies in HBM (the
    XLA einsum path measured ~12x the per-stage roofline at the bench
    shape). Returns [NW, S, H*hd]."""
    NW, S, C3 = qkv.shape
    if sm_scale is None:
        sm_scale = head_dim ** -0.5
    if (jax.default_backend() == "tpu" and S in (16, 32, 64)
            and NW % (128 // S) == 0 and head_dim <= 128):
        return _smallwin_tpu(qkv, num_heads, head_dim, float(sm_scale))
    return _smallwin_xla(qkv, num_heads, float(sm_scale))


# ---------------------------------------------------------------------------
# BSHD attention (no head transposes)
# ---------------------------------------------------------------------------
def _bshd_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                 s_valid: int, g: int, win: int = 0):
    """Blocks are [1, Sp, G*128] lane-flattened slices of [B, Sp, H*128]
    (or [B, Sp, 3H*128]) arrays — heads stay where the projection wrote
    them, so the caller never transposes [B, S, H, D] -> [B, H, S, D]
    (those relayouts measured 32% of a Hiera stage-3 block). Head i is the
    static 128-aligned lane slice [i*128, (i+1)*128); one full-row softmax
    per head.

    win > 0 restricts attention block-diagonally to `win`-token windows:
    several small windows fold into one program's rows (Hiera's 16/64-token
    windows become 512-token super-windows) instead of wasting 8x padding
    per window."""
    for i in range(g):
        sl = slice(128 * i, 128 * (i + 1))
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        masked = False
        if win and win < k.shape[0]:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(row // win == col // win, s, NEG_INF)
            masked = True
        if s_valid < k.shape[0] and not masked:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < s_valid, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, :, sl],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


def _pick_group(H: int, Sp: int) -> int:
    """Heads per program: largest divisor of H whose working set fits in
    VMEM — 4 double-buffered qkvo blocks plus one f32 logits buffer PER
    unrolled head iteration (Mosaic does not reuse the scratch across the
    static loop; measured: [16,640,2048] blocks at G=8 demanded 20.6M)."""
    for g in (8, 4, 2, 1):
        if H % g == 0 and \
                8 * Sp * g * 128 * 2 + g * Sp * Sp * 4 <= (15 << 20) + (512 << 10):
            return g
    return 1


def _pad_heads_flat(x, Sp, Dp):
    """[B, S, H, D] -> [B, Sp, H*Dp] with per-head lane padding."""
    B, S, H, D = x.shape
    x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0), (0, Dp - D)))
    return x.reshape(B, Sp, H * Dp)


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def _bshd_fwd(q, k, v, *, sm_scale):
    B, S, H, D = q.shape
    Sp = _round_up(S, 128)
    Dp = _round_up(D, 128)
    G = _pick_group(H, Sp)

    spec = pl.BlockSpec((1, Sp, G * Dp), lambda b, h: (b, 0, h))
    out = pl.pallas_call(
        functools.partial(_bshd_kernel, sm_scale=sm_scale, s_valid=S, g=G),
        grid=(B, H // G),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, Sp, H * Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(_pad_heads_flat(q, Sp, Dp), _pad_heads_flat(k, Sp, Dp),
      _pad_heads_flat(v, Sp, Dp))
    return out.reshape(B, Sp, H, Dp)[:, :S, :, :D]


@functools.partial(jax.jit, static_argnames=("num_heads", "sm_scale", "win"))
def _packed_qkv_fwd(qkv, *, num_heads, sm_scale, win=0):
    """qkv: [B, S, 3*H*hd] straight from the fused projection (HF packing:
    q heads, then k heads, then v heads). The kernel's q/k/v specs index
    disjoint head ranges of ONE padded array — no slicing, no transposes."""
    B, S, C3 = qkv.shape
    H = num_heads
    D = C3 // (3 * H)
    Sp = _round_up(S, 128)
    Dp = _round_up(D, 128)
    G = _pick_group(H, Sp)
    nh_blocks = H // G

    x = _pad_heads_flat(qkv.reshape(B, S, 3 * H, D), Sp, Dp)

    def spec(off):
        return pl.BlockSpec((1, Sp, G * Dp), lambda b, h: (b, 0, off + h))

    out = pl.pallas_call(
        functools.partial(_bshd_kernel, sm_scale=sm_scale, s_valid=S, g=G,
                          win=win),
        grid=(B, nh_blocks),
        in_specs=[spec(0), spec(nh_blocks), spec(2 * nh_blocks)],
        out_specs=pl.BlockSpec((1, Sp, G * Dp), lambda b, h: (b, 0, h)),
        out_shape=jax.ShapeDtypeStruct((B, Sp, H * Dp), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x, x, x)
    return out.reshape(B, Sp, H, Dp)[:, :S, :, :D]


def _attention_xla_bshd(q, k, v, sm_scale, win: int = 0):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * sm_scale
    if win and win < k.shape[1]:
        row = jnp.arange(q.shape[1])[:, None] // win
        col = jnp.arange(k.shape[1])[None, :] // win
        logits = jnp.where((row == col)[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_bshd_tpu(q, k, v, sm_scale):
    return _bshd_fwd(q, k, v, sm_scale=sm_scale)


def _bshd_fwd_rule(q, k, v, sm_scale):
    return _bshd_fwd(q, k, v, sm_scale=sm_scale), (q, k, v)


def _bshd_bwd_rule(sm_scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _attention_xla_bshd(q, k, v, sm_scale),
                     q, k, v)
    return vjp(g)


_attention_bshd_tpu.defvjp(_bshd_fwd_rule, _bshd_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _packed_qkv_tpu(qkv, num_heads, sm_scale, win):
    return _packed_qkv_fwd(qkv, num_heads=num_heads, sm_scale=sm_scale,
                           win=win)


def _packed_fwd_rule(qkv, num_heads, sm_scale, win):
    return _packed_qkv_fwd(qkv, num_heads=num_heads, sm_scale=sm_scale,
                           win=win), qkv


def _packed_bwd_rule(num_heads, sm_scale, win, qkv, g):
    def ref(qkv):
        B, S, C3 = qkv.shape
        D = C3 // (3 * num_heads)
        x = qkv.reshape(B, S, 3, num_heads, D)
        return _attention_xla_bshd(x[:, :, 0], x[:, :, 1], x[:, :, 2],
                                   sm_scale, win)
    _, vjp = jax.vjp(ref, qkv)
    return vjp(g)


_packed_qkv_tpu.defvjp(_packed_fwd_rule, _packed_bwd_rule)


@functools.partial(jax.jit, static_argnames=("num_heads", "sm_scale", "win"))
def _packed_padded_fwd(qkv, *, num_heads, sm_scale, win):
    """qkv already head-PADDED to 128 lanes per head ([B, S, 3*H*128],
    q heads | k heads | v heads): the pad happened inside the projection
    (zero-padded WEIGHT columns), so no activation relayout ever runs —
    the earlier super-window fold regressed on exactly that per-head
    72 -> 128 activation pad (models/sam2/hiera.py history)."""
    B, S, C3 = qkv.shape
    H = num_heads
    assert C3 == 3 * H * 128, (C3, H)
    # NO token padding: the block covers the full (possibly non-128-
    # multiple) token dim — Mosaic pads sublanes internally, and skipping
    # the whole-array pad removes a per-layer relayout fusion (InternVideo2
    # S=1025: 0.726 -> 0.436 ms/op measured, bit-exact). s_valid == S means
    # the kernel applies no column mask.
    G = _pick_group(H, _round_up(S, 128))
    nh_blocks = H // G

    def spec(off):
        return pl.BlockSpec((1, S, G * 128), lambda b, h: (b, 0, off + h))

    out = pl.pallas_call(
        functools.partial(_bshd_kernel, sm_scale=sm_scale, s_valid=S, g=G,
                          win=win),
        grid=(B, nh_blocks),
        in_specs=[spec(0), spec(nh_blocks), spec(2 * nh_blocks)],
        out_specs=pl.BlockSpec((1, S, G * 128), lambda b, h: (b, 0, h)),
        out_shape=jax.ShapeDtypeStruct((B, S, H * 128), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qkv, qkv, qkv)
    return out


def _packed_padded_xla(qkv, num_heads, sm_scale, win):
    B, S, C3 = qkv.shape
    H = num_heads
    x = qkv.reshape(B, S, 3, H, 128)
    # zero pad lanes contribute nothing to q.k or p.v — same math as the
    # unpadded heads
    o = _attention_xla_bshd(x[:, :, 0], x[:, :, 1], x[:, :, 2], sm_scale,
                            win)
    return o.reshape(B, S, H * 128)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _packed_padded_tpu(qkv, num_heads, sm_scale, win):
    return _packed_padded_fwd(qkv, num_heads=num_heads, sm_scale=sm_scale,
                              win=win)


def _packed_padded_fwd_rule(qkv, num_heads, sm_scale, win):
    return _packed_padded_fwd(qkv, num_heads=num_heads, sm_scale=sm_scale,
                              win=win), qkv


def _packed_padded_bwd_rule(num_heads, sm_scale, win, qkv, g):
    _, vjp = jax.vjp(
        lambda q: _packed_padded_xla(q, num_heads, sm_scale, win), qkv)
    return vjp(g)


_packed_padded_tpu.defvjp(_packed_padded_fwd_rule, _packed_padded_bwd_rule)


def attention_packed_qkv_padded(qkv, num_heads: int, head_dim: int, *,
                                win: int = 0,
                                sm_scale: Optional[float] = None):
    """Self-attention over a head-prepadded fused qkv ([B, S, 3*H*128],
    each head occupying a full 128-lane tile with zero pad lanes — produced
    by zero-padding the PROJECTION weights, see hiera.HeadPaddedQKV).
    Returns [B, S, H*128] (pad lanes zero). win > 0 = block-diagonal
    attention over win-token windows folded along the token axis. sm_scale
    defaults to head_dim**-0.5 (the REAL head dim, not 128)."""
    B, S, _ = qkv.shape
    if sm_scale is None:
        sm_scale = head_dim ** -0.5
    if jax.default_backend() == "tpu" and 128 <= S <= 1536:
        return _packed_padded_tpu(qkv, num_heads, float(sm_scale), win)
    return _packed_padded_xla(qkv, num_heads, float(sm_scale), win)


def attention_bshd(q, k, v, *, sm_scale: Optional[float] = None):
    """Full (non-causal, unmasked) self-attention in [B, S, H, D] layout —
    the layout projections produce. q/k/v may be free reshapes of the
    projection outputs; no [B,H,S,D] transpose is ever materialized.
    Returns [B, S, H, D]. Falls back to the XLA einsum off-TPU or at shapes
    the kernel doesn't cover."""
    B, S, H, D = q.shape
    if sm_scale is None:
        sm_scale = D ** -0.5
    # D <= 128 guard: the kernel maps head i to the static lane slice
    # [i*128, (i+1)*128), so heads wider than one 128-lane tile would be
    # silently truncated — oversized heads fall back to XLA.
    if jax.default_backend() == "tpu" and 128 <= S <= 1536 and D <= 128:
        return _attention_bshd_tpu(q, k, v, float(sm_scale))
    return _attention_xla_bshd(q, k, v, sm_scale)


def attention_packed_qkv(qkv, num_heads: int, *,
                         sm_scale: Optional[float] = None, win: int = 0):
    """Self-attention straight from a fused qkv projection ([B, S, 3*H*hd],
    HF head packing). Returns [B, S, H, hd]. win > 0 = block-diagonal
    attention over `win`-token windows folded along the row axis (the
    caller guarantees S % win == 0)."""
    B, S, C3 = qkv.shape
    D = C3 // (3 * num_heads)
    if sm_scale is None:
        sm_scale = D ** -0.5
    # same D <= 128 guard as attention_bshd (one head = one lane tile)
    if jax.default_backend() == "tpu" and 128 <= S <= 1536 and D <= 128:
        return _packed_qkv_tpu(qkv, num_heads, float(sm_scale), win)
    x = qkv.reshape(B, S, 3, num_heads, D)
    return _attention_xla_bshd(x[:, :, 0], x[:, :, 1], x[:, :, 2], sm_scale,
                               win)


def attention_bshd_cross(q, k, v, *, sm_scale: Optional[float] = None):
    """Cross-length BSHD attention (Sq != Sk): the pooled-query Hiera
    stage-transition blocks (reference hieradet.py:116-129 q_pool). Small
    per-window token counts — the XLA einsum is at the floor here; the win
    is keeping q/k/v as free reshapes of flat-2D projection outputs (no
    [B,H,S,D] transposes)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    return _attention_xla_bshd(q, k, v, float(sm_scale))


# ---------------------------------------------------------------------------
# Single-pass decode attention over the int8 KV cache
# ---------------------------------------------------------------------------
# Decode (Sq == 1) is pure HBM streaming: the XLA quant-aware path issues
# q.K^T and probs.V as two separate fusions that each re-derive operands from
# the int8 cache, measured at 374 / 260 GB/s (xprof leaf attribution, v5e) —
# one-third to one-half of the ~740 GB/s the int8 weight matvecs in the same
# step sustain. This kernel streams each K/V block from HBM exactly once and
# does logits -> online softmax -> V contraction in one program, with the
# per-token/head dequant scales folded where they cost nothing (K scale onto
# the logits, V scale onto the probs — same algebra as _attention_xla). GQA
# is native: the G = Hq//Hkv query heads of a KV head ride the sublane axis
# of one program, so Llama's decode no longer materializes a jnp.repeat'd
# copy of the int8 cache every step. Blocks past kv_len are clamped to the
# last live block in the index maps (consecutive identical indices elide the
# DMA) and skipped in compute.
#
# Reference has no decode cache at all (full-prefix recompute each token,
# /root/reference/VideoGLaMM/model/VideoGLaMM.py:789-806).
def _decode_group_plan(Hkv: int, hd: int) -> Optional[int]:
    """Heads per in-kernel group: the largest divisor of Hkv whose column
    span (heads * hd) is lane-aligned and <= 1024 (bounds the dense
    block-diagonal FLOP waste and the per-group bf16 operand temp)."""
    for hpg in sorted((d for d in range(1, Hkv + 1) if Hkv % d == 0),
                      reverse=True):
        if hpg * hd <= 1024 and (hpg * hd) % 128 == 0:
            return hpg
    return None


def _decode_q_kernel(kvlen_ref, qbd_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                     acc_ref, m_ref, l_ref, *, sm_scale: float, block_k: int,
                     heads_pg: int, G: int, hd: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    kv_len = kvlen_ref[b]
    k_start = j * block_k

    @pl.when(k_start < kv_len)
    def _compute():
        qbd = qbd_ref[0]                                 # [Hq, HD] blockdiag
        k = k_ref[0, 0]                                  # [bk, HD] int8
        v = v_ref[0, 0]
        Hq = qbd.shape[0]
        rows, cols = heads_pg * G, heads_pg * hd
        n_groups = Hq // rows

        # logits: one [rows, cols] x [bk, cols]^T MXU dot per head group.
        # qbd rows are zero outside their own head's hd-column block, so the
        # dense dot computes exactly the per-head matvecs (the wasted
        # cross-head FLOPs are free — decode is HBM-bound, the MXU is idle).
        parts = []
        for g in range(n_groups):
            rg = slice(g * rows, (g + 1) * rows)
            cg = slice(g * cols, (g + 1) * cols)
            parts.append(jax.lax.dot_general(
                qbd[rg, cg], k[:, cg].astype(qbd.dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        s = (parts[0] if n_groups == 1 else
             jnp.concatenate(parts, axis=0)) * sm_scale  # [Hq, bk] f32

        ks = ks_ref[0, 0]                                # [Hkv, bk]
        vs = vs_ref[0, 0]
        if G > 1:
            ks = jnp.repeat(ks, G, axis=0)               # [Hq, bk]
            vs = jnp.repeat(vs, G, axis=0)
        s = s * ks
        col = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)                  # [1, bk]
        live = col < kv_len
        s = jnp.where(live, s, NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                           # [Hq, bk] f32
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = jnp.broadcast_to(
            alpha * l_ref[:, 0:1] + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

        pb = (p * jnp.where(live, vs, 0.0)).astype(qbd.dtype)
        # per-group dense probs.V, then extract each row's own head block
        # (row r belongs to local head r // G). Pure 2D lane-slices + masked
        # adds — a [rows, heads_pg, hd] reshape is a lane-dim split Mosaic
        # can't lay out for hd % 128 != 0
        row_lh = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // G
        outs = []
        for g in range(n_groups):
            rg = slice(g * rows, (g + 1) * rows)
            cg = slice(g * cols, (g + 1) * cols)
            pv = jax.lax.dot_general(pb[rg], v[:, cg].astype(qbd.dtype),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o_g = jnp.zeros((rows, hd), jnp.float32)
            for lh in range(heads_pg):
                o_g = o_g + jnp.where(row_lh == lh,
                                      pv[:, lh * hd:(lh + 1) * hd], 0.0)
            outs.append(o_g)
        pv_all = outs[0] if n_groups == 1 else jnp.concatenate(outs, axis=0)
        acc_ref[:] = acc_ref[:] * alpha + pv_all

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_ref[:, 0:1]
        o_ref[0] = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_k",
                                             "interpret"))
def decode_attention_quant(q, k, v, k_scale, v_scale, kv_lens, layer=None, *,
                           sm_scale: float, block_k: int = 512,
                           interpret: bool = False):
    """q: [B, Hq, 1, hd] (Hq = G * Hkv, grouped-query order: q head i reads
    kv head i // G); k/v: TOKEN-MAJOR flat int8 — either one layer's slab
    [B, C, Hkv*hd] or the FULL stacked cache [L, B, C, Hkv*hd] with `layer`
    a traced scalar index. Passing the stacked cache is how the decoder scan
    calls this: the layer is selected in the kernel's index maps (scalar
    prefetch), so no XLA dynamic-slice ever materializes a 2x copy of the
    layer slab just to feed the kernel (measured 31 us/layer/token of pure
    copy at flagship scale). k_scale/v_scale: [(L,) B, Hkv, C] f32;
    kv_lens: [B]. Returns [B, Hq, 1, hd] in q.dtype. Caller must check
    _decode_group_plan(Hkv, hd) is not None before dispatching here."""
    B, Hq, _, hd = q.shape
    Hkv = k_scale.shape[-2]
    if k.ndim == 3:
        k, v = k[None], v[None]
        k_scale, v_scale = k_scale[None], v_scale[None]
        layer = jnp.int32(0)
    C = k.shape[2]
    HD = Hkv * hd
    G = Hq // Hkv
    heads_pg = _decode_group_plan(Hkv, hd)
    bk = min(block_k, _round_up(C, 128))
    nk = (C + bk - 1) // bk
    # scalar-prefetch vector: [kv_lens(B), layer]
    scalars = jnp.concatenate([kv_lens.astype(jnp.int32),
                               jnp.asarray(layer, jnp.int32)[None]])

    # block-diagonal query [B, Hq, Hkv*hd]: row i carries q head i in the
    # hd-column block of kv head i // G, zeros elsewhere (tiny: ~200 KB at
    # flagship scale, built once per step outside the kernel)
    sel = (jnp.arange(Hq)[:, None] // G == jnp.arange(Hkv)[None, :])
    qbd = (q[:, :, 0, None, :] * sel[None, :, :, None].astype(q.dtype)
           ).reshape(B, Hq, HD)

    def _clamp(j, kvl, b):
        # last live block = ceil(kvl/bk) - 1; lax.div (truncating) instead of
        # Python // — floor-div's sign-correction ops don't lower in TPU
        # index maps, and operands here are non-negative. Blocks past kv_len
        # re-map to the last live block (consecutive identical indices elide
        # the DMA) and their compute is skipped.
        last = jax.lax.div(jnp.maximum(kvl[b], 1) - 1, jnp.int32(bk))
        return jnp.minimum(j, last)

    kv_map = lambda b, j, sc: (sc[B], b, _clamp(j, sc, b), 0)
    sc_map = lambda b, j, sc: (sc[B], b, 0, _clamp(j, sc, b))

    out = pl.pallas_call(
        functools.partial(_decode_q_kernel, sm_scale=float(sm_scale),
                          block_k=bk, heads_pg=heads_pg, G=G, hd=hd),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nk),
            in_specs=[
                pl.BlockSpec((1, Hq, HD), lambda b, j, sc: (b, 0, 0)),
                pl.BlockSpec((1, 1, bk, HD), kv_map),
                pl.BlockSpec((1, 1, bk, HD), kv_map),
                pl.BlockSpec((1, 1, Hkv, bk), sc_map),
                pl.BlockSpec((1, 1, Hkv, bk), sc_map),
            ],
            out_specs=pl.BlockSpec((1, Hq, hd), lambda b, j, sc: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((Hq, hd), jnp.float32),
                pltpu.VMEM((Hq, 128), jnp.float32),
                pltpu.VMEM((Hq, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(scalars, qbd, k, v, k_scale, v_scale)

    return out[:, :, None, :]


# ---------------------------------------------------------------------------
# Dispatcher
# ---------------------------------------------------------------------------
def dot_product_attention(q, k, v, *, causal: bool = False,
                          kv_lens: Optional[jax.Array] = None,
                          kv_mask: Optional[jax.Array] = None,
                          bias: Optional[jax.Array] = None,
                          q_start: Optional[jax.Array] = None,
                          sm_scale: Optional[float] = None,
                          k_scale: Optional[jax.Array] = None,
                          v_scale: Optional[jax.Array] = None,
                          layer: Optional[jax.Array] = None,
                          force_xla: bool = False):
    """Attention entrypoint used by all model stacks.

    Uses the Pallas flash kernel on TPU for long sequences; falls back to the
    XLA implementation on CPU, for biased/per-token-masked attention (small
    decoders + memory attention), and for short sequences where a fused XLA
    softmax wins. kv_mask: [B, Sk] bool — True = attendable.
    k_scale/v_scale: per-token/head dequant scales for an int8 KV cache
    (decode path; k/v arrive int8, scales fold into logits/probs). k/v may
    be one layer's token-major slab ([B, C, Hkv*hd]) or the FULL stacked
    cache ([L, B, C, Hkv*hd]) with `layer` a traced scalar index — the
    Pallas decode kernel selects the layer via scalar prefetch so no 2x
    slab copy is materialized per step (models/kvcache.py:update_and_fetch).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    on_tpu = jax.default_backend() == "tpu"
    if k_scale is not None:
        # int8 KV cache: k/v arrive TOKEN-MAJOR flat ([B, C, Hkv*hd],
        # models/kvcache.py) and UNREPEATED — GQA is handled here, natively
        # in the Pallas kernel or by a repeat on the XLA fallback. Sq == 1
        # decode with causal + q_start == kv_len-1 reduces to the kv_lens
        # mask the kernel applies.
        import os
        B, Hq, Sq_, hd = q.shape
        Hkv, C = k_scale.shape[-2], k.shape[-2]
        stacked = k.ndim == 4
        if (on_tpu and Sq_ == 1 and bias is None and kv_mask is None
                and kv_lens is not None
                and _decode_group_plan(Hkv, hd) is not None
                and os.environ.get("VGT_DECODE_KERNEL", "1") == "1"):
            return decode_attention_quant(
                q, k, v, k_scale, v_scale, kv_lens,
                layer if stacked else None,
                sm_scale=float(sm_scale),
                block_k=int(os.environ.get("VGT_DECODE_BK", "512")))
        # fallback (CPU tests / unplannable head geometry): slice out the
        # layer slab if stacked, reconstruct the head-major int8 views and
        # run the fused-scale XLA path
        if stacked:
            k, v, k_scale, v_scale = (
                jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False)
                for a in (k, v, k_scale, v_scale))
        k = k.reshape(B, C, Hkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, C, Hkv, hd).transpose(0, 2, 1, 3)
        if Hq != Hkv:
            rep = Hq // Hkv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
            k_scale = jnp.repeat(k_scale, rep, axis=1)
            v_scale = jnp.repeat(v_scale, rep, axis=1)
        return _attention_xla(q, k, v, causal=causal, sm_scale=sm_scale,
                              kv_lens=kv_lens, bias=bias, kv_mask=kv_mask,
                              q_start=q_start, k_scale=k_scale,
                              v_scale=v_scale)
    if force_xla or bias is not None or kv_mask is not None or not on_tpu:
        return _attention_xla(q, k, v, causal=causal, sm_scale=sm_scale,
                              kv_lens=kv_lens, bias=bias, kv_mask=kv_mask,
                              q_start=q_start)
    Sq, Sk = q.shape[2], k.shape[2]
    # medium non-causal full self-attention (InternVideo2 1025, CLIP 577):
    # the single-block kernel avoids both XLA's materialized f32 logits
    # (2.19 ms/block inside InternVideo2) and the flash kernel's online-
    # softmax/block-padding overhead (measured v5e, scan-chained:
    # xla 1.65 / flash 1.88 / window 1.20 ms at [4,16,1025,88];
    # xla 1.91 / flash 3.90 / window 1.53 ms at [16,16,577,64])
    # capped at 1536: above that the single-block f32 logits (padded Sp^2)
    # alone exceed VMEM; 1537..2047 falls through to the XLA path
    if (not causal and kv_lens is None and q_start is None and Sq == Sk
            and 512 < Sq <= 1536):
        return _window_attention(q, k, v, float(sm_scale))
    # long sequences: Pallas flash (causal 3456 prefill: 12.0 -> 3.4 ms;
    # non-causal 4096 Hiera globals: 4.6 -> 1.9 ms). Short/windowed shapes
    # (Hiera 256-token windows, SAM decoder) measured a wash or worse than
    # the fused XLA softmax — they stay on XLA.
    long_enough = (Sq >= 1024 and Sk >= 1024 and (causal or Sq >= 2048))
    if not long_enough:
        return _attention_xla(q, k, v, causal=causal, sm_scale=sm_scale,
                              kv_lens=kv_lens, bias=bias, kv_mask=kv_mask,
                              q_start=q_start)
    return flash_attention(q, k, v, causal=causal, kv_lens=kv_lens,
                           q_start=q_start, sm_scale=sm_scale)
