"""Weight-only int8 quantization + fused dequant matmul.

Serving-path optimization (no reference equivalent — the reference decodes
fp16 with use_cache=False): per-output-channel symmetric int8 weights halve
the HBM weight traffic that bounds autoregressive decode. The Pallas kernel
loads int8 tiles into VMEM, dequantizes in-register, and feeds the MXU with
f32 accumulation; a jnp fallback covers CPU/tests.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, N] float -> (int8 [K, N], scale f32 [N]) per-output-channel
    symmetric."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dequant_matmul_ref(x, w_q, scale):
    w = w_q.astype(jnp.float32) * scale.astype(jnp.float32)
    y = jnp.dot(x.astype(jnp.float32), w, preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _done():
        o_ref[:] = (acc_ref[:] * s_ref[0].astype(jnp.float32)
                    ).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("block_n", "block_k"))
def _dequant_matmul_pallas(x, w_q, scale, block_n=512, block_k=512):
    M, K = x.shape
    N = w_q.shape[1]
    Mp = _round_up(M, 8)
    block_k = min(block_k, _round_up(K, 128))
    block_n = min(block_n, _round_up(N, 128))
    Kp = _round_up(K, block_k)
    Np = _round_up(N, block_n)

    xp = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    wp = jnp.pad(w_q, ((0, Kp - K), (0, Np - N)))
    sp = jnp.pad(scale, (0, Np - N)).reshape(1, Np)

    nk = Kp // block_k
    grid = (Np // block_n, 1, nk)
    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, block_k), lambda n, m, k: (0, k)),
            pl.BlockSpec((block_k, block_n), lambda n, m, k: (k, n)),
            pl.BlockSpec((1, block_n), lambda n, m, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((Mp, block_n), lambda n, m, k: (0, n)),
        scratch_shapes=[pltpu.VMEM((Mp, block_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xp, wp, sp)
    return out[:M, :N]


# ---------------------------------------------------------------- int4 ---

def quantize_int4(w: jnp.ndarray, group: int = 128
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, N] float -> (packed int8 [K//2, N], scales f32 [K//group, N]).

    4-bit signed symmetric with per-(group, output-channel) scales; packed
    row r holds k=2r in the low nibble and k=2r+1 in the high nibble so the
    kernel can unpack with two shifts and never interleave sublanes."""
    K, N = w.shape
    assert K % group == 0 and K % 2 == 0, (K, group)
    wf = w.astype(jnp.float32).reshape(K // group, group, N)
    amax = jnp.max(jnp.abs(wf), axis=1)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)          # [K//group, N]
    q = jnp.clip(jnp.round(wf / scale[:, None]), -8, 7)
    q = q.reshape(K, N).astype(jnp.int8)
    lo = q[0::2] & 0x0F
    hi = jnp.left_shift(q[1::2], 4)
    return (lo | hi).astype(jnp.int8), scale


def _unpack4(p):
    """packed int8 -> (lo, hi) sign-extended nibbles (int32).

    Mosaic cannot legalize i8 vector shifts, so work in i32: the high
    nibble is an arithmetic right shift of the sign-extended byte; the low
    nibble sign-extends via the (x ^ 8) - 8 trick (no left shift)."""
    p32 = p.astype(jnp.int32)
    hi = jnp.right_shift(p32, 4)
    lo = (jnp.bitwise_and(p32, 15) ^ 8) - 8
    return lo, hi


def _dequant4_weights(packed, scales, group, dtype):
    lo, hi = _unpack4(packed)
    K2, N = packed.shape
    q = jnp.stack([lo, hi], axis=1).reshape(2 * K2, N)
    w = q.astype(jnp.float32) * jnp.repeat(scales, group, axis=0)
    return w.astype(dtype)


def _kernel4(xe_ref, xo_ref, p_ref, s_ref, o_ref, acc_ref, *, gh: int):
    """One (m, n, k2) block: unpack the whole k2-slab, expand scales with a
    sublane repeat (no dynamic sub-128 slicing, which Mosaic rejects on the
    lane dim), dequantize, two dots."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = _unpack4(p_ref[:])                         # [bk2, bn] int8
    sg = s_ref[:]                                       # [bk2//gh, bn] f32
    s = jnp.broadcast_to(sg[:, None, :],
                         (sg.shape[0], gh, sg.shape[1])
                         ).reshape(sg.shape[0] * gh, sg.shape[1])
    wl = lo.astype(jnp.float32) * s
    wh = hi.astype(jnp.float32) * s
    acc_ref[:] += jax.lax.dot_general(
        xe_ref[:].astype(jnp.float32), wl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        xo_ref[:].astype(jnp.float32), wh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "block_m", "block_n",
                                             "block_k2"))
def _dequant4_matvec_pallas(x, packed, scales, group=128, block_m=8,
                            block_n=512, block_k2=2048):
    M, K = x.shape
    N = packed.shape[1]
    gh = group // 2
    Mp = _round_up(M, block_m)
    Np = _round_up(N, min(block_n, _round_up(N, 128)))
    block_n = min(block_n, Np)
    # largest k2 block <= block_k2 that divides K//2, is group-aligned, and
    # whose scale-block sublane count (c) is 8-aligned or the full array
    # (TPU block-shape tiling rule)
    n_groups = K // group
    limit = min(block_k2, K // 2)
    block_k2 = K // 2
    for c in range(n_groups, 0, -1):
        bk = c * gh
        if bk <= limit and (K // 2) % bk == 0 and \
                (c % 8 == 0 or c == n_groups):
            block_k2 = bk
            break
    assert (K // 2) % block_k2 == 0 and block_k2 % gh == 0, (K, group)

    xe = jnp.pad(x[:, 0::2], ((0, Mp - M), (0, 0)))
    xo = jnp.pad(x[:, 1::2], ((0, Mp - M), (0, 0)))
    pp = jnp.pad(packed, ((0, 0), (0, Np - N)))
    sp = jnp.pad(scales, ((0, 0), (0, Np - N)))

    out = pl.pallas_call(
        functools.partial(_kernel4, gh=gh),
        grid=(Mp // block_m, Np // block_n, (K // 2) // block_k2),
        in_specs=[
            pl.BlockSpec((block_m, block_k2), lambda m, n, k: (m, k)),
            pl.BlockSpec((block_m, block_k2), lambda m, n, k: (m, k)),
            pl.BlockSpec((block_k2, block_n), lambda m, n, k: (k, n)),
            pl.BlockSpec((block_k2 // gh, block_n), lambda m, n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda m, n, k: (m, n)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xe, xo, pp, sp)
    return out[:M, :N]


def dequant4_matmul(x: jnp.ndarray, packed: jnp.ndarray,
                    scales: jnp.ndarray, group: int = 128):
    """x: [..., K]; packed: [K//2, N] int8 nibbles; scales: [K//group, N]
    f32 -> [..., N]. Decode (small M) runs the Pallas unpack-fused matvec so
    weights stream from HBM at 4 bits; large-M prefill dequantizes once and
    uses the MXU-efficient XLA matmul.

    Measured (v5e, flagship decode): the VPU nibble-unpack costs more than
    the halved HBM traffic saves — int4 serving runs the clip at 8.5 vs
    int8's 12.0 frames/s. int4 is therefore a MEMORY mode (2x less weight
    HBM for fitting larger models per chip), not a speed mode, until the
    MXU can consume packed int4 natively."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    if jax.default_backend() == "tpu" and M <= 64:
        y = _dequant4_matvec_pallas(x2, packed, scales, group=group)
    else:
        w = _dequant4_weights(packed, scales, group, x.dtype)
        y = jnp.dot(x2, w, preferred_element_type=jnp.float32).astype(x.dtype)
    return y.reshape(lead + (packed.shape[1],))


def quantize_rows(x):
    """Per-token symmetric int8 quantization over the last dim.
    x: [..., K] float -> (int8 [..., K], scale f32 [..., 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _w8a8_matmul(x2, w_q, scale):
    """Dynamic per-token W8A8: quantize activations, s8 x s8 -> s32 on the
    MXU (2x the bf16 ALU rate on v5e), fold both scales into the epilogue."""
    q, s = quantize_rows(x2)
    acc = jax.lax.dot_general(q, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s * scale.astype(jnp.float32)
    return y.astype(x2.dtype)


def _w8a8_min_m() -> int:
    """Minimum token count for the W8A8 prefill path: below this the matmul
    is HBM-bound on the (already int8) weights and activation quantization
    only adds work; above it the MXU rate dominates and the int8 ALU path
    wins (slope-measured on the Phi-3 MLP pair at S=3456: 2.35 -> 1.70 ms).
    Env-tunable so the tiny-composite parity gate can force the path."""
    import os
    return int(os.environ.get("VGT_W8A8_MIN_M", "256"))


def w8a8_enabled() -> bool:
    import os
    return os.environ.get("VGT_W8A8", "1") == "1"


def dequant_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray):
    """x: [..., K] float; w_q: [K, N] int8; scale: [N] f32 -> [..., N].

    Decode / small-M: the int8->compute-dtype convert is expressed inline so
    XLA fuses it into the dot's operand load — weights stream from HBM as
    int8 (measured 14.7 -> 9.8 ms/token flagship decode).

    Prefill / large-M (>= _W8A8_MIN_M rows): dynamic per-token W8A8 — the
    activations quantize to int8 (absmax rows) and the dot runs s8 x s8 ->
    s32 on the MXU at 2x the bf16 rate (v5e 394 TOPS); both scales fold
    into the f32 epilogue. Covered by the same end-to-end token/mask
    agreement gate as the int8 weights (tests/test_int8_parity.py);
    VGT_W8A8=0 opts out. The explicit Pallas kernel
    (_dequant_matmul_pallas) is kept for reference; at decode shapes its
    per-call launch overhead (4 projections x 32 layers) eats the
    bandwidth win."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    if x2.shape[0] >= _w8a8_min_m() and w8a8_enabled():
        return _w8a8_matmul(x2, w_q, scale).reshape(lead + (w_q.shape[1],))
    y = jnp.einsum("mk,kn->mn", x2, w_q.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    y = (y * scale.astype(jnp.float32)).astype(x.dtype)
    return y.reshape(lead + (w_q.shape[1],))
