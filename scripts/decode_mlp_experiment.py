"""Fused decode-step kernels for int8-weight LLM serving.

Autoregressive decode at flagship scale (Phi-3-mini, batch 1-4) is
HBM-bound: each token streams ~3.6 GB of int8 weights + ~0.9 GB of int8 KV
cache. The per-piece bandwidth is already near roofline, but the step is a
chain of ~12 small sequential XLA ops per layer (norm -> matvec -> glu ->
matvec -> ...), and the gaps BETWEEN them (launch + no DMA/compute overlap
across kernel boundaries) add up to ~2.4 ms/token of pure serialization
(TODO.md, profile_decode).

MEASURED OUTCOME (v5e via tunnel, flagship decode): the XLA chain is NOT
bubble-bound — it runs the 4.3 GB/step stream at ~605 GB/s effective
(7.11 ms/token), and these kernels measured slower end to end
(9.26 ms/token full decode; isolated 32-layer MLP scan 232 us/layer XLA vs
253 fused / 238 w8a8 — scripts/bench_decode_fused.py). XLA feeds int8
operands to the dot without a separate VPU convert pass and overlaps the
weight stream across op boundaries, so these kernels were DEMOTED from the
production tree (videoglamm_tpu/ops/) to this standalone experiment script;
scripts/bench_decode_fused.py is the A/B harness that produced the numbers.

The three Pallas programs per layer:

  fused_norm_matmul_int8   rmsnorm(x) @ W_qkv * s           (1 program)
  matmul_residual_int8     res + (o @ W_o) * s              (1 program)
  fused_decode_mlp_int8    res + down(silu(gate)*up)(norm)  (1 program)

each streaming its int8 weight blocks through VMEM on the Pallas grid
pipeline (double-buffered DMA overlapping the MXU), so the weight stream
never stalls on op boundaries. Numerics match the XLA decode path
(ops/quant.py dequant_matmul small-M branch): int8 weights convert to the
compute dtype (exact for |w|<=127), bf16 x bf16 dots with f32 accumulation,
per-output-channel scales folded into the f32 epilogue.

No reference equivalent — the reference decodes fp16 with use_cache=False
(/root/reference/VideoGLaMM/model/VideoGLaMM.py:789-806); this is part of
the TPU-native serving stack, covered by the end-to-end int8 parity gate
(tests/test_int8_parity.py) and interpret-mode unit tests
(tests/test_decode_mlp.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def fused_decode_enabled() -> bool:
    """Opt-in switch for the fused decode-layer path (VGT_FUSED_DECODE=1).

    Default OFF after measurement: at flagship scale the op-by-op XLA decode
    already streams weights+KV at ~605 GB/s effective (7.11 ms/token for a
    4.3 GB/step stream, scripts/profile_decode.py), i.e. at this chip's
    practical HBM roofline — and the fused kernels measured SLOWER end to
    end (9.26 ms/token; isolated MLP scan: XLA 232 us/layer vs fused 253 /
    w8a8 238, scripts/bench_decode_fused.py). XLA's dot already consumes
    int8 operands without a separate VPU convert and pipelines the weight
    stream across op boundaries, so there were no serialization bubbles
    left to reclaim. Kept as an experimental mode (interpret-tested) for
    future hardware where kernel-level control wins. Read at trace time."""
    import os
    return os.environ.get("VGT_FUSED_DECODE", "0") == "1"


def _rmsnorm_block(x_ref, w_ref, eps, dtype):
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / xf.shape[-1]
    return (xf * jax.lax.rsqrt(var + eps)
            * w_ref[:].astype(jnp.float32)).astype(dtype)


# ------------------------------------------------------------------ MLP ---

def _mlp_kernel(x_ref, nw_ref, wg_ref, wu_ref, sg_ref, su_ref, wd_ref,
                sd_ref, o_ref, xn_ref, acc_ref, *, eps):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        xn_ref[:] = _rmsnorm_block(x_ref, nw_ref, eps, xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xn = xn_ref[:]
    g = jax.lax.dot_general(xn, wg_ref[:].astype(xn.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = jax.lax.dot_general(xn, wu_ref[:].astype(xn.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # match the XLA path's rounding: projections land in the compute dtype
    # before the glu nonlinearity
    g = (g * sg_ref[:]).astype(xn.dtype).astype(jnp.float32)
    u = (u * su_ref[:]).astype(xn.dtype).astype(jnp.float32)
    h = (g * jax.nn.sigmoid(g) * u).astype(xn.dtype)
    acc_ref[:] += jax.lax.dot_general(h, wd_ref[:].astype(xn.dtype),
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(0) - 1)
    def _done():
        o_ref[:] = (acc_ref[:] * sd_ref[:]
                    + x_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_i", "interpret"))
def _fused_mlp_pallas(x2, norm_w, wgu_q, wgu_s, wd_q, wd_s, eps,
                      block_i=1024, interpret=False):
    M, K = x2.shape
    I2 = wgu_q.shape[1]
    I = I2 // 2
    D = wd_q.shape[1]
    Mp = _round_up(M, 8)
    block_i = min(block_i, I)
    n_i = I // block_i

    xp = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps),
        grid=(n_i,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda j: (0, 0)),          # x (residual)
            pl.BlockSpec((1, K), lambda j: (0, 0)),           # norm weight
            pl.BlockSpec((K, block_i), lambda j: (0, j)),     # W_gate block
            pl.BlockSpec((K, block_i),                        # W_up block
                         lambda j, n_i=n_i: (0, j + n_i)),
            pl.BlockSpec((1, block_i), lambda j: (0, j)),     # s_gate
            pl.BlockSpec((1, block_i),
                         lambda j, n_i=n_i: (0, j + n_i)),    # s_up
            pl.BlockSpec((block_i, D), lambda j: (j, 0)),     # W_down block
            pl.BlockSpec((1, D), lambda j: (0, 0)),           # s_down
        ],
        out_specs=pl.BlockSpec((Mp, D), lambda j: (0, 0)),
        scratch_shapes=[pltpu.VMEM((Mp, K), x2.dtype),
                        pltpu.VMEM((Mp, D), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, D), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, norm_w.reshape(1, K).astype(jnp.float32), wgu_q, wgu_q,
      wgu_s.reshape(1, I2).astype(jnp.float32),
      wgu_s.reshape(1, I2).astype(jnp.float32), wd_q,
      wd_s.reshape(1, D).astype(jnp.float32))
    return out[:M]


def _quant_rows_f32(x):
    """Per-row symmetric int8 quantization (f32 in-kernel)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def _mlp_w8a8_kernel(x_ref, nw_ref, wg_ref, wu_ref, sg_ref, su_ref, wd_ref,
                     sd_ref, o_ref, xq_ref, xs_ref, acc_ref, *, eps):
    """W8A8 variant: the normalized activation row quantizes to int8 ONCE
    (j == 0), every dot runs s8 x s8 -> s32 on the MXU (2x the bf16 rate on
    v5e) and — decisively for decode — the int8 weight blocks feed the MXU
    DIRECTLY, skipping the VPU int8->bf16 weight convert that serializes
    against the MXU in the weight-only kernel (measured: the convert costs
    more than the whole DMA stream)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        xf = x_ref[:].astype(jnp.float32)
        var = jnp.sum(xf * xf, axis=-1, keepdims=True) / xf.shape[-1]
        xn = xf * jax.lax.rsqrt(var + eps) * nw_ref[:].astype(jnp.float32)
        q, s = _quant_rows_f32(xn)
        xq_ref[:] = q
        xs_ref[:] = jnp.broadcast_to(s, xs_ref.shape)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = xq_ref[:]
    xs = xs_ref[:, :1]
    g = jax.lax.dot_general(xq, wg_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    u = jax.lax.dot_general(xq, wu_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    g = g.astype(jnp.float32) * (xs * sg_ref[:])
    u = u.astype(jnp.float32) * (xs * su_ref[:])
    h = g * jax.nn.sigmoid(g) * u
    hq, hs = _quant_rows_f32(h)
    acc = jax.lax.dot_general(hq, wd_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    acc_ref[:] += acc.astype(jnp.float32) * hs

    @pl.when(j == pl.num_programs(0) - 1)
    def _done():
        o_ref[:] = (acc_ref[:] * sd_ref[:]
                    + x_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_i", "interpret"))
def _fused_mlp_pallas_w8a8(x2, norm_w, wgu_q, wgu_s, wd_q, wd_s, eps,
                           block_i=1024, interpret=False):
    M, K = x2.shape
    I2 = wgu_q.shape[1]
    I = I2 // 2
    D = wd_q.shape[1]
    Mp = _round_up(M, 8)
    block_i = min(block_i, I)
    n_i = I // block_i

    xp = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_mlp_w8a8_kernel, eps=eps),
        grid=(n_i,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda j: (0, 0)),
            pl.BlockSpec((1, K), lambda j: (0, 0)),
            pl.BlockSpec((K, block_i), lambda j: (0, j)),
            pl.BlockSpec((K, block_i),
                         lambda j, n_i=n_i: (0, j + n_i)),
            pl.BlockSpec((1, block_i), lambda j: (0, j)),
            pl.BlockSpec((1, block_i),
                         lambda j, n_i=n_i: (0, j + n_i)),
            pl.BlockSpec((block_i, D), lambda j: (j, 0)),
            pl.BlockSpec((1, D), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Mp, D), lambda j: (0, 0)),
        scratch_shapes=[pltpu.VMEM((Mp, K), jnp.int8),
                        pltpu.VMEM((Mp, 128), jnp.float32),
                        pltpu.VMEM((Mp, D), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, D), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, norm_w.reshape(1, K).astype(jnp.float32), wgu_q, wgu_q,
      wgu_s.reshape(1, I2).astype(jnp.float32),
      wgu_s.reshape(1, I2).astype(jnp.float32), wd_q,
      wd_s.reshape(1, D).astype(jnp.float32))
    return out[:M]


def _fused_mlp_ref(x2, norm_w, wgu_q, wgu_s, wd_q, wd_s, eps):
    """XLA composition with identical semantics (the pre-fusion decode
    path): rmsnorm -> dequant gate_up -> silu*up -> dequant down -> +res."""
    xf = x2.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    h = (xf * jax.lax.rsqrt(var + eps)
         * norm_w.astype(jnp.float32)).astype(x2.dtype)
    gu = jnp.dot(h, wgu_q.astype(x2.dtype),
                 preferred_element_type=jnp.float32)
    gu = (gu * wgu_s.astype(jnp.float32)).astype(x2.dtype)
    gate, up = jnp.split(gu, 2, axis=-1)
    m = (jax.nn.silu(gate.astype(jnp.float32))
         * up.astype(jnp.float32)).astype(x2.dtype)
    y = jnp.dot(m, wd_q.astype(x2.dtype), preferred_element_type=jnp.float32)
    return x2 + (y * wd_s.astype(jnp.float32)).astype(x2.dtype)


def fused_decode_mlp_int8(x, norm_w, wgu_q, wgu_s, wd_q, wd_s,
                          eps: float = 1e-5):
    """x: [..., D]; wgu_q: [D, 2I] int8 (+ scale [2I]); wd_q: [I, D] int8
    (+ scale [D]) -> x + down(silu(gate) * up) over rmsnorm(x).

    One Pallas program streaming all ~75 MB of int8 MLP weights per layer;
    used on the decode path (few rows). Falls back to the XLA composition
    off-TPU or at unsupported shapes."""
    lead, K = x.shape[:-1], x.shape[-1]
    x2 = x.reshape(-1, K)
    I = wgu_q.shape[1] // 2
    ok = (x2.shape[0] <= 8 and K % 128 == 0 and I % 128 == 0
          and wd_q.shape[1] % 128 == 0)
    if jax.default_backend() == "tpu" and ok:
        y = _fused_mlp_pallas(x2, norm_w, wgu_q, wgu_s, wd_q, wd_s,
                              float(eps))
    else:
        y = _fused_mlp_ref(x2, norm_w, wgu_q, wgu_s, wd_q, wd_s, float(eps))
    return y.reshape(lead + (wd_q.shape[1],))


# --------------------------------------------------------- norm + matmul ---

def _nm_kernel(x_ref, nw_ref, w_ref, s_ref, o_ref, xn_ref, *, eps):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        xn_ref[:] = _rmsnorm_block(x_ref, nw_ref, eps, xn_ref.dtype)

    xn = xn_ref[:]
    y = jax.lax.dot_general(xn, w_ref[:].astype(xn.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = (y * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_n", "interpret"))
def _norm_matmul_pallas(x2, norm_w, w_q, s, eps, block_n=1024,
                        interpret=False):
    M, K = x2.shape
    N = w_q.shape[1]
    Mp = _round_up(M, 8)
    block_n = min(block_n, N)
    n_n = N // block_n

    xp = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_nm_kernel, eps=eps),
        grid=(n_n,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda j: (0, 0)),
            pl.BlockSpec((1, K), lambda j: (0, 0)),
            pl.BlockSpec((K, block_n), lambda j: (0, j)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((Mp, block_n), lambda j: (0, j)),
        scratch_shapes=[pltpu.VMEM((Mp, K), x2.dtype)],
        out_shape=jax.ShapeDtypeStruct((Mp, N), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, norm_w.reshape(1, K).astype(jnp.float32), w_q,
      s.reshape(1, N).astype(jnp.float32))
    return out[:M]


def _norm_matmul_ref(x2, norm_w, w_q, s, eps):
    xf = x2.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    h = (xf * jax.lax.rsqrt(var + eps)
         * norm_w.astype(jnp.float32)).astype(x2.dtype)
    y = jnp.dot(h, w_q.astype(x2.dtype), preferred_element_type=jnp.float32)
    return (y * s.astype(jnp.float32)).astype(x2.dtype)


def fused_norm_matmul_int8(x, norm_w, w_q, s, eps: float = 1e-5):
    """rmsnorm(x) @ dequant(w_q, s) in one Pallas program (decode qkv
    projection). x: [..., K]; w_q: [K, N] int8; s: [N]."""
    lead, K = x.shape[:-1], x.shape[-1]
    x2 = x.reshape(-1, K)
    N = w_q.shape[1]
    ok = x2.shape[0] <= 8 and K % 128 == 0 and N % 128 == 0
    if jax.default_backend() == "tpu" and ok:
        y = _norm_matmul_pallas(x2, norm_w, w_q, s, float(eps))
    else:
        y = _norm_matmul_ref(x2, norm_w, w_q, s, float(eps))
    return y.reshape(lead + (N,))


# ------------------------------------------------------ matmul + residual ---

def _mr_kernel(x_ref, w_ref, s_ref, r_ref, o_ref):
    x = x_ref[:]
    y = jax.lax.dot_general(x, w_ref[:].astype(x.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = (y * s_ref[:]
                + r_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _matmul_residual_pallas(x2, w_q, s, res, block_n=1024, interpret=False):
    M, K = x2.shape
    N = w_q.shape[1]
    Mp = _round_up(M, 8)
    block_n = min(block_n, N)
    xp = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    rp = jnp.pad(res, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        _mr_kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda j: (0, 0)),
            pl.BlockSpec((K, block_n), lambda j: (0, j)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
            pl.BlockSpec((Mp, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((Mp, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, w_q, s.reshape(1, N).astype(jnp.float32), rp)
    return out[:M]


def matmul_residual_int8(x, w_q, s, res):
    """res + x @ dequant(w_q, s) in one program (decode o_proj). The whole
    [K, N] weight (9 MB int8 at flagship) sits in VMEM for the single grid
    step."""
    lead, K = x.shape[:-1], x.shape[-1]
    N = w_q.shape[1]
    x2 = x.reshape(-1, K)
    r2 = res.reshape(-1, N)
    ok = x2.shape[0] <= 8 and K % 128 == 0 and N % 128 == 0
    if jax.default_backend() == "tpu" and ok:
        y = _matmul_residual_pallas(x2, w_q, s, r2,
                                    block_n=1024 if N % 1024 == 0 else N)
    else:
        y = jnp.dot(x2, w_q.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        y = r2 + (y * s.astype(jnp.float32)).astype(x.dtype)
    return y.reshape(lead + (N,))
