"""Fused Hiera windowed transformer block (Pallas TPU).

One kernel runs a full MultiScaleBlock for windowed, non-pooling blocks:
LN1 -> fused qkv -> per-window attention -> out proj -> residual -> LN2 ->
MLP (gelu) -> residual, reading the window-partitioned activation from HBM
exactly once and writing it back once. All six weight matrices ride
constant-index BlockSpecs, so Mosaic fetches them into VMEM once and keeps
them resident across every grid step — the XLA path re-streams the
activation ~10x per block through unfused LN/reshape/bias/residual stages,
which is why Hiera stage 1 measured ~10x its bandwidth floor
(scripts/bench_hiera_stages, B=8: 13.6/6.4/3.7 ms per stage-1/2/3 block vs
a ~1.4 ms compute floor).

Window handling matches ops/attention.py's tiny-window kernel: programs
pack F = tile//S windows into full MXU tiles with a block-diagonal mask
(S in {16, 64}); 256-token windows (Hiera stage 3) run one window per
program with no mask. Heads live at their natural unpadded lane offsets.

Behavioral contract: bit-matches `_fused_block_ref` below, which is the
same arithmetic as the unfused model path (models/sam2/hiera.py
MultiScaleBlock; reference semantics /root/reference/VideoGLaMM/model/
segment_anything_2/sam2/modeling/backbones/hieradet.py:105-172). The
backward differentiates through the jnp reference (towers are frozen in
every reference training stage; this keeps the op trainable anyway).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _erf_as(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7, i.e.
    f32-noise level for GELU). Pallas TPU lowering implements neither erf
    nor erfc (found driving the tiny tracker on hardware; the CPU interpret
    path accepted them), so the erf-exact GELU inside this kernel is spelled
    with exp + polynomials, identically on every platform."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    """torch-parity gelu: erf form in f32 (via _erf_as), tanh approximation
    in bf16 (see models/common.py gelu_exact for the error analysis)."""
    if x.dtype in (jnp.float32, jnp.float64):
        return 0.5 * x * (1.0 + _erf_as(x * (2.0 ** -0.5)))
    return jax.nn.gelu(x, approximate=True)


def _layer_norm_f32(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _fused_block_ref(x, p, num_heads: int, eps: float = 1e-6):
    """jnp reference: x [NW, S, C] window tokens -> [NW, S, C].

    Matches the unfused MultiScaleBlock path op-for-op (LayerNorm f32
    stats, bf16 dots with f32 accumulation, f32 softmax, gelu per dtype).
    """
    NW, S, C = x.shape
    H = num_heads
    hd = C // H
    dt = x.dtype

    h = _layer_norm_f32(x, p["ln1_scale"], p["ln1_bias"], eps)
    qkv = jnp.einsum("nsc,cd->nsd", h, p["wqkv"].astype(dt),
                     preferred_element_type=jnp.float32)
    qkv = qkv.astype(dt) + p["bqkv"].astype(dt)
    qkv = qkv.reshape(NW, S, 3, H, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("nhqk,nkhd->nqhd", probs.astype(dt), v,
                   preferred_element_type=jnp.float32)
    o = o.astype(dt).reshape(NW, S, C)
    o = jnp.einsum("nsc,cd->nsd", o, p["wproj"].astype(dt),
                   preferred_element_type=jnp.float32)
    o = o.astype(dt) + p["bproj"].astype(dt)
    x1 = x + o

    h2 = _layer_norm_f32(x1, p["ln2_scale"], p["ln2_bias"], eps)
    mid = jnp.einsum("nsc,cm->nsm", h2, p["wup"].astype(dt),
                     preferred_element_type=jnp.float32)
    mid = _gelu(mid.astype(dt) + p["bup"].astype(dt))
    y = jnp.einsum("nsm,mc->nsc", mid, p["wdown"].astype(dt),
                   preferred_element_type=jnp.float32)
    return x1 + (y.astype(dt) + p["bdown"].astype(dt))


def _kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, ln2s_ref, ln2b_ref, wup_ref, bup_ref, wdown_ref,
            bdown_ref, o_ref, *, S: int, H: int, hd: int, F: int,
            eps: float, mlp_chunk: int):
    C = H * hd
    T = F * S
    sm_scale = hd ** -0.5
    x = x_ref[:].reshape(T, C)
    dt = x.dtype

    h = _layer_norm_f32(x, ln1s_ref[:], ln1b_ref[:], eps)
    qkv = jax.lax.dot_general(h, wqkv_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = qkv.astype(dt) + bqkv_ref[:].astype(dt)

    if F > 1:
        row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0) // S
        col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1) // S
        same_win = row == col
    outs = []
    for i in range(H):
        q = qkv[:, i * hd:(i + 1) * hd]
        k = qkv[:, C + i * hd:C + (i + 1) * hd]
        v = qkv[:, 2 * C + i * hd:2 * C + (i + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(same_win, s * sm_scale, NEG_INF) if F > 1 \
            else s * sm_scale
        m = jnp.max(s, axis=1, keepdims=True)
        pr = jnp.exp(s - m)
        l = jnp.sum(pr, axis=1, keepdims=True)
        ov = jax.lax.dot_general(pr.astype(dt), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        outs.append(ov / l)
    attn = (outs[0] if H == 1 else
            jnp.concatenate(outs, axis=1)).astype(dt)

    po = jax.lax.dot_general(attn, wproj_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    x1 = x + (po.astype(dt) + bproj_ref[:].astype(dt))

    h2 = _layer_norm_f32(x1, ln2s_ref[:], ln2b_ref[:], eps)
    M = wup_ref.shape[1]
    acc = None
    for c0 in range(0, M, mlp_chunk):
        c1 = min(c0 + mlp_chunk, M)
        mid = jax.lax.dot_general(h2, wup_ref[:, c0:c1],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        mid = _gelu(mid.astype(dt) + bup_ref[c0:c1].astype(dt))
        d = jax.lax.dot_general(mid, wdown_ref[c0:c1, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = x1 + (acc.astype(dt) + bdown_ref[:].astype(dt))
    o_ref[:] = y.reshape(F, S, C)


_PKEYS = ("ln1_scale", "ln1_bias", "wqkv", "bqkv", "wproj", "bproj",
          "ln2_scale", "ln2_bias", "wup", "bup", "wdown", "bdown")


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "eps", "interpret"))
def _fused_block_fwd(x, p, *, num_heads: int, eps: float,
                     interpret: bool = False):
    NW, S, C = x.shape
    H = num_heads
    hd = C // H
    M = p["wup"].shape[1]
    # measured tile sweep (v5e, B=8 Hiera-L geometries, ms/block):
    #   stage1 (S=64):  128/256/512/1024 = 9.68/7.14/6.57/7.67
    #   stage2 (S=16):  128/256/512/1024 = 4.16/3.69/3.67/4.21
    #   stage3 (S=256): 256/512 = 2.37/2.40
    # bigger tiles amortize per-program cost until the block-diagonal
    # mask waste on the attention dots (~ tile/S) catches up.
    tile = int(os.environ.get("VGT_FUSEDBLK_TILE",
                              "512" if S <= 64 else "256"))
    F = max(1, tile // S)
    while F > 1 and NW % F:
        F //= 2
    # single mlp column chunk: column-sliced wup/wdown refs currently fail
    # Mosaic compilation, and the unchunked f32 mid fits VMEM at every
    # supported geometry
    mlp_chunk = min(M, int(os.environ.get("VGT_FUSEDBLK_MLPCHUNK", "4608")))

    dt = x.dtype
    # weights ride in the model compute dtype; LN params stay f32
    args = [p[k] if k.startswith("ln") else p[k].astype(dt)
            for k in _PKEYS]

    def const_spec(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, (lambda i: (0,) * nd))

    out = pl.pallas_call(
        functools.partial(_kernel, S=S, H=H, hd=hd, F=F, eps=eps,
                          mlp_chunk=mlp_chunk),
        grid=(NW // F,),
        in_specs=[pl.BlockSpec((F, S, C), lambda i: (i, 0, 0))]
        + [const_spec(a) for a in args],
        out_specs=pl.BlockSpec((F, S, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NW, S, C), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *args)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_block_tpu(x, p, num_heads, eps):
    return _fused_block_fwd(x, p, num_heads=num_heads, eps=eps)


def _fused_block_fwd_rule(x, p, num_heads, eps):
    return _fused_block_fwd(x, p, num_heads=num_heads, eps=eps), (x, p)


def _fused_block_bwd_rule(num_heads, eps, res, g):
    x, p = res
    _, vjp = jax.vjp(
        lambda x_, p_: _fused_block_ref(x_, p_, num_heads, eps), x, p)
    return vjp(g)


_fused_block_tpu.defvjp(_fused_block_fwd_rule, _fused_block_bwd_rule)


def fused_window_block(x, p, num_heads: int, *, eps: float = 1e-6):
    """Full windowed transformer block over window tokens.

    x: [NW, S, C] (S = window tokens, 16/64/256 take the fused kernel);
    p: dict with ln1_{scale,bias}, wqkv [C,3C], bqkv, wproj [C,C], bproj,
    ln2_{scale,bias}, wup [C,M], bup, wdown [M,C], bdown. Heads are sliced
    at natural lane offsets (C = H*hd, hd <= 128). Returns [NW, S, C].
    """
    NW, S, C = x.shape
    hd = C // num_heads
    if (jax.default_backend() == "tpu" and S in (16, 64, 256)
            and hd <= 128 and C == num_heads * hd):
        return _fused_block_tpu(x, p, num_heads, float(eps))
    return _fused_block_ref(x, p, num_heads, float(eps))
