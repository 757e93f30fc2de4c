"""Measure: can a BSHD-spec flash kernel (blocks strided over the head dim)
beat transpose+pad+contiguous-flash at LLM prefill scale?

The prefill trace shows ~0.4 ms/layer of [B,S,H,hd] -> [B,H,S,hd] copies +
explicit 96->128 pads feeding _flash_fwd. A flash variant whose BlockSpecs
index the head dim of the BSHD tensor directly skips both — at the price of
strided DMA (192-byte rows). This sweep tells us whether the DMA pays.

Usage: python scripts/bench_flash_bshd.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videoglamm_tpu.ops.attention import (_flash_kernel, _pick_block,
                                          _round_up, flash_attention)


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale",
                                             "block_q", "block_k"))
def flash_bshd(q, k, v, kv_lens, q_start, *, causal, sm_scale,
               block_q=None, block_k=None):
    """q: [B, Sq, H, D]; k/v: [B, Sk, H, D] (BSHD, straight from the
    projections / token-major cache). Returns [B, Sq, H, D]."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    block_q = _pick_block(Sq) if block_q is None else block_q
    block_k = _pick_block(Sk) if block_k is None else block_k
    Sqp = _round_up(Sq, block_q)
    Skp = _round_up(Sk, block_k)
    qp = jnp.pad(q, ((0, 0), (0, Sqp - Sq), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Skp - Sk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Skp - Sk), (0, 0), (0, 0)))

    scalars = jnp.stack([
        jnp.repeat(kv_lens.astype(jnp.int32), H),
        jnp.repeat(q_start.astype(jnp.int32), H),
    ], axis=1)

    grid = (B * H, Sqp // block_q, Skp // block_k)
    inner = functools.partial(
        _flash_kernel, causal=causal, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, sq=Sq)

    def kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
               acc_ref, m_ref, l_ref):
        # adapt 4D BSHD blocks ([1, blk, 1, D]) to the 3D kernel via sub-ref
        # views — no data movement
        inner(kvlen_ref, q_ref.at[:, :, 0, :], k_ref.at[:, :, 0, :],
              v_ref.at[:, :, 0, :], o_ref.at[:, :, 0, :], lse_ref,
              acc_ref, m_ref, l_ref)

    out, _ = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, 1, D),
                             lambda bh, i, j, kvl: (bh // H, i, bh % H, 0)),
                pl.BlockSpec((1, block_k, 1, D),
                             lambda bh, i, j, kvl: (bh // H, j, bh % H, 0)),
                pl.BlockSpec((1, block_k, 1, D),
                             lambda bh, i, j, kvl: (bh // H, j, bh % H, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, 1, D),
                             lambda bh, i, j, kvl: (bh // H, i, bh % H, 0)),
                pl.BlockSpec((1, block_q, 128),
                             lambda bh, i, j, kvl: (bh, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, D), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Sqp, H, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Sqp, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(scalars, qp, kp, vp)
    return out[:, :Sq]


def sync(x):
    float(jnp.asarray(x).astype(jnp.float32).sum())


def timeit(fn, *args, n=8):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n * 1000


def main():
    B, H, Sq, Sk, D = 1, 32, 3456, 3520, 96
    L = 8  # chained layers per jit
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Sq, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, Sk, H, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, Sk, H, D), jnp.bfloat16)
    kv_lens = jnp.full((B,), Sq, jnp.int32)
    q_start = jnp.zeros((B,), jnp.int32)
    sm = D ** -0.5

    @jax.jit
    def chained_today(q, k, v):
        def body(c, _):
            qt = (c.reshape(B, Sq, H, D).transpose(0, 2, 1, 3))
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            o = flash_attention(qt, kt, vt, causal=True, sm_scale=sm,
                                kv_lens=kv_lens, q_start=q_start)
            return o.transpose(0, 2, 1, 3).reshape(B, Sq, H * D)[
                :, :, :].reshape(B, Sq, H, D), None
        o, _ = jax.lax.scan(body, q, None, length=L)
        return o

    @jax.jit
    def chained_bshd(q, k, v):
        def body(c, _):
            o = flash_bshd(c, k, v, kv_lens, q_start, causal=True,
                           sm_scale=sm)
            return o, None
        o, _ = jax.lax.scan(body, q, None, length=L)
        return o

    t1 = timeit(chained_today, q, k, v) / L
    t2 = timeit(chained_bshd, q, k, v) / L
    print(f"transpose+pad+flash[BH,S,128]: {t1:.3f} ms/layer")
    print(f"BSHD-spec flash (strided DMA): {t2:.3f} ms/layer")

    # numerical check vs the current path
    o1 = flash_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                         v.transpose(0, 2, 1, 3), causal=True, sm_scale=sm,
                         kv_lens=kv_lens, q_start=q_start).transpose(0, 2, 1, 3)
    o2 = flash_bshd(q, k, v, kv_lens, q_start, causal=True, sm_scale=sm)
    import numpy as np
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) -
                                o2.astype(jnp.float32))))
    print(f"max |diff| vs current path: {err:.2e}")


if __name__ == "__main__":
    main()
