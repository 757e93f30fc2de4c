"""Isolated A/B of the decode-layer MLP implementations at flagship scale.

Times a 32-layer scan of JUST the MLP half (norm -> gate_up -> glu -> down
-> residual) with stacked real-size int8 weights, for each variant:

  xla     op-by-op XLA composition (the unfused decode path)
  fused   Pallas fused kernel, int8 -> bf16 convert + bf16 dots
  w8a8    Pallas fused kernel, per-row activation quant + s8 x s8 dots

Usage: python scripts/bench_decode_fused.py [variants ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import decode_mlp_experiment as dm

L = 32
K, I, D = 3072, 8192, 3072
B = 1


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
    variants = sys.argv[1:] or ["xla", "fused", "w8a8"]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, K) * 0.1, jnp.bfloat16)
    nw = jnp.ones((L, K), jnp.float32)
    wgu = jnp.zeros((L, K, 2 * I), jnp.int8)
    sgu = jnp.full((L, 2 * I), 1e-3, jnp.float32)
    wd = jnp.zeros((L, I, D), jnp.int8)
    sd = jnp.full((L, D), 1e-3, jnp.float32)

    def run(step):
        @jax.jit
        def f(x, nw, wgu, sgu, wd, sd):
            def body(c, w):
                return step(c, *w), None
            y, _ = jax.lax.scan(body, x, (nw, wgu, sgu, wd, sd))
            return y
        return f

    def xla_step(x, nw, wgu, sgu, wd, sd):
        return dm._fused_mlp_ref(x, nw, wgu, sgu, wd, sd, 1e-5)

    def fused_step(x, nw, wgu, sgu, wd, sd):
        return dm._fused_mlp_pallas(x, nw, wgu, sgu, wd, sd, 1e-5)

    def w8a8_step(x, nw, wgu, sgu, wd, sd):
        return dm._fused_mlp_pallas_w8a8(x, nw, wgu, sgu, wd, sd, 1e-5)

    steps = {"xla": xla_step, "fused": fused_step, "w8a8": w8a8_step}
    gb = (wgu.nbytes + wd.nbytes) / L / 1e9
    for name in variants:
        if name == "w8a8" and not hasattr(dm, "_fused_mlp_pallas_w8a8"):
            continue
        ms = timeit(run(steps[name]), x, nw, wgu, sgu, wd, sd) / L
        print(f"{name:6s}: {ms*1000:7.1f} us/layer  "
              f"({gb*1000:.0f} MB, {gb/(ms/1e3):.0f} GB/s)")


if __name__ == "__main__":
    main()
