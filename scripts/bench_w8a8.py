"""Does the v5e int8 MXU path (s8 x s8 -> s32, 394 TOPS vs 197 bf16)
actually pay for prefill-scale matmuls through XLA?

Compares, at the four Phi-3 projection shapes (S=3456):
  a) bf16 x bf16 (the dequant-int8 path's matmul, scales folded post-hoc)
  b) s8 x s8 -> s32 with per-row activation scales (W8A8, incl. the
     activation quantize pass)
  c) b) without the quantize pass (pre-quantized activations; isolates
     the matmul itself)

Usage: python scripts/bench_w8a8.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


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


def quantize_rows(x):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127
                 ).astype(jnp.int8)
    return q, scale


def main():
    S = 3456
    L = 8
    shapes = {
        "qkv  [3072->9216]": (3072, 9216),
        "o    [3072->3072]": (3072, 3072),
        "gate_up [3072->16384]": (3072, 16384),
        "down [8192->3072]": (8192, 3072),
    }
    key = jax.random.PRNGKey(0)
    for name, (kdim, n) in shapes.items():
        x = jax.random.normal(key, (S, kdim), jnp.bfloat16)
        w8 = jax.random.randint(key, (kdim, n), -127, 127, jnp.int8)
        wscale = jnp.ones((n,), jnp.float32)
        wb = w8.astype(jnp.bfloat16)

        # each body perturbs the activation with a scalar derived from the
        # previous product — defeats XLA loop-invariant hoisting (a pure
        # invariant body measured >peak "throughput")
        @jax.jit
        def bf16_mm(x, w):
            def body(c, _):
                y = jnp.dot(x * (1 + c), w,
                            preferred_element_type=jnp.float32)
                ysum = y.sum()
                return (ysum * 1e-30).astype(jnp.bfloat16), ysum
            _, ys = jax.lax.scan(body, jnp.bfloat16(0), None, length=L)
            return ys.sum()

        @jax.jit
        def w8a8_mm(x, w, ws):
            def body(c, _):
                q, s = quantize_rows(x * (1 + c))
                acc = jax.lax.dot_general(q, w, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                y = (acc.astype(jnp.float32) * s * ws[None]
                     ).astype(jnp.bfloat16)
                ysum = y.sum()
                return (ysum * 1e-30).astype(jnp.bfloat16), ysum
            _, ys = jax.lax.scan(body, jnp.bfloat16(0), None, length=L)
            return ys.sum()

        @jax.jit
        def w8a8_mm_preq(q, s, w, ws):
            def body(c, _):
                acc = jax.lax.dot_general(
                    q + c, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = (acc.astype(jnp.float32) * s * ws[None]
                     ).astype(jnp.bfloat16)
                ysum = y.sum()
                return (ysum * 0).astype(jnp.int8), ysum
            _, ys = jax.lax.scan(body, jnp.int8(0), None, length=L)
            return ys.sum()

        gf = 2 * S * kdim * n / 1e9
        t_a = timeit(bf16_mm, x, wb) / L
        t_b = timeit(w8a8_mm, x, w8, wscale) / L
        q, s = quantize_rows(x)
        t_c = timeit(w8a8_mm_preq, q, s, w8, wscale) / L
        print(f"{name}: bf16 {t_a:.3f} ms ({gf/t_a:.0f} GF/s) | "
              f"w8a8 {t_b:.3f} ({gf/t_b:.0f}) | "
              f"w8a8-preq {t_c:.3f} ({gf/t_c:.0f})")


if __name__ == "__main__":
    main()
