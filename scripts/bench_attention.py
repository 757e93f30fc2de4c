"""Honest flash-vs-XLA attention timing at the framework's real shapes.

Chains N calls under one jit (lax.scan) so per-dispatch tunnel overhead
doesn't pollute the numbers (single-dispatch timing includes ~80 ms of axon
roundtrip).

Usage: python scripts/bench_attention.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from videoglamm_tpu.ops.attention import (_attention_xla, _window_attention,
                                          flash_attention)


def timeit(fn, *args, n=4):
    out = fn(*args)
    float(out.astype(jnp.float32).sum())
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(out.astype(jnp.float32).sum())
    return (time.time() - t0) / n * 1000


SHAPES = [
    # name, B, H, Sq, Sk, D, causal
    ("IV2 block (4 chunks)", 4, 16, 1025, 1025, 88, False),
    ("CLIP block (16 frames)", 16, 16, 577, 577, 64, False),
    ("Hiera stage3 window (16w x 8h)", 16, 8, 256, 256, 72, False),
    ("Hiera global 4096", 1, 8, 4096, 4096, 72, False),
    ("Hiera stage4 window", 4, 16, 256, 256, 72, False),
    ("LLM prefill 3456", 1, 32, 3456, 3456, 96, True),
    ("SAM decoder xattn", 8, 8, 8, 4096, 32, False),
]

REPS = 10


def main():
    for name, B, H, Sq, Sk, D, causal in SHAPES:
        q = jnp.zeros((B, H, Sq, D), jnp.bfloat16)
        k = jnp.zeros((B, H, Sk, D), jnp.bfloat16)
        v = jnp.zeros((B, H, Sk, D), jnp.bfloat16)
        lens = jnp.full((B,), Sk, jnp.int32)
        q0 = jnp.zeros((B,), jnp.int32)

        def chained(impl):
            @jax.jit
            def run(q, k, v):
                def body(c, _):
                    o = impl(q + c, k, v)
                    return o.astype(jnp.float32).mean(), o.sum()
                c, ys = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
                return ys.sum()
            return run

        xla = chained(lambda q, k, v: _attention_xla(
            q, k, v, causal=causal, sm_scale=D ** -0.5, kv_lens=lens,
            bias=None, q_start=q0))
        fl = chained(lambda q, k, v: flash_attention(
            q, k, v, causal=causal, kv_lens=lens, q_start=q0))

        t_x = timeit(xla, q, k, v) / REPS
        t_f = timeit(fl, q, k, v) / REPS
        extra = ""
        if not causal and Sq == Sk and Sq <= 1536:
            win = chained(lambda q, k, v: _window_attention(
                q, k, v, D ** -0.5))
            t_w = timeit(win, q, k, v) / REPS
            extra = f"   window {t_w:7.3f} ms ({t_x/t_w:4.2f}x)"
        print(f"{name:<34} xla {t_x:7.3f} ms   flash {t_f:7.3f} ms   "
              f"({t_x/t_f:4.2f}x){extra}")


if __name__ == "__main__":
    main()
