"""xprof per-op attribution for one Hiera stage geometry: 16 chained full
blocks under one jit, raw op listing (divide ms by 16 for per-block).

Usage: python scripts/trace_hiera_block.py [stage1|stage2|stage3|stage4]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench_hiera_stages import GEOMS, Patched, N_CHAIN
from xprof_summary import trace_and_summarize


def main():
    want = sys.argv[1] if len(sys.argv) > 1 else "stage3"
    name, hw, dim, heads, ws = next(g for g in GEOMS if want in g[0])
    print(name)
    x = jnp.asarray(np.random.RandomState(0).randn(1, hw, hw, dim),
                    jnp.bfloat16)
    blk = Patched(dim=dim, heads=heads, ws=ws, variant="full")
    p1 = blk.init(jax.random.PRNGKey(0), x)["params"]
    ps = jax.tree_util.tree_map(
        lambda a: jnp.stack([jnp.asarray(a, jnp.bfloat16)] * N_CHAIN), p1)

    @jax.jit
    def run(ps, x):
        def body(carry, p):
            return blk.apply({"params": p}, carry), None
        y, _ = jax.lax.scan(body, x, ps)
        return y

    def go():
        float(run(ps, x).astype(jnp.float32).sum())

    go()
    trace_and_summarize(go, top=30, group=False)
    print(f"\n(divide by {N_CHAIN} for per-block)")


if __name__ == "__main__":
    main()
