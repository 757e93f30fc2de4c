"""xprof per-op attribution of the full SAM-2 image encoder (Hiera + FPN)
at the bench shape (8 frames, 1024^2). Raw op listing; wall numbers are
for the whole 8-frame batch.

Usage: python scripts/trace_sam_encoder.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from videoglamm_tpu.config import SAM2Config
from videoglamm_tpu.models.sam2.fpn import SAM2ImageEncoder
from xprof_summary import trace_and_summarize


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = SAM2Config.sam2_hiera_l()
    imgs = jnp.zeros((B, 1024, 1024, 3), jnp.bfloat16)
    enc = SAM2ImageEncoder(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), imgs))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if jnp.issubdtype(s.dtype, jnp.floating)
                            else s.dtype), shapes)
    full = jax.jit(lambda p, x: enc.apply(p, x)[0][-1])

    def go():
        float(full(params, imgs).astype(jnp.float32).sum())

    go()
    t0 = time.time()
    for _ in range(4):
        go()
    print(f"wall: {(time.time()-t0)/4*1000:.1f} ms / {B} frames")
    trace_and_summarize(go, top=45, group=False)


if __name__ == "__main__":
    main()
