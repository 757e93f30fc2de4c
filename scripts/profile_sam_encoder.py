"""Stage-wise timing of the SAM-2 image encoder on the local chip.

Usage: python scripts/profile_sam_encoder.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from videoglamm_tpu.config import SAM2Config
from videoglamm_tpu.models.sam2.hiera import Hiera, MultiScaleBlock
from videoglamm_tpu.models.sam2.fpn import SAM2ImageEncoder


def timeit(fn, *args, n=4):
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(
        jnp.float32).sum())
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(
        jnp.float32).sum())
    return (time.time() - t0) / n * 1000


def main():
    cfg = SAM2Config.sam2_hiera_l()
    B = 1
    imgs = jnp.zeros((B, 1024, 1024, 3), jnp.bfloat16)

    enc = SAM2ImageEncoder(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), imgs))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if jnp.issubdtype(s.dtype, jnp.floating)
                            else s.dtype), shapes)
    full = jax.jit(lambda p, x: enc.apply(p, x)[0][-1])
    print(f"full encoder: {timeit(full, params, imgs):.1f} ms/frame")

    trunk = Hiera(cfg.hiera, dtype=jnp.bfloat16)
    tshapes = jax.eval_shape(lambda: trunk.init(jax.random.PRNGKey(0), imgs))
    tparams = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if jnp.issubdtype(s.dtype, jnp.floating)
                            else s.dtype), tshapes)
    print(f"trunk only: "
          f"{timeit(jax.jit(lambda p, x: trunk.apply(p, x)[-1]), tparams, imgs):.1f}"
          f" ms/frame")

    # individual stages: time N blocks at each stage's geometry
    stage_geom = [
        ("stage1 (2 blk, 256^2, d144, w8)", 2, 256, 144, 2, 8),
        ("stage2 (6 blk, 128^2, d288, w4)", 6, 128, 288, 4, 4),
        ("stage3 (36 blk, 64^2, d576, w16)", 36, 64, 576, 8, 16),
        ("stage3-global (1 blk, 64^2, d576)", 1, 64, 576, 8, 0),
        ("stage4 (4 blk, 32^2, d1152, w8)", 4, 32, 1152, 16, 8),
    ]
    for name, n_blocks, hw, dim, heads, ws in stage_geom:
        x = jnp.zeros((B, hw, hw, dim), jnp.bfloat16)
        blk = MultiScaleBlock(dim=dim, dim_out=dim, num_heads=heads,
                              mlp_ratio=4.0, window_size=ws,
                              dtype=jnp.bfloat16)
        bs = jax.eval_shape(lambda: blk.init(jax.random.PRNGKey(0), x))
        bp = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16
                                if jnp.issubdtype(s.dtype, jnp.floating)
                                else s.dtype), bs)

        @jax.jit
        def run(p, x):
            y = x
            for _ in range(n_blocks):
                y = blk.apply(p, y)
            return y

        print(f"{name}: {timeit(run, bp, x):.1f} ms")


if __name__ == "__main__":
    main()
