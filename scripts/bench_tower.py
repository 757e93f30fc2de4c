"""Honest tower wall-times on the axon tunnel.

Single-dispatch walls are contaminated by a VARIABLE tunnel roundtrip
(measured anywhere from 2 to 30 ms in one session), and xprof per-op
durations inside a model include operand-wait stalls, so neither is a
reliable A/B arbiter on its own. This harness chains N full tower forwards
inside ONE jit, serialized by folding a scalar from each output into the
next input (defeats CSE and any cross-iteration overlap), so the wall is
N x tower >> roundtrip.

Usage: python scripts/bench_tower.py [clip|iv2|sam|all] [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def sync(z):
    float(jnp.asarray(jax.tree_util.tree_leaves(z)[0]).astype(
        jnp.float32).sum())


def zeros_like_tree(shapes):
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if jnp.issubdtype(s.dtype, jnp.floating)
                            else s.dtype), shapes)


def chain(apply_fn, params, x, n):
    """Run apply_fn n times, each dependent on the last output's sum."""
    @jax.jit
    def run(params, x):
        def body(c, _):
            out = apply_fn(params, x + c)
            # depend on EVERY output leaf: summing only one lets XLA
            # dead-code-eliminate whole subgraphs (SAM's FPN level 0 depends
            # on just the first 2 Hiera blocks — a leaf[0]-only dependency
            # measured a "22 ms" encoder that was 4% of the real network).
            # And keep a REAL data dependency between iterations (a `* 0`
            # lets XLA hoist the loop-invariant tower call); 1e-30 keeps
            # the input numerically unchanged without being foldable.
            s = sum(leaf.astype(jnp.float32).sum()
                    for leaf in jax.tree_util.tree_leaves(out)) * 1e-30
            return s.astype(x.dtype), None
        c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=n)
        return c
    sync(run(params, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        sync(run(params, x))
        best = min(best, time.time() - t0)
    return best / n * 1000


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    if what in ("clip", "all"):
        from videoglamm_tpu.config import CLIPVisionConfig
        from videoglamm_tpu.models.clip_vit import CLIPVisionTower
        cfg = CLIPVisionConfig.vit_l_336()
        imgs = jnp.zeros((16, 336, 336, 3), jnp.bfloat16)
        tower = CLIPVisionTower(cfg, dtype=jnp.bfloat16)
        params = zeros_like_tree(jax.eval_shape(
            lambda: tower.init(jax.random.PRNGKey(0), imgs)))
        ms = chain(lambda p, x: tower.apply(p, x), params, imgs, n)
        print(f"CLIP ViT-L/336 x16 frames: {ms:.2f} ms")

    if what in ("iv2", "all"):
        from videoglamm_tpu.config import InternVideo2Config
        from videoglamm_tpu.models.internvideo2 import InternVideo2Tower
        cfg = InternVideo2Config.internvideo2_1b()
        frames = jnp.zeros((4, 4, 224, 224, 3), jnp.bfloat16)
        tower = InternVideo2Tower(cfg, dtype=jnp.bfloat16)
        params = zeros_like_tree(jax.eval_shape(
            lambda: tower.init(jax.random.PRNGKey(0), frames)))
        ms = chain(lambda p, x: tower.apply(p, x), params, frames, n)
        print(f"InternVideo2 4x4 chunks: {ms:.2f} ms")

    if what in ("sam", "all"):
        from videoglamm_tpu.config import SAM2Config
        from videoglamm_tpu.models.sam2.fpn import SAM2ImageEncoder
        cfg = SAM2Config.sam2_hiera_l()
        imgs = jnp.zeros((8, 1024, 1024, 3), jnp.bfloat16)
        enc = SAM2ImageEncoder(cfg, dtype=jnp.bfloat16)
        params = zeros_like_tree(jax.eval_shape(
            lambda: enc.init(jax.random.PRNGKey(0), imgs)))
        ms = chain(lambda p, x: enc.apply(p, x)[0], params, imgs,
                   max(2, n // 2))
        print(f"SAM-2 encoder 8 frames: {ms:.2f} ms ({ms/8:.2f} ms/frame)")


if __name__ == "__main__":
    main()
