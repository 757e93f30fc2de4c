"""Per-op xprof attribution for the SAM-2 image encoder and the visual
(InternVideo2 + CLIP) encoders at flagship scale.

Usage: python scripts/profile_encoders_ops.py [sam|iv2|clip|all]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from xprof_summary import trace_and_summarize


def sync(x):
    float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).astype(
        jnp.float32).sum())


def zeros_like_tree(shapes):
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if jnp.issubdtype(s.dtype, jnp.floating)
                            else s.dtype), shapes)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"

    if what in ("sam", "all"):
        from videoglamm_tpu.config import SAM2Config
        from videoglamm_tpu.models.sam2.fpn import SAM2ImageEncoder
        cfg = SAM2Config.sam2_hiera_l()
        imgs = jnp.zeros((1, 1024, 1024, 3), jnp.bfloat16)
        enc = SAM2ImageEncoder(cfg, dtype=jnp.bfloat16)
        params = zeros_like_tree(jax.eval_shape(
            lambda: enc.init(jax.random.PRNGKey(0), imgs)))
        fn = jax.jit(lambda p, x: enc.apply(p, x)[0][-1])
        sync(fn(params, imgs))
        print("\n=== SAM-2 encoder, 1 frame 1024^2 ===")
        trace_and_summarize(lambda: sync(fn(params, imgs)))

    if what in ("iv2", "all"):
        from videoglamm_tpu.config import InternVideo2Config
        from videoglamm_tpu.models.internvideo2 import InternVideo2Tower
        cfg = InternVideo2Config.internvideo2_1b()
        frames = jnp.zeros((4, 4, 224, 224, 3), jnp.bfloat16)  # 4 chunks
        tower = InternVideo2Tower(cfg, dtype=jnp.bfloat16)
        params = zeros_like_tree(jax.eval_shape(
            lambda: tower.init(jax.random.PRNGKey(0), frames)))
        fn = jax.jit(lambda p, x: tower.apply(p, x))
        sync(fn(params, frames))
        print("\n=== InternVideo2, 4 chunks x 4 frames ===")
        trace_and_summarize(lambda: sync(fn(params, frames)))

    if what in ("clip", "all"):
        from videoglamm_tpu.config import CLIPVisionConfig
        from videoglamm_tpu.models.clip_vit import CLIPVisionTower
        cfg = CLIPVisionConfig.vit_l_336()
        imgs = jnp.zeros((16, 336, 336, 3), jnp.bfloat16)
        tower = CLIPVisionTower(cfg, dtype=jnp.bfloat16)
        params = zeros_like_tree(jax.eval_shape(
            lambda: tower.init(jax.random.PRNGKey(0), imgs)))
        fn = jax.jit(lambda p, x: tower.apply(p, x))
        sync(fn(params, imgs))
        print("\n=== CLIP ViT-L/336, 16 frames ===")
        trace_and_summarize(lambda: sync(fn(params, imgs)))


if __name__ == "__main__":
    main()
