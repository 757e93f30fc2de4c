"""Flagship-scale LoRA train-step timing on the local chip.

Reference training config (train_ds_with_videogptplus.py:83-97): micro-bs 2,
grad-accum 10, NUM_FRAMES=16 encoder frames, num_frames_for_sam SAM frames.
This measures ONE micro-step (forward+backward+update) with remat, bf16
activations, frozen towers.

Usage: python scripts/profile_train_step.py [--t_sam 2] [--res 1024]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t_sam", type=int, default=2)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--rows", type=int, default=2)
    args = ap.parse_args()

    from videoglamm_tpu.config import TrainConfig, VideoGLaMMConfig
    from videoglamm_tpu.constants import (IGNORE_INDEX, IMAGE_TOKEN_INDEX,
                                          MASK_IGNORE_INDEX)
    from videoglamm_tpu.models import VideoGLaMM
    from videoglamm_tpu.training import (create_train_state, make_optimizer,
                                         make_train_step)

    cfg = VideoGLaMMConfig.flagship()
    model = VideoGLaMM(cfg, dtype=jnp.bfloat16, lora_rank=8, remat_llm=True)
    T, R, S, T_sam = cfg.num_frames, args.rows, args.seq, args.t_sam
    seg_id = cfg.seg_token_idx

    rng = np.random.RandomState(0)
    ids = rng.randint(1, 30000, size=(R, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    ids[:, 40] = seg_id
    labels = ids.copy()
    batch = dict(
        frames=jnp.zeros((1, T, 224, 224, 3), jnp.bfloat16),
        context_images=jnp.zeros((1, T, 336, 336, 3), jnp.bfloat16),
        frames_sam=jnp.zeros((1, T_sam, args.res, args.res, 3), jnp.bfloat16),
        input_ids=jnp.asarray(ids),
        text_lens=jnp.full((R,), S, jnp.int32),
        labels=jnp.asarray(labels),
        video_idx=jnp.zeros((R,), jnp.int32),
        gt_masks=jnp.asarray(
            np.where(rng.rand(R, cfg.max_seg_tokens, T_sam, 64, 64) > .5,
                     1.0, MASK_IGNORE_INDEX).astype(np.float32)),
    )

    tcfg = TrainConfig(lr=3e-4, warmup_steps=100, total_steps=1000)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                               **batch))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype if not jnp.issubdtype(
            s.dtype, jnp.floating) else jnp.bfloat16), shapes)["params"]
    nb = sum(x.nbytes for x in jax.tree_util.tree_leaves(params))
    print(f"params: {nb/1e9:.2f} GB bf16")
    tx = make_optimizer(tcfg, params)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    state, metrics = step(state, batch)
    print("loss:", float(metrics["loss"]))
    t0 = time.time()
    N = 4
    for _ in range(N):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = (time.time() - t0) / N
    print(f"micro-step ({R} rows, {T}f enc, {T_sam}f sam @ {args.res}^2, "
          f"seq {S}): {dt*1000:.0f} ms "
          f"({R/dt:.2f} rows/s/chip)")


if __name__ == "__main__":
    main()
