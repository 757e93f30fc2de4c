"""Stage-wise timing of the full GCG clip at flagship scale (bench.py's
pipeline split into separately-jitted stages).

Usage: python scripts/profile_clip.py [--bf16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).astype(
        jnp.float32).sum())


def timeit(fn, *args, n=4):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()
    int8 = not args.bf16

    from videoglamm_tpu.config import VideoGLaMMConfig
    from videoglamm_tpu.constants import IMAGE_TOKEN_INDEX
    from videoglamm_tpu.inference.generate import generate_with_prefix
    from videoglamm_tpu.inference.pipeline import extract_seg_from_generation
    from videoglamm_tpu.models import VideoGLaMM

    NUM_FRAMES, T_SAM, S_TEXT, MAX_NEW = 16, 8, 64, 64

    import os
    kv8 = os.environ.get("BENCH_KV8", "1") == "1"
    cfg = VideoGLaMMConfig.flagship()
    model = VideoGLaMM(cfg, dtype=jnp.bfloat16, quant_llm_int8=int8,
                       quant_kv_int8=kv8)

    ids = np.full((1, S_TEXT), 5, np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    frames = jnp.zeros((1, NUM_FRAMES, 224, 224, 3), jnp.bfloat16)
    ctx = jnp.zeros((1, NUM_FRAMES, 336, 336, 3), jnp.bfloat16)
    frames_sam = jnp.zeros((1, T_SAM, 1024, 1024, 3), jnp.bfloat16)
    input_ids = jnp.asarray(ids)
    text_lens = jnp.full((1,), S_TEXT, jnp.int32)

    def init_fn():
        return model.init(
            jax.random.PRNGKey(0), frames, ctx,
            jnp.zeros((1, 1, 1024, 1024, 3), jnp.bfloat16),
            input_ids, text_lens, jnp.full_like(input_ids, -100),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, cfg.max_seg_tokens, 1, 64, 64), jnp.bfloat16))

    shapes = jax.eval_shape(init_fn)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape,
                            s.dtype if not jnp.issubdtype(s.dtype,
                                                          jnp.floating)
                            else jnp.float32 if (int8 and s.ndim <= 2)
                            else jnp.bfloat16), shapes)

    # stage 1: visual encode
    enc = jax.jit(lambda p, a, b: model.apply(
        p, a, b, method=lambda m, a, b: m.encode_visual_prefix(a, b)))
    t_enc = timeit(enc, params, frames, ctx)
    visual = enc(params, frames, ctx)
    print(f"visual encode (16f IV2+CLIP): {t_enc:.0f} ms")

    # stage 2: generate (prefill + decode together; prefill-only next)
    gen_fn = jax.jit(lambda p, v: generate_with_prefix(
        model, p, v, input_ids, text_lens, max_new_tokens=MAX_NEW,
        eos_id=32000))
    t_gen = timeit(gen_fn, params, visual)
    gen = gen_fn(params, visual)
    print(f"generate (prefill + {MAX_NEW} decode): {t_gen:.0f} ms")

    gen1 = jax.jit(lambda p, v: generate_with_prefix(
        model, p, v, input_ids, text_lens, max_new_tokens=1, eos_id=32000))
    t_pre = timeit(gen1, params, visual)
    print(f"  prefill (+1 token): {t_pre:.0f} ms")
    print(f"  decode: {(t_gen - t_pre)/(MAX_NEW-1):.2f} ms/token")

    # stage 3: seg extraction
    seg_fn = jax.jit(lambda p, g: extract_seg_from_generation(model, p, g))
    t_seg = timeit(seg_fn, params, gen)
    seg = seg_fn(params, gen)
    print(f"seg extraction: {t_seg:.0f} ms")

    # stage 4: SAM encode
    sam_fn = jax.jit(lambda p, f: model.apply(
        p, f, method=lambda m, a: m.encode_sam_features(a))[0])
    t_sam = timeit(sam_fn, params, frames_sam)
    sam_feats = sam_fn(params, frames_sam)
    print(f"SAM encode ({T_SAM} frames): {t_sam:.0f} ms "
          f"({t_sam/T_SAM:.1f} ms/frame)")

    # stage 5: mask decode
    dec_fn = jax.jit(lambda p, f, s: model.apply(
        p, f, s, jnp.zeros((1,), jnp.int32),
        method=lambda m, f, s, v: m.decode_masks(f, s, v, training=False)))
    t_dec = timeit(dec_fn, params, sam_feats, seg)
    print(f"mask decode: {t_dec:.0f} ms")

    total = t_enc + t_gen + t_seg + t_sam + t_dec
    print(f"stage total: {total:.0f} ms "
          f"({NUM_FRAMES/total*1000:.2f} frames/s equivalent)")


if __name__ == "__main__":
    main()
