"""xprof trace of the full bench clip (encode -> prefill -> decode -> SAM):
grouped per-op attribution at flagship scale, zero weights, batch 1.

Usage: python scripts/trace_clip.py [top_n]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from videoglamm_tpu.config import VideoGLaMMConfig
from videoglamm_tpu.constants import IMAGE_TOKEN_INDEX
from videoglamm_tpu.inference.generate import generate_with_prefix
from videoglamm_tpu.inference.pipeline import extract_seg_from_generation
from videoglamm_tpu.models import VideoGLaMM
from xprof_summary import trace_and_summarize


def main():
    top = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    cfg = VideoGLaMMConfig.flagship()
    model = VideoGLaMM(cfg, dtype=jnp.bfloat16, quant_llm_int8=True,
                       quant_kv_int8=True)
    B, NF, TS, ST, MN = 1, 16, 8, 64, 64
    ids = np.full((B, ST), 5, np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    batch = dict(
        frames=jnp.zeros((B, NF, 224, 224, 3), jnp.bfloat16),
        context_images=jnp.zeros((B, NF, 336, 336, 3), jnp.bfloat16),
        frames_sam=jnp.zeros((B, TS, 1024, 1024, 3), jnp.bfloat16),
        input_ids=jnp.asarray(ids),
        text_lens=jnp.full((B,), ST, jnp.int32),
    )

    def init_fn():
        return model.init(
            jax.random.PRNGKey(0), batch["frames"], batch["context_images"],
            jnp.zeros((B, 1, 1024, 1024, 3), jnp.bfloat16),
            batch["input_ids"], batch["text_lens"],
            jnp.full_like(batch["input_ids"], -100),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B, cfg.max_seg_tokens, 1, 64, 64), jnp.bfloat16))

    shapes = jax.eval_shape(init_fn)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape,
                            s.dtype if not jnp.issubdtype(s.dtype,
                                                          jnp.floating)
                            else jnp.float32 if s.ndim <= 2
                            else jnp.bfloat16), shapes)

    def clip_fn(params, frames, context_images, frames_sam, input_ids,
                text_lens):
        visual = model.apply(
            params, frames, context_images,
            method=lambda mdl, a, b: mdl.encode_visual_prefix(a, b))
        gen = generate_with_prefix(
            model, params, visual, input_ids, text_lens,
            max_new_tokens=MN, eos_id=32000, draft_k=0)
        seg = extract_seg_from_generation(model, params, gen)
        sam_feats, _ = model.apply(
            params, frames_sam,
            method=lambda mdl, a: mdl.encode_sam_features(a))
        masks = model.apply(
            params, sam_feats, seg, jnp.arange(B, dtype=jnp.int32),
            method=lambda mdl, f, s, v: mdl.decode_masks(
                f, s, v, training=False))
        return (masks.astype(jnp.float32).sum()
                + gen.tokens.sum().astype(jnp.float32))

    jfn = jax.jit(clip_fn)
    float(jfn(params, **batch))

    def run():
        float(jfn(params, **batch))

    trace_and_summarize(run, top=top, group=False)


if __name__ == "__main__":
    main()
