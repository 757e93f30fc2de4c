"""int8 serving parity gate: the weight-only int8 LLM path must reproduce
the float path's generations and masks on the tiny composite. This gates
making int8 the bench/serving default (reference decode semantics:
model/VideoGLaMM.py:789-806)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoglamm_tpu.config import VideoGLaMMConfig
from videoglamm_tpu.constants import IMAGE_TOKEN_INDEX
from videoglamm_tpu.inference.generate import generate_with_prefix
from videoglamm_tpu.inference.pipeline import extract_seg_from_generation
from videoglamm_tpu.models import VideoGLaMM

CFG = VideoGLaMMConfig.tiny(num_frames=4)


def _clip(model, params, batch, max_new=12):
    visual = model.apply(
        params, batch["frames"], batch["context_images"],
        method=lambda mdl, a, b: mdl.encode_visual_prefix(a, b))
    gen = generate_with_prefix(
        model, params, visual, batch["input_ids"], batch["text_lens"],
        max_new_tokens=max_new, eos_id=-1)      # no early stop: fixed length
    seg = extract_seg_from_generation(model, params, gen)
    sam_feats, _ = model.apply(
        params, batch["frames_sam"],
        method=lambda mdl, a: mdl.encode_sam_features(a))
    masks = model.apply(
        params, sam_feats, seg, jnp.zeros((1,), jnp.int32),
        method=lambda mdl, f, s, v: mdl.decode_masks(f, s, v,
                                                     training=False))
    return np.asarray(gen.tokens), np.asarray(masks)


@pytest.mark.slow
def test_int8_generation_and_mask_parity():
    from videoglamm_tpu.io.import_torch import quantize_videoglamm_llm

    model = VideoGLaMM(CFG, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    T, T_sam, S = CFG.num_frames, 2, 16
    ims = CFG.internvideo.image_size
    cls_ = CFG.clip.image_size
    sam_s = CFG.sam2.image_size
    ids = rng.randint(1, 400, size=(1, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    batch = dict(
        frames=jnp.asarray(rng.randn(1, T, ims, ims, 3), jnp.float32),
        context_images=jnp.asarray(rng.randn(1, T, cls_, cls_, 3),
                                   jnp.float32),
        frames_sam=jnp.asarray(rng.randn(1, T_sam, sam_s, sam_s, 3),
                               jnp.float32),
        input_ids=jnp.asarray(ids),
        text_lens=jnp.full((1,), S, jnp.int32),
    )
    params = model.init(
        jax.random.PRNGKey(0), **batch,
        labels=jnp.full_like(batch["input_ids"], -100),
        video_idx=jnp.zeros((1,), jnp.int32),
        gt_masks=jnp.zeros((1, CFG.max_seg_tokens, T_sam, 32, 32),
                           jnp.float32))

    tok_f, mask_f = _clip(model, params, batch)

    qparams = {"params": quantize_videoglamm_llm(params["params"])}
    qmodel = VideoGLaMM(CFG, dtype=jnp.float32, quant_llm_int8=True)
    tok_q, mask_q = _clip(qmodel, qparams, batch)

    # text: greedy tokens agree on (nearly) every step — random-init logits
    # are nearly tied, so demand >=90% agreement; with real weights the
    # margins are far larger
    agree = (tok_f == tok_q).mean()
    assert agree >= 0.9, f"token agreement {agree}"

    # masks: binarized predictions agree
    bf, bq = mask_f > 0, mask_q > 0
    pix_agree = (bf == bq).mean()
    assert pix_agree >= 0.99, f"mask pixel agreement {pix_agree}"
    inter = (bf & bq).sum()
    union = (bf | bq).sum()
    if union:
        assert inter / union >= 0.95, f"mask IoU {inter / union}"


def test_int8_kv_cache_parity():
    """int8 KV cache gate (same methodology as the weight gate): quantized
    K/V storage must reproduce the bf16-cache generations and masks on the
    tiny composite, both alone and combined with int8 weights (the serving
    default combo)."""
    from videoglamm_tpu.io.import_torch import quantize_videoglamm_llm

    model = VideoGLaMM(CFG, dtype=jnp.float32)
    rng = np.random.RandomState(2)
    T, T_sam, S = CFG.num_frames, 2, 16
    ims = CFG.internvideo.image_size
    cls_ = CFG.clip.image_size
    sam_s = CFG.sam2.image_size
    ids = rng.randint(1, 400, size=(1, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    batch = dict(
        frames=jnp.asarray(rng.randn(1, T, ims, ims, 3), jnp.float32),
        context_images=jnp.asarray(rng.randn(1, T, cls_, cls_, 3),
                                   jnp.float32),
        frames_sam=jnp.asarray(rng.randn(1, T_sam, sam_s, sam_s, 3),
                               jnp.float32),
        input_ids=jnp.asarray(ids),
        text_lens=jnp.full((1,), S, jnp.int32),
    )
    params = model.init(
        jax.random.PRNGKey(0), **batch,
        labels=jnp.full_like(batch["input_ids"], -100),
        video_idx=jnp.zeros((1,), jnp.int32),
        gt_masks=jnp.zeros((1, CFG.max_seg_tokens, T_sam, 32, 32),
                           jnp.float32))

    tok_f, mask_f = _clip(model, params, batch)

    kv_model = VideoGLaMM(CFG, dtype=jnp.float32, quant_kv_int8=True)
    tok_kv, mask_kv = _clip(kv_model, params, batch)
    agree = (tok_f == tok_kv).mean()
    assert agree >= 0.9, f"token agreement (kv8) {agree}"
    bf, bq = mask_f > 0, mask_kv > 0
    assert (bf == bq).mean() >= 0.99, (bf == bq).mean()

    # combined int8 weights + int8 KV (the bench serving default)
    qparams = {"params": quantize_videoglamm_llm(params["params"])}
    qmodel = VideoGLaMM(CFG, dtype=jnp.float32, quant_llm_int8=True,
                        quant_kv_int8=True)
    tok_q, mask_q = _clip(qmodel, qparams, batch)
    agree = (tok_f == tok_q).mean()
    assert agree >= 0.9, f"token agreement (w8+kv8) {agree}"
    bq = mask_q > 0
    assert (bf == bq).mean() >= 0.99, (bf == bq).mean()


def test_w8a8_prefill_generation_and_mask_parity(monkeypatch):
    """W8A8 prefill gate (same methodology as the weight/KV gates): with the
    routing threshold forced down so the tiny composite's prefill takes the
    dynamic-activation-quant path (decode stays the M=1 matvec), the full
    serving combo (int8 weights + int8 KV + W8A8 prefill) must reproduce the
    float path's generations and masks."""
    from videoglamm_tpu.io.import_torch import quantize_videoglamm_llm

    model = VideoGLaMM(CFG, dtype=jnp.float32)
    rng = np.random.RandomState(3)
    T, T_sam, S = CFG.num_frames, 2, 16
    ims = CFG.internvideo.image_size
    cls_ = CFG.clip.image_size
    sam_s = CFG.sam2.image_size
    ids = rng.randint(1, 400, size=(1, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    batch = dict(
        frames=jnp.asarray(rng.randn(1, T, ims, ims, 3), jnp.float32),
        context_images=jnp.asarray(rng.randn(1, T, cls_, cls_, 3),
                                   jnp.float32),
        frames_sam=jnp.asarray(rng.randn(1, T_sam, sam_s, sam_s, 3),
                               jnp.float32),
        input_ids=jnp.asarray(ids),
        text_lens=jnp.full((1,), S, jnp.int32),
    )
    params = model.init(
        jax.random.PRNGKey(0), **batch,
        labels=jnp.full_like(batch["input_ids"], -100),
        video_idx=jnp.zeros((1,), jnp.int32),
        gt_masks=jnp.zeros((1, CFG.max_seg_tokens, T_sam, 32, 32),
                           jnp.float32))

    tok_f, mask_f = _clip(model, params, batch)

    monkeypatch.setenv("VGT_W8A8_MIN_M", "2")
    qparams = {"params": quantize_videoglamm_llm(params["params"])}
    qmodel = VideoGLaMM(CFG, dtype=jnp.float32, quant_llm_int8=True,
                        quant_kv_int8=True)
    tok_q, mask_q = _clip(qmodel, qparams, batch)
    agree = (tok_f == tok_q).mean()
    assert agree >= 0.9, f"token agreement (w8a8) {agree}"
    bf, bq = mask_f > 0, mask_q > 0
    assert (bf == bq).mean() >= 0.99, (bf == bq).mean()


def test_int4_generation_and_mask_parity():
    """int4 is EXPERIMENTAL serving: looser gate than int8 (group-128
    4-bit), checked end-to-end on the tiny composite."""
    from videoglamm_tpu.io.import_torch import quantize_videoglamm_llm

    model = VideoGLaMM(CFG, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    T, T_sam, S = CFG.num_frames, 2, 16
    ims = CFG.internvideo.image_size
    cls_ = CFG.clip.image_size
    sam_s = CFG.sam2.image_size
    ids = rng.randint(1, 400, size=(1, S)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    batch = dict(
        frames=jnp.asarray(rng.randn(1, T, ims, ims, 3), jnp.float32),
        context_images=jnp.asarray(rng.randn(1, T, cls_, cls_, 3),
                                   jnp.float32),
        frames_sam=jnp.asarray(rng.randn(1, T_sam, sam_s, sam_s, 3),
                               jnp.float32),
        input_ids=jnp.asarray(ids),
        text_lens=jnp.full((1,), S, jnp.int32),
    )
    params = model.init(
        jax.random.PRNGKey(0), **batch,
        labels=jnp.full_like(batch["input_ids"], -100),
        video_idx=jnp.zeros((1,), jnp.int32),
        gt_masks=jnp.zeros((1, CFG.max_seg_tokens, T_sam, 32, 32),
                           jnp.float32))

    tok_f, mask_f = _clip(model, params, batch)

    qparams = {"params": quantize_videoglamm_llm(params["params"],
                                                 mode="int4")}
    qmodel = VideoGLaMM(CFG, dtype=jnp.float32, quant_llm_int4=True)
    tok_q, mask_q = _clip(qmodel, qparams, batch)

    agree = (tok_f == tok_q).mean()
    assert agree >= 0.75, f"token agreement {agree}"
    bf, bq = mask_f > 0, mask_q > 0
    assert (bf == bq).mean() >= 0.97, (bf == bq).mean()
