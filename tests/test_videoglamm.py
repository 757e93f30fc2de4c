"""Composite VideoGLaMM: end-to-end training forward, loss semantics,
[SEG] extraction, gradient flow under freezing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoglamm_tpu.config import VideoGLaMMConfig
from videoglamm_tpu.constants import (IGNORE_INDEX, IMAGE_TOKEN_INDEX,
                                      MASK_IGNORE_INDEX)
from videoglamm_tpu.models import VideoGLaMM
from videoglamm_tpu.models.videoglamm import dice_loss, sigmoid_ce_loss

CFG = VideoGLaMMConfig.tiny(num_frames=4)
SEG = CFG.seg_token_idx


def make_batch(rng, Bv=1, R=2, S=16, T_sam=2, gt_hw=32):
    cfg = CFG
    T = cfg.num_frames
    ims = cfg.internvideo.image_size
    cls_ = cfg.clip.image_size
    sam_s = cfg.sam2.image_size
    frames = rng.randn(Bv, T, ims, ims, 3).astype(np.float32)
    context = rng.randn(Bv, T, cls_, cls_, 3).astype(np.float32)
    frames_sam = rng.randn(Bv, T_sam, sam_s, sam_s, 3).astype(np.float32)

    input_ids = rng.randint(1, 400, size=(R, S)).astype(np.int32)
    input_ids[:, 2] = IMAGE_TOKEN_INDEX
    input_ids[0, 5] = SEG            # row 0: one [SEG]
    if R > 1:
        input_ids[1, 5] = SEG        # row 1: two [SEG]
        input_ids[1, 7] = SEG
    text_lens = np.full(R, S, np.int32)
    if R > 1:
        text_lens[1] = S - 4
    labels = input_ids.copy()
    labels[labels < 0] = IGNORE_INDEX
    video_idx = (np.arange(R) % Bv).astype(np.int32)

    gt = np.full((R, cfg.max_seg_tokens, T_sam, gt_hw, gt_hw), MASK_IGNORE_INDEX,
                 np.float32)
    gt[0, 0] = (rng.rand(T_sam, gt_hw, gt_hw) > 0.5).astype(np.float32)
    if R > 1:
        gt[1, :2] = (rng.rand(2, T_sam, gt_hw, gt_hw) > 0.5).astype(np.float32)
    return dict(frames=jnp.asarray(frames),
                context_images=jnp.asarray(context),
                frames_sam=jnp.asarray(frames_sam),
                input_ids=jnp.asarray(input_ids),
                text_lens=jnp.asarray(text_lens),
                labels=jnp.asarray(labels),
                video_idx=jnp.asarray(video_idx),
                gt_masks=jnp.asarray(gt))


@pytest.fixture(scope="module")
def model_params_batch():
    model = VideoGLaMM(CFG, dtype=jnp.float32)
    batch = make_batch(np.random.RandomState(0))
    params = model.init(jax.random.PRNGKey(0), **batch)
    return model, params, batch


def test_training_forward(model_params_batch):
    model, params, batch = model_params_batch
    out = model.apply(params, **batch, return_pred_masks=True)
    assert np.isfinite(float(out.loss))
    assert float(out.ce_loss) > 0
    assert out.pred_masks.shape == (2, CFG.max_seg_tokens, 2, 32, 32)
    total = float(out.ce_loss + out.mask_bce_loss + out.mask_dice_loss)
    np.testing.assert_allclose(float(out.loss), total, rtol=1e-6)


def test_seg_extraction(model_params_batch):
    model, params, batch = model_params_batch

    def run(p, b):
        def fn(mdl):
            visual = mdl.encode_visual_prefix(b["frames"],
                                              b["context_images"])
            _, hidden, sp = mdl.lm_forward(visual, b["input_ids"],
                                           b["text_lens"], b["labels"],
                                           b["video_idx"])
            return mdl.extract_seg(hidden, sp)
        return nn_apply(model, p, fn)

    import flax.linen as nn_mod

    def nn_apply(model, p, fn):
        return model.apply(p, method=fn)

    seg = run(params, batch)
    valid = np.asarray(seg.valid)
    # row 0 has one [SEG], row 1 has two
    assert valid[0].sum() == 1 and valid[1].sum() == 2
    emb = np.asarray(seg.embeds)
    # invalid slots zeroed
    assert np.all(emb[0, 1:] == 0)
    assert np.all(emb[1, 2:] == 0)
    # the spliced [SEG] position shifts by V-1 (placeholder at index 2)
    V = CFG.visual_prefix_len
    assert np.asarray(seg.positions)[0, 0] == 5 - 1 + V


def test_mask_loss_ignores_padded_slots():
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.randn(2, 3, 8, 8).astype(np.float32))
    gt_pad = jnp.full((2, 3, 8, 8), MASK_IGNORE_INDEX, jnp.float32)
    np.testing.assert_allclose(np.asarray(sigmoid_ce_loss(pred, gt_pad)), 0.0,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(dice_loss(pred, gt_pad)), 0.0,
                               atol=1e-5)

    # loss matches a straightforward torch-style computation on real masks
    import torch
    import torch.nn.functional as F
    gt = (rng.rand(2, 3, 8, 8) > 0.5).astype(np.float32)
    got_bce = np.asarray(sigmoid_ce_loss(pred, jnp.asarray(gt)))
    tp = torch.from_numpy(np.asarray(pred))
    tg = torch.from_numpy(gt)
    ref_bce = F.binary_cross_entropy_with_logits(
        tp, tg, reduction="none").flatten(2).mean(-1).numpy()
    np.testing.assert_allclose(got_bce, ref_bce, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_frozen_towers_get_no_grad(model_params_batch):
    model, params, batch = model_params_batch

    def loss_fn(p):
        return model.apply(p, **batch).loss

    grads = jax.grad(loss_fn)(params)["params"]
    flat = jax.tree.leaves_with_path(grads)

    def norm_of(prefix):
        tot = 0.0
        for path, g in flat:
            if any(getattr(k, "key", None) == prefix for k in path):
                tot += float(jnp.abs(g).sum())
        return tot

    # stop_gradient'd towers
    assert norm_of("vision_tower") == 0.0
    assert norm_of("image_vision_tower") == 0.0
    # trainable heads get signal
    assert norm_of("text_hidden_fcs") > 0.0
    assert norm_of("sam_mask_decoder") > 0.0


def test_composite_with_llama_base():
    """The alternate Llama-3.1 base wires through the full composite
    (training forward + cached generation)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from videoglamm_tpu.config import LlamaConfig
    from videoglamm_tpu.inference.generate import generate_with_prefix

    cfg = dataclasses.replace(CFG, llm_type="llama3_1",
                              llama=LlamaConfig.tiny())
    model = VideoGLaMM(cfg, dtype=jnp.float32)
    batch = make_batch(np.random.RandomState(0))
    params = model.init(jax.random.PRNGKey(0), **batch)
    out = model.apply(params, **batch)
    assert np.isfinite(float(out.loss))

    visual = model.apply(
        params, batch["frames"], batch["context_images"],
        method=lambda mdl, a, b: mdl.encode_visual_prefix(a, b))
    gen = generate_with_prefix(
        model, params, visual[batch["video_idx"]], batch["input_ids"],
        batch["text_lens"], max_new_tokens=4, eos_id=3)
    assert gen.tokens.shape == (2, 4)
    assert np.isfinite(np.asarray(gen.hidden)).all()


def test_sam_chunked_encode_matches_per_frame(model_params_batch):
    """VGT_SAM_CHUNK>1 is a pure batching change: same math per frame,
    but XLA fuses/accumulates batched convs differently, so the contract
    is f32-noise tolerance, not bitwise."""
    import os
    model, params, batch = model_params_batch
    frames = batch["frames_sam"][:1]          # [1, T_sam, S, S, 3]
    T = frames.shape[1]
    if T < 2:
        import pytest
        pytest.skip("needs >=2 SAM frames")

    def run():
        return model.apply(params, frames,
                           method=lambda mdl, a: mdl.encode_sam_features(a))

    os.environ["VGT_SAM_CHUNK"] = "1"
    f1, _ = run()
    os.environ["VGT_SAM_CHUNK"] = str(T)
    fT, _ = run()
    os.environ["VGT_SAM_CHUNK"] = "2" if T % 2 == 0 else "1"
    f2, _ = run()
    os.environ.pop("VGT_SAM_CHUNK", None)
    for a, b in zip(f1, fT):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
