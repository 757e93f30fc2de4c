"""End-to-end golden parity: the flax SAM-2 stack (image encoder, text-prompt
heads, memory encoder/attention, scan-based video propagation) vs the
REFERENCE torch SAM2Base driven exactly as its video predictor drives it."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoglamm_tpu.config import HieraConfig, SAM2Config
from videoglamm_tpu.io.import_torch import import_sam2
from videoglamm_tpu.models.sam2.sam2_base import SAM2Base
from videoglamm_tpu.models.sam2.video_predictor import track_video

from ref_sam2 import build_reference_sam2

pytestmark = [pytest.mark.golden, pytest.mark.slow]

CFG = SAM2Config(
    hiera=HieraConfig(embed_dim=16, num_heads=1, stages=(1, 2, 2, 1),
                      global_att_blocks=(4,), window_spec=(4, 2, 2, 2)),
    image_size=128, d_model=32, memory_attention_layers=2,
    memory_attention_dim_feedforward=64, mem_dim=16,
    memory_rope_feat_sizes=(8, 8))


@pytest.fixture(scope="module")
def models():
    import torch
    ref = build_reference_sam2(CFG)
    model = SAM2Base(CFG, dtype=jnp.float32)
    params = {"params": import_sam2(ref.state_dict(), CFG)}
    return ref, model, params


def _ref_track(ref, frames, text, n_obj):
    """Drive the reference track_step per frame, maintaining output_dict the
    way SAM2VideoPredictor does (sam2_video_predictor.py:744-1010)."""
    import torch
    T = frames.shape[0]
    outs = []
    output_dict = {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
    with torch.no_grad():
        for t in range(T):
            img = torch.from_numpy(frames[t]).permute(2, 0, 1)[None]
            img = img.expand(n_obj, -1, -1, -1)
            backbone_out = ref.forward_image(img)
            (_, feats, poss, sizes) = ref._prepare_backbone_features(
                backbone_out)
            out = ref.track_step(
                frame_idx=t, is_init_cond_frame=(t == 0),
                current_vision_feats=feats,
                current_vision_pos_embeds=poss, feat_sizes=sizes,
                point_inputs=None, mask_inputs=None,
                output_dict=output_dict, num_frames=T,
                run_mem_encoder=(t != 0),
                text_inputs=(torch.from_numpy(text)[:, None]
                             if t == 0 else None))
            if t == 0:
                # preflight consolidation re-encodes the prompted frame's
                # memory with is_mask_from_pts=True (binarize path when the
                # video-predictor build flag is on),
                # sam2_video_predictor.py:616-634
                high_res = torch.nn.functional.interpolate(
                    out["pred_masks"], size=(ref.image_size, ref.image_size),
                    mode="bilinear", align_corners=False)
                mem_feat, mem_pos = ref._encode_new_memory(
                    current_vision_feats=feats, feat_sizes=sizes,
                    pred_masks_high_res=high_res, is_mask_from_pts=True)
                out["maskmem_features"] = mem_feat
                out["maskmem_pos_enc"] = mem_pos
                output_dict["cond_frame_outputs"][t] = out
            else:
                output_dict["non_cond_frame_outputs"][t] = out
            outs.append(out["pred_masks"][:, 0].numpy())
    return np.stack(outs, axis=1)  # [n_obj, T, 4E, 4E]


@pytest.mark.parametrize(
    "T,stride,max_ptrs",
    [
        # short clip, no eviction: the regime of the original golden test
        (4, 1, 16),
        # WRAPAROUND regime (what DAVIS/MeViS clips actually run): with
        # num_maskmem=7 the 6-slot ring wraps from t=7, memories are evicted
        # every step, and max_ptrs=4 caps the obj-ptr window so its validity
        # mask diverges from trivial
        (16, 1, 4),
        # strided memory bank (memory_temporal_stride_for_eval=2, the XMem/
        # Cutie `r`; reference sam2_base.py:535-559 floor-aligned selection)
        (16, 2, 4),
    ])
def test_full_video_tracking_golden(models, T, stride, max_ptrs):
    import dataclasses
    ref, model, params = models
    # the knobs are selection-only — no weights depend on them — so the
    # module-scope ref/params are reused with mutated attrs / replaced config
    ref.max_obj_ptrs_in_encoder = max_ptrs
    ref.memory_temporal_stride_for_eval = stride
    cfg = dataclasses.replace(CFG, max_obj_ptrs_in_encoder=max_ptrs,
                              memory_temporal_stride_for_eval=stride)
    model = type(model)(cfg, dtype=jnp.float32)

    n_obj = 2
    rng = np.random.RandomState(0)
    frames = rng.randn(T, CFG.image_size, CFG.image_size, 3).astype(
        np.float32)
    text = rng.randn(n_obj, CFG.d_model).astype(np.float32)

    want = _ref_track(ref, frames, text, n_obj)

    def fn(mdl):
        feats, pos = mdl.forward_image(jnp.asarray(frames))
        # feats stay [T, h, w, c] — track_video shares them across objects
        return track_video(mdl, feats, pos, jnp.asarray(text)[:, None])

    res = model.apply(params, method=fn)
    got = np.asarray(res.low_res_masks)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_image_encoder_golden(models):
    import torch
    ref, model, params = models
    rng = np.random.RandomState(1)
    x = rng.randn(1, CFG.image_size, CFG.image_size, 3).astype(np.float32)
    with torch.no_grad():
        b = ref.forward_image(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref_fpn = [f.permute(0, 2, 3, 1).numpy() for f in b["backbone_fpn"]]

    feats, _ = model.apply(
        params, jnp.asarray(x),
        method=lambda mdl, a: mdl.forward_image(a))
    assert len(feats) == len(ref_fpn)
    for got, want in zip(feats, ref_fpn):
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3,
                                   rtol=2e-3)


def test_mask_decoder_dynamic_stability_golden(models):
    """Bare mask decoder in EVAL mode with multimask_output=False — the
    composite's [SEG] decode path — incl. the dynamic multimask-stability
    reselect (reference enables it via hydra overrides, build_sam.py:27-29;
    round-3 harness found the oracle builder previously omitted the flag,
    leaving this path oracle-untested)."""
    import torch
    ref, model, params = models
    assert ref.sam_mask_decoder.dynamic_multimask_via_stability
    E = CFG.image_size // 16
    C = CFG.d_model
    pe = ref.sam_prompt_encoder
    for seed in range(3):
        rng = np.random.RandomState(seed)
        feat = rng.randn(2, C, E, E).astype(np.float32)
        s0 = rng.randn(2, C // 8, 4 * E, 4 * E).astype(np.float32)
        s1 = rng.randn(2, C // 4, 2 * E, 2 * E).astype(np.float32)
        text = rng.randn(2, 1, C).astype(np.float32)
        with torch.no_grad():
            sp, dn = pe(points=None, boxes=None, masks=None,
                        text_embeds=torch.from_numpy(text))
            want, want_iou, _, _ = ref.sam_mask_decoder(
                image_embeddings=torch.from_numpy(feat),
                image_pe=pe.get_dense_pe(),
                sparse_prompt_embeddings=sp, dense_prompt_embeddings=dn,
                multimask_output=False, repeat_image=False,
                high_res_features=[torch.from_numpy(s0),
                                   torch.from_numpy(s1)])
        sp_j, dn_j = model.apply(
            params, jnp.asarray(text),
            method=lambda mdl, t: mdl.sam_prompt_encoder(
                points=None, text_embeds=t))
        hrf = (jnp.asarray(s0.transpose(0, 2, 3, 1)),
               jnp.asarray(s1.transpose(0, 2, 3, 1)))
        dec = model.apply(
            params, jnp.asarray(feat.transpose(0, 2, 3, 1)), sp_j, dn_j,
            method=lambda mdl, f, s, d: mdl.sam_mask_decoder(
                f, mdl.sam_prompt_encoder.get_dense_pe(), s, d,
                multimask_output=False, high_res_features=hrf,
                training=False))
        np.testing.assert_allclose(
            np.asarray(dec.masks), want.detach().numpy(),
            atol=5e-5, rtol=5e-5, err_msg=f"seed {seed}")
        np.testing.assert_allclose(
            np.asarray(dec.iou_pred), want_iou.detach().numpy(),
            atol=5e-5, rtol=5e-5)
