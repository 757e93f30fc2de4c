"""Golden-parity tests for the interactive SAM-2 predictor surface
(point/box/mask prompts at arbitrary frames, bidirectional propagation,
refinement clicks) against the REAL reference modules
(/root/reference/VideoGLaMM/model/segment_anything_2/sam2/
sam2_video_predictor.py + modeling/sam2_base.py), executed as the oracle."""
import numpy as np
import pytest

import jax.numpy as jnp

from videoglamm_tpu.config import HieraConfig, SAM2Config
from videoglamm_tpu.models.sam2.sam2_base import SAM2Base
from videoglamm_tpu.io.import_torch import import_sam2
from videoglamm_tpu.models.sam2 import interactive as ia

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
    ref = build_reference_sam2(CFG)
    model = SAM2Base(CFG, dtype=jnp.float32)
    params = {"params": import_sam2(ref.state_dict(), CFG)}
    return ref, model, params


class RefSession:
    """Drive the reference track_step + the video predictor's consolidation
    semantics (prompted frames re-encoded with is_mask_from_pts=True,
    consolidated frames skipped during propagation) the way
    SAM2VideoPredictor does (sam2_video_predictor.py:252-827)."""

    def __init__(self, ref, frames, n_obj):
        import torch
        self.ref = ref
        self.T = frames.shape[0]
        self.n_obj = n_obj
        self.feats = []
        with torch.no_grad():
            for t in range(self.T):
                img = torch.from_numpy(frames[t]).permute(2, 0, 1)[None]
                img = img.expand(n_obj, -1, -1, -1)
                backbone_out = ref.forward_image(img)
                self.feats.append(ref._prepare_backbone_features(
                    backbone_out)[1:])
        self.output_dict = {"cond_frame_outputs": {},
                            "non_cond_frame_outputs": {}}
        self.pinned = set()   # consolidated (user-prompted) frames
        self.masks = np.zeros((n_obj, self.T,
                               4 * CFG.image_size // 16,
                               4 * CFG.image_size // 16), np.float32)

    def _consolidate(self, t, out):
        """Preflight consolidation memory re-encode
        (sam2_video_predictor.py:616-634)."""
        import torch
        feats, poss, sizes = self.feats[t]
        with torch.no_grad():
            high = torch.nn.functional.interpolate(
                out["pred_masks"],
                size=(self.ref.image_size, self.ref.image_size),
                mode="bilinear", align_corners=False)
            mem, mem_pos = self.ref._encode_new_memory(
                current_vision_feats=feats, feat_sizes=sizes,
                pred_masks_high_res=high, is_mask_from_pts=True)
        out["maskmem_features"] = mem
        out["maskmem_pos_enc"] = mem_pos
        return out

    def _store(self, t, out, is_cond):
        key = "cond_frame_outputs" if is_cond else "non_cond_frame_outputs"
        self.output_dict[key][t] = out
        self.pinned.add(t)
        self.masks[:, t] = out["pred_masks"][:, 0].numpy()

    def add_points(self, t, coords, labels, is_init=True, prev_logits=None):
        import torch
        feats, poss, sizes = self.feats[t]
        with torch.no_grad():
            if prev_logits is not None:
                prev_logits = torch.clamp(
                    torch.from_numpy(prev_logits), -32.0, 32.0)
            out = self.ref.track_step(
                frame_idx=t, is_init_cond_frame=is_init,
                current_vision_feats=feats, current_vision_pos_embeds=poss,
                feat_sizes=sizes,
                point_inputs={"point_coords": torch.from_numpy(coords),
                              "point_labels": torch.from_numpy(labels)},
                mask_inputs=None, output_dict=self.output_dict,
                num_frames=self.T, run_mem_encoder=False,
                prev_sam_mask_logits=prev_logits)
        self._store(t, self._consolidate(t, out), is_cond=is_init)

    def add_mask(self, t, mask):
        import torch
        feats, poss, sizes = self.feats[t]
        with torch.no_grad():
            out = self.ref.track_step(
                frame_idx=t, is_init_cond_frame=True,
                current_vision_feats=feats, current_vision_pos_embeds=poss,
                feat_sizes=sizes, point_inputs=None,
                mask_inputs=torch.from_numpy(mask),
                output_dict=self.output_dict, num_frames=self.T,
                run_mem_encoder=False)
        self._store(t, self._consolidate(t, out), is_cond=True)

    def propagate(self, start, reverse=False):
        import torch
        order = range(start, -1, -1) if reverse else range(start, self.T)
        for t in order:
            if t in self.pinned:
                continue
            feats, poss, sizes = self.feats[t]
            with torch.no_grad():
                out = self.ref.track_step(
                    frame_idx=t, is_init_cond_frame=False,
                    current_vision_feats=feats,
                    current_vision_pos_embeds=poss, feat_sizes=sizes,
                    point_inputs=None, mask_inputs=None,
                    output_dict=self.output_dict, num_frames=self.T,
                    track_in_reverse=reverse)
            self.output_dict["non_cond_frame_outputs"][t] = out
            self.masks[:, t] = out["pred_masks"][:, 0].numpy()


def _frames(T, rng):
    return rng.randn(T, CFG.image_size, CFG.image_size, 3).astype(np.float32)


def _per_obj(level_t, B):
    return jnp.broadcast_to(level_t[None], (B,) + level_t.shape)


def test_point_prompt_bidirectional_golden(models):
    """Click on frame 3 of 8, propagate forward then in reverse — the
    reference demo flow (add_new_points + propagate_in_video both
    directions)."""
    ref, model, params = models
    T, B = 8, 2
    rng = np.random.RandomState(0)
    frames = _frames(T, rng)
    coords = (rng.rand(B, 1, 2) * CFG.image_size).astype(np.float32)
    labels = np.ones((B, 1), np.int64)

    sess = RefSession(ref, frames, B)
    sess.add_points(3, coords, labels)
    sess.propagate(3)
    sess.propagate(3, reverse=True)

    def fn(mdl):
        feats, pos = mdl.forward_image(jnp.asarray(frames))
        bank = ia.init_interactive_bank(mdl, B, T, max_cond_frames=4)
        f3 = [_per_obj(f[3], B) for f in feats]
        heads, bank = ia.add_point_prompt(
            mdl, f3, pos[-1], bank, 3, jnp.asarray(coords),
            jnp.asarray(labels.astype(np.int32)), T, cond_slot=0)
        init = jnp.zeros((B, T) + heads.low_res_masks.shape[-2:])
        init = init.at[:, 3].set(heads.low_res_masks[:, 0])
        fwd, bank = ia.propagate(mdl, feats, pos, bank, 3, T,
                                 init_masks=init)
        rev, bank = ia.propagate(mdl, feats, pos, bank, 3, T, reverse=True,
                                 init_masks=fwd.low_res_masks)
        return rev.low_res_masks

    got = np.asarray(model.apply(params, method=fn))
    np.testing.assert_allclose(got, sess.masks, atol=5e-3, rtol=5e-3)


def test_multi_cond_selection_golden(models):
    """Prompts on frames 1/5/8 with max_cond_frames_in_attn=2 and a small
    obj-ptr cap: exercises closest-cond selection, the unselected-cond
    fallback into the non-cond window, and past-only cond pointers."""
    import dataclasses
    ref, model, params = models
    ref.max_cond_frames_in_attn = 2
    ref.max_obj_ptrs_in_encoder = 4
    cfg = dataclasses.replace(CFG, max_cond_frames_in_attn=2,
                              max_obj_ptrs_in_encoder=4)
    model = type(model)(cfg, dtype=jnp.float32)
    try:
        T, B = 10, 1
        rng = np.random.RandomState(1)
        frames = _frames(T, rng)
        pts = {t: ((rng.rand(B, 1, 2) * CFG.image_size).astype(np.float32),
                   np.ones((B, 1), np.int64)) for t in (1, 5, 8)}

        sess = RefSession(ref, frames, B)
        for t in (1, 5, 8):
            sess.add_points(t, *pts[t])
        sess.propagate(1)

        def fn(mdl):
            feats, pos = mdl.forward_image(jnp.asarray(frames))
            bank = ia.init_interactive_bank(mdl, B, T, max_cond_frames=4)
            init = None
            for slot, t in enumerate((1, 5, 8)):
                ft = [_per_obj(f[t], B) for f in feats]
                heads, bank = ia.add_point_prompt(
                    mdl, ft, pos[-1], bank, t, jnp.asarray(pts[t][0]),
                    jnp.asarray(pts[t][1].astype(np.int32)), T,
                    cond_slot=slot)
                if init is None:
                    init = jnp.zeros((B, T) + heads.low_res_masks.shape[-2:])
                init = init.at[:, t].set(heads.low_res_masks[:, 0])
            out, _ = ia.propagate(mdl, feats, pos, bank, 1, T,
                                  init_masks=init)
            return out.low_res_masks

        got = np.asarray(model.apply(params, method=fn))
        np.testing.assert_allclose(got, sess.masks, atol=5e-3, rtol=5e-3)
    finally:
        ref.max_cond_frames_in_attn = CFG.max_cond_frames_in_attn
        ref.max_obj_ptrs_in_encoder = CFG.max_obj_ptrs_in_encoder


def test_mask_prompt_golden(models):
    """Binary mask prompt on frame 0 (use_mask_input_as_output_without_sam
    path), then forward propagation."""
    ref, model, params = models
    T, B, S = 6, 1, CFG.image_size
    rng = np.random.RandomState(2)
    frames = _frames(T, rng)
    yy, xx = np.mgrid[0:S, 0:S]
    disk = (((yy - 60) ** 2 + (xx - 70) ** 2) < 30 ** 2)
    mask = disk.astype(np.float32)[None, None]          # [1, 1, S, S] torch

    sess = RefSession(ref, frames, B)
    sess.add_mask(0, mask)
    sess.propagate(0)

    def fn(mdl):
        feats, pos = mdl.forward_image(jnp.asarray(frames))
        bank = ia.init_interactive_bank(mdl, B, T, max_cond_frames=4)
        f0 = [_per_obj(f[0], B) for f in feats]
        heads, bank = ia.add_mask_prompt(
            mdl, f0, bank, 0, jnp.asarray(mask[:, 0, :, :, None]),
            cond_slot=0)
        init = jnp.zeros((B, T) + heads.low_res_masks.shape[-2:])
        init = init.at[:, 0].set(heads.low_res_masks[:, 0])
        out, _ = ia.propagate(mdl, feats, pos, bank, 0, T, init_masks=init)
        return out.low_res_masks

    got = np.asarray(model.apply(params, method=fn))
    np.testing.assert_allclose(got, sess.masks, atol=5e-3, rtol=5e-3)


def test_refinement_click_golden(models):
    """Track from a frame-0 prompt, then add a correction click on tracked
    frame 4 (memory-conditioned decode + previous mask logits, stored as a
    non-cond output) and re-propagate from there."""
    ref, model, params = models
    T, B = 8, 1
    rng = np.random.RandomState(3)
    frames = _frames(T, rng)
    c0 = (rng.rand(B, 1, 2) * CFG.image_size).astype(np.float32)
    l0 = np.ones((B, 1), np.int64)
    c4 = (rng.rand(B, 1, 2) * CFG.image_size).astype(np.float32)
    l4 = np.zeros((B, 1), np.int64)                     # negative click

    sess = RefSession(ref, frames, B)
    sess.add_points(0, c0, l0)
    sess.propagate(0)
    prev4 = sess.output_dict["non_cond_frame_outputs"][4][
        "pred_masks"].numpy()
    sess.add_points(4, c4, l4, is_init=False, prev_logits=prev4)
    sess.propagate(4)

    def fn(mdl):
        feats, pos = mdl.forward_image(jnp.asarray(frames))
        bank = ia.init_interactive_bank(mdl, B, T, max_cond_frames=4)
        f0 = [_per_obj(f[0], B) for f in feats]
        heads0, bank = ia.add_point_prompt(
            mdl, f0, pos[-1], bank, 0, jnp.asarray(c0),
            jnp.asarray(l0.astype(np.int32)), T, cond_slot=0)
        init = jnp.zeros((B, T) + heads0.low_res_masks.shape[-2:])
        init = init.at[:, 0].set(heads0.low_res_masks[:, 0])
        fwd, bank = ia.propagate(mdl, feats, pos, bank, 0, T,
                                 init_masks=init)
        f4 = [_per_obj(f[4], B) for f in feats]
        heads4, bank = ia.add_point_prompt(
            mdl, f4, pos[-1], bank, 4, jnp.asarray(c4),
            jnp.asarray(l4.astype(np.int32)), T, cond_slot=None,
            prev_mask_logits=fwd.low_res_masks[:, 4][..., None])
        timeline = fwd.low_res_masks.at[:, 4].set(heads4.low_res_masks[:, 0])
        pinned = jnp.zeros((T,), bool).at[4].set(True)
        out, _ = ia.propagate(mdl, feats, pos, bank, 4, T, pinned=pinned,
                              init_masks=timeline)
        return out.low_res_masks

    got = np.asarray(model.apply(params, method=fn))
    np.testing.assert_allclose(got, sess.masks, atol=5e-3, rtol=5e-3)


def test_clear_non_cond_mem_golden(models):
    """clear_non_cond_mem_around_input: a refinement click pops every
    non-cond output within +-(r * num_maskmem) of the clicked frame —
    including the refinement's own just-stored output — before
    re-propagation (reference preflight :709-714 + _clear_non_cond_mem_
    around_input :1044-1061). Tracking after the clear runs on cond
    memories + freshly re-built non-cond only."""
    ref, model, params = models
    T, B = 8, 1
    rng = np.random.RandomState(5)
    frames = _frames(T, rng)
    c0 = (rng.rand(B, 1, 2) * CFG.image_size).astype(np.float32)
    l0 = np.ones((B, 1), np.int64)
    c4 = (rng.rand(B, 1, 2) * CFG.image_size).astype(np.float32)
    l4 = np.zeros((B, 1), np.int64)

    sess = RefSession(ref, frames, B)
    sess.add_points(0, c0, l0)
    sess.propagate(0)
    prev4 = sess.output_dict["non_cond_frame_outputs"][4][
        "pred_masks"].numpy()
    sess.add_points(4, c4, l4, is_init=False, prev_logits=prev4)
    # reference clear: pop non-cond outputs in [4 - r*N, 4 + r*N]
    w = ref.memory_temporal_stride_for_eval * ref.num_maskmem
    for t in range(4 - w, 4 + w + 1):
        sess.output_dict["non_cond_frame_outputs"].pop(t, None)
    sess.propagate(4)

    def fn(mdl):
        feats, pos = mdl.forward_image(jnp.asarray(frames))
        bank = ia.init_interactive_bank(mdl, B, T, max_cond_frames=4)
        f0 = [_per_obj(f[0], B) for f in feats]
        heads0, bank = ia.add_point_prompt(
            mdl, f0, pos[-1], bank, 0, jnp.asarray(c0),
            jnp.asarray(l0.astype(np.int32)), T, cond_slot=0)
        init = jnp.zeros((B, T) + heads0.low_res_masks.shape[-2:])
        init = init.at[:, 0].set(heads0.low_res_masks[:, 0])
        fwd, bank = ia.propagate(mdl, feats, pos, bank, 0, T,
                                 init_masks=init)
        f4 = [_per_obj(f[4], B) for f in feats]
        heads4, bank = ia.add_point_prompt(
            mdl, f4, pos[-1], bank, 4, jnp.asarray(c4),
            jnp.asarray(l4.astype(np.int32)), T, cond_slot=None,
            prev_mask_logits=fwd.low_res_masks[:, 4][..., None])
        bank = ia.clear_non_cond_mem_around(mdl.cfg, bank, jnp.asarray(4))
        timeline = fwd.low_res_masks.at[:, 4].set(heads4.low_res_masks[:, 0])
        pinned = jnp.zeros((T,), bool).at[4].set(True)
        out, _ = ia.propagate(mdl, feats, pos, bank, 4, T, pinned=pinned,
                              init_masks=timeline, clear_non_cond=True)
        return out.low_res_masks

    got = np.asarray(model.apply(params, method=fn))
    np.testing.assert_allclose(got, sess.masks, atol=5e-3, rtol=5e-3)
