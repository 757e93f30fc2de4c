"""SAM-2 video predictor: memory-bank assembly logic, scan propagation,
composite track_masks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoglamm_tpu.config import SAM2Config, VideoGLaMMConfig
from videoglamm_tpu.models import VideoGLaMM
from videoglamm_tpu.models.sam2.sam2_base import SAM2Base
from videoglamm_tpu.models.sam2.video_predictor import (
    MemoryBank, assemble_memory, init_bank, num_mem_slots, track_video)

from test_videoglamm import CFG, make_batch

SCFG = CFG.sam2


@pytest.fixture(scope="module")
def sam_and_params():
    model = SAM2Base(SCFG, dtype=jnp.float32)
    imgs = jnp.zeros((1, SCFG.image_size, SCFG.image_size, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)
    return model, params


def test_assemble_memory_mask_logic(sam_and_params):
    model, params = sam_and_params
    cfg = SCFG
    B = 2
    E2 = cfg.low_res_size ** 2
    M = cfg.num_maskmem - 1          # non-cond memory blocks in the output
    S = num_mem_slots(cfg)           # ring slots (== M at stride r=1)
    P = cfg.max_obj_ptrs_in_encoder - 1
    split = cfg.d_model // cfg.mem_dim

    def place(frames, n_slots):
        """Key each held frame into its ring slot (frame % n_slots)."""
        arr = np.full((B, n_slots), -1)
        for f in frames:
            arr[:, f % n_slots] = f
        return arr

    def run(t, mem_frames, ptr_frames, num_frames):
        def fn(mdl):
            bank = init_bank(mdl, B,
                             jnp.zeros((B, E2, cfg.mem_dim)),
                             jnp.zeros((B, cfg.d_model)),
                             jnp.zeros((E2, cfg.mem_dim)))
            bank = bank._replace(
                mem_frame=jnp.asarray(mem_frames, jnp.int32),
                ptr_frame=jnp.asarray(ptr_frames, jnp.int32))
            return assemble_memory(mdl, bank, jnp.asarray(t), num_frames)
        return model.apply(params, method=fn)

    # t=1: no non-cond memory yet -> only cond block + cond ptr valid
    mem, pos, kv, nptr = run(1, np.full((B, S), -1), np.full((B, P), -1), 8)
    kv = np.asarray(kv)
    assert mem.shape[1] == (M + 1) * E2 + (P + 1) * split
    assert nptr == (P + 1) * split
    assert kv[:, :E2].all()                       # cond spatial
    assert not kv[:, E2:(M + 1) * E2].any()       # empty ring
    ptr_region = kv[:, (M + 1) * E2:]
    assert ptr_region[:, :split].all()            # cond ptr
    assert not ptr_region[:, split:].any()

    # t=9 with ring holding frames 3..8: every wanted frame (8,7,..,3 at
    # t_rel 1..6) present -> all M blocks valid
    mem_frames = place(range(3, 9), S)
    ptr_frames = place(range(1, 9), P)
    _, _, kv, _ = run(9, mem_frames, ptr_frames, 32)
    kv = np.asarray(kv)
    spatial = kv[:, :(M + 1) * E2].reshape(B, M + 1, E2)
    assert spatial.all()
    # ptr block j>=1 wants frame t-j: frames 8..1 held -> diffs 1..8 valid,
    # diffs 9..15 want frames 0..-6 (cond/negative) -> masked
    ptr_region = kv[:, (M + 1) * E2:].reshape(B, P + 1, split)
    assert ptr_region[:, 0].all()                  # cond
    assert ptr_region[:, 1:9].all()                # frames 8..1
    assert not ptr_region[:, 9:].any()

    # stale slot: ring holds frame 2 where frame 8 (= 2 + S at r=1) should
    # live -> the equality gather must mask it out
    mem_frames = place([2, *range(3, 8)], S)
    _, _, kv, _ = run(9, mem_frames, ptr_frames, 32)
    spatial = np.asarray(kv)[:, :(M + 1) * E2].reshape(B, M + 1, E2)
    assert not spatial[:, 1].any()                 # t_rel 1 wants 8, holds 2
    assert spatial[:, 2:].all()                    # 7..3 still valid

    # short video: num_frames=4 caps obj ptrs at diff <= min(4,16)-1 = 3
    mem_frames = place([1, 2, 3], S)
    ptr_frames = place([1], P)
    _, _, kv, _ = run(4, mem_frames, ptr_frames, 4)
    kv = np.asarray(kv)
    spatial = kv[:, :(M + 1) * E2].reshape(B, M + 1, E2)
    assert spatial[:, 0].all() and spatial[:, 1:4].all()
    assert not spatial[:, 4:].any()
    ptr_region = kv[:, (M + 1) * E2:].reshape(B, P + 1, split)
    assert ptr_region[:, 0].all()
    assert ptr_region[:, 3].all()                  # diff 3 -> frame 1
    assert not ptr_region[:, 1:3].any() and not ptr_region[:, 4:].any()


def test_track_video_shapes(sam_and_params):
    model, params = sam_and_params
    cfg = SCFG
    B, T = 2, 4
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(T, cfg.image_size, cfg.image_size, 3),
                       jnp.float32)

    def fn(mdl):
        feats, pos = mdl.forward_image(imgs)
        # feats stay [T, h, w, c]; track_video broadcasts per object
        text = jnp.asarray(rng.randn(B, 1, cfg.d_model), jnp.float32)
        return track_video(mdl, feats, pos, text)

    res = model.apply(params, method=fn)
    E4 = cfg.low_res_size * 4
    assert res.low_res_masks.shape == (B, T, E4, E4)
    assert res.ious.shape == (B, T)
    assert np.isfinite(np.asarray(res.low_res_masks)).all()
    # different text prompts must propagate to the outputs (with random
    # params the object-score gate may clamp masks to NO_OBJ_SCORE, so
    # check the ungated IoU head instead)
    assert not np.allclose(np.asarray(res.ious)[0], np.asarray(res.ious)[1])


@pytest.mark.slow
def test_composite_track_masks():
    model = VideoGLaMM(CFG, dtype=jnp.float32)
    batch = make_batch(np.random.RandomState(0))
    params = model.init(jax.random.PRNGKey(0), **batch)
    T = 3
    rng = np.random.RandomState(1)
    frames_sam = jnp.asarray(
        rng.randn(T, SCFG.image_size, SCFG.image_size, 3), jnp.float32)
    seg = jnp.asarray(rng.randn(CFG.max_seg_tokens, CFG.out_dim), jnp.float32)
    masks = model.apply(params, frames_sam, seg,
                        method=lambda mdl, f, s: mdl.track_masks(f, s))
    E4 = SCFG.low_res_size * 4
    assert masks.shape == (CFG.max_seg_tokens, T, E4, E4)
    assert np.isfinite(np.asarray(masks)).all()
