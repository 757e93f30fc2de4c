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
    MemoryBank, assemble_memory, init_bank, track_video)

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
    R = cfg.num_maskmem - 1
    P = cfg.max_obj_ptrs_in_encoder - 1
    split = cfg.d_model // cfg.mem_dim

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
    mem, pos, kv, nptr = run(1, np.full((B, R), -1), np.full((B, P), -1), 8)
    kv = np.asarray(kv)
    assert mem.shape[1] == (R + 1) * E2 + (P + 1) * split
    assert nptr == (P + 1) * split
    assert kv[:, :E2].all()                       # cond spatial
    assert not kv[:, E2:(R + 1) * E2].any()       # empty ring
    ptr_region = kv[:, (R + 1) * E2:]
    assert ptr_region[:, :split].all()            # cond ptr
    assert not ptr_region[:, split:].any()

    # t=9 with ring holding frames 3..8: all R slots valid (ages 1..6)
    mem_frames = np.tile(np.array([[3, 4, 5, 6, 7, 8]]), (B, 1))
    ptr_frames = np.tile(np.arange(1, P + 1)[None], (B, 1))
    _, _, kv, _ = run(9, mem_frames, ptr_frames, 32)
    kv = np.asarray(kv)
    spatial = kv[:, :(R + 1) * E2].reshape(B, R + 1, E2)
    assert spatial.all()
    # ptr ages = 9 - f; valid iff 1 <= age <= 15: frames 1..8 qualify,
    # frames 10..15 lie in the future (age < 1) -> masked
    ptr_region = kv[:, (R + 1) * E2:].reshape(B, P + 1, split)
    assert ptr_region[:, 0].all()                  # cond
    assert ptr_region[:, 1:9].all()                # frames 1..8
    assert not ptr_region[:, 9:].any()             # frames 9..15 invalid/future

    # short video: num_frames=4 caps obj ptrs at age <= 3
    mem_frames = np.tile(np.array([[1, 2, 3, -1, -1, -1]]), (B, 1))
    ptr_frames = np.full((B, P), -1)
    ptr_frames[:, 0] = 1   # age 3 at t=4? t=4: age=3 <= min(4,16)-1=3 ok
    _, _, kv, _ = run(4, mem_frames, ptr_frames, 4)
    kv = np.asarray(kv)
    spatial = kv[:, :(R + 1) * E2].reshape(B, R + 1, E2)
    assert spatial[:, 0].all() and spatial[:, 1:4].all()
    assert not spatial[:, 4:].any()
    ptr_region = kv[:, (R + 1) * E2:].reshape(B, P + 1, split)
    assert ptr_region[:, 0].all() and ptr_region[:, 1].all()


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
