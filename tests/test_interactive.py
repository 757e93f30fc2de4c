"""Interactive predictor unit tests (shapes, session bookkeeping, cond
selection) — fast, no torch oracle; golden parity lives in
test_interactive_golden.py."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoglamm_tpu.config import SAM2Config
from videoglamm_tpu.models.sam2.sam2_base import SAM2Base
from videoglamm_tpu.models.sam2.interactive import (SAM2InteractivePredictor,
                                                    select_cond_frames)

SCFG = SAM2Config.tiny()


@pytest.fixture(scope="module")
def sam_and_params():
    model = SAM2Base(SCFG, dtype=jnp.float32)
    imgs = jnp.zeros((1, SCFG.image_size, SCFG.image_size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)
    return model, params


def test_select_cond_frames_matches_reference_semantics():
    """Static selection == reference select_closest_cond_frames
    (sam2_utils.py:15-57) on randomized layouts (ties compared by distance
    multiset: the reference's tie order depends on dict insertion order)."""
    def ref_select(frame_idx, conds, cap):
        if cap == -1 or len(conds) <= cap:
            return set(conds)
        sel = set()
        before = [t for t in conds if t < frame_idx]
        after = [t for t in conds if t >= frame_idx]
        if before:
            sel.add(max(before))
        if after:
            sel.add(min(after))
        remain = cap - len(sel)
        sel |= set(sorted((t for t in conds if t not in sel),
                          key=lambda x: abs(x - frame_idx))[:remain])
        return sel

    import random
    random.seed(0)
    for _ in range(200):
        K = 5
        n = random.randint(0, K)
        conds = sorted(random.sample(range(12), n))
        cf = np.full(K, -1, np.int32)
        cf[:n] = conds
        t = random.randint(0, 11)
        cap = random.choice([-1, 2, 3, 4, 6])
        sel = np.asarray(select_cond_frames(jnp.asarray(cf), t, cap))
        got = {int(f) for f, s in zip(cf, sel) if s}
        want = ref_select(t, conds, cap)
        gd = sorted(abs(f - t) for f in got)
        wd = sorted(abs(f - t) for f in want)
        assert gd == wd, (conds, t, cap, got, want)


def test_session_point_prompt_and_propagate(sam_and_params):
    model, params = sam_and_params
    T, B, S = 4, 2, SCFG.image_size
    rng = np.random.RandomState(0)
    frames = rng.randn(T, S, S, 3).astype(np.float32)
    sess = SAM2InteractivePredictor(model, params, frames, num_objects=B)

    coords = (rng.rand(B, 1, 2) * S).astype(np.float32)
    labels = np.ones((B, 1), np.int32)
    m1 = sess.add_new_points(1, coords, labels)
    E4 = 4 * (S // 16)
    assert m1.shape == (B, E4, E4)
    assert sess.cond_frames == {1: 0}

    out = sess.propagate_in_video()                      # forward from 1
    assert out.shape == (B, T, E4, E4)
    assert np.isfinite(np.asarray(out[:, 1:])).all()
    # frames before the start keep the untouched placeholder
    assert (np.asarray(out[:, 0]) <= -1e3).all()

    back = sess.propagate_in_video(start_frame_idx=1, reverse=True)
    assert np.isfinite(np.asarray(back)).all()

    # refinement on a tracked frame stores non-cond (no new cond slot)
    sess.add_new_points(2, coords, np.zeros((B, 1), np.int32))
    assert sess.cond_frames == {1: 0}
    assert 2 in sess.pinned

    sess.reset_state()
    assert sess.cond_frames == {} and sess.pinned == set()
    with pytest.raises(RuntimeError):
        sess.propagate_in_video()


def test_session_mask_and_box_prompts(sam_and_params):
    model, params = sam_and_params
    T, B, S = 3, 1, SCFG.image_size
    rng = np.random.RandomState(1)
    frames = rng.randn(T, S, S, 3).astype(np.float32)
    sess = SAM2InteractivePredictor(model, params, frames, num_objects=B)

    mask = np.zeros((B, S, S), np.float32)
    mask[:, 8:24, 8:24] = 1.0
    m = sess.add_new_mask(0, mask)
    E4 = 4 * (S // 16)
    assert m.shape == (B, E4, E4)
    # use_mask_as_output: the prompt IS the output (+-10 logits)
    got = np.asarray(m[0])
    assert (got.max() > 5) and (got.min() < -5)

    sess.reset_state()
    boxes = np.array([[4.0, 4.0, 28.0, 28.0]], np.float32)
    mb = sess.add_new_box(1, boxes)
    assert mb.shape == (B, E4, E4)
    out = sess.propagate_in_video()
    assert out.shape == (B, T, E4, E4)


def test_non_overlapping_constraints():
    """Winner-takes-all across the object axis with suppressed scores
    clamped to <= -10 (reference sam2_base.py:815-833)."""
    from videoglamm_tpu.models.sam2.interactive import \
        apply_non_overlapping_constraints
    rng = np.random.RandomState(0)
    m = rng.randn(3, 1, 8, 8).astype(np.float32) * 8
    out = np.asarray(apply_non_overlapping_constraints(jnp.asarray(m)))
    win = np.argmax(m, axis=0)                     # [1, 8, 8]
    for b in range(3):
        is_win = win[0] == b                       # [8, 8]
        np.testing.assert_array_equal(out[b, 0][is_win], m[b, 0][is_win])
        assert (out[b, 0][~is_win] <= -10.0 + 1e-6).all()
        # already-below scores pass through unclamped
        low = ~is_win & (m[b, 0] < -10.0)
        np.testing.assert_array_equal(out[b, 0][low], m[b, 0][low])
    # single object: identity
    np.testing.assert_array_equal(
        np.asarray(apply_non_overlapping_constraints(jnp.asarray(m[:1]))),
        m[:1])


def test_clear_non_cond_mem_session(sam_and_params):
    """Refinement click with clear_non_cond_mem_around_input drops every
    non-cond memory in +-(r * num_maskmem) — including the refinement's
    own just-written output — while cond slots survive
    (reference preflight, sam2_video_predictor.py:709-714, 1044-1061)."""
    model, params = sam_and_params
    T, B, S = 4, 1, SCFG.image_size
    rng = np.random.RandomState(2)
    frames = rng.randn(T, S, S, 3).astype(np.float32)
    sess = SAM2InteractivePredictor(
        model, params, frames, num_objects=B,
        clear_non_cond_mem_around_input=True)
    coords = (rng.rand(B, 1, 2) * S).astype(np.float32)
    sess.add_new_points(0, coords, np.ones((B, 1), np.int32))
    sess.propagate_in_video()
    assert (np.asarray(sess.bank.mem_frame)[1:] >= 0).all()
    sess.add_new_points(2, coords, np.zeros((B, 1), np.int32))
    # window covers the whole tiny timeline (r=1, num_maskmem=7)
    assert (np.asarray(sess.bank.mem_frame) == -1).all()
    assert (np.asarray(sess.bank.ptr_frame) == -1).all()
    assert int(sess.bank.cond_frame[0]) == 0          # cond slot untouched
    out = sess.propagate_in_video(start_frame_idx=2)  # still tracks
    assert np.isfinite(np.asarray(out[:, 2:])).all()


def test_to_video_res_non_overlap(sam_and_params):
    model, params = sam_and_params
    T, B, S = 3, 2, SCFG.image_size
    rng = np.random.RandomState(3)
    frames = rng.randn(T, S, S, 3).astype(np.float32)
    sess = SAM2InteractivePredictor(model, params, frames, num_objects=B,
                                    non_overlap_masks=True)
    coords = (rng.rand(B, 1, 2) * S).astype(np.float32)
    sess.add_new_points(0, coords, np.ones((B, 1), np.int32))
    sess.propagate_in_video()
    vid = np.asarray(sess.to_video_res((37, 53)))
    assert vid.shape == (B, T, 37, 53)
    # the constraint's contract: at most one object above the -10
    # suppression floor at any location
    assert ((vid > -10.0).sum(axis=0) <= 1).all()
