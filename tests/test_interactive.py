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
