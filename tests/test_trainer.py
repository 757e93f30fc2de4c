"""Trainer runtime: loop + meters + checkpoint/resume; ReasonSeg and MeViS
validators; the per-epoch val_fn hook."""
import itertools
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoglamm_tpu.config import TrainConfig
from videoglamm_tpu.models import VideoGLaMM
from videoglamm_tpu.training import (create_train_state, make_optimizer,
                                     make_train_step)
from videoglamm_tpu.training.trainer import (Trainer, validate_reasonseg,
                                             ScalarLogger)

from test_videoglamm import CFG, make_batch


@pytest.mark.slow
def test_trainer_loop_and_resume(tmp_path):
    model = VideoGLaMM(CFG, dtype=jnp.float32)
    batch = make_batch(np.random.RandomState(0))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.PRNGKey(0), **jb)["params"]
    tcfg = TrainConfig(warmup_steps=1, total_steps=6)
    tx = make_optimizer(tcfg, params)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, tx))

    batches = itertools.repeat(jb)
    tr = Trainer(step, state, batches, steps_per_epoch=2, epochs=2,
                 log_dir=str(tmp_path / "logs"),
                 ckpt_dir=str(tmp_path / "ckpts"), log_every=1)
    final = tr.train()
    assert int(final.step) == 4
    assert os.path.exists(tmp_path / "logs" / "scalars.jsonl")

    # resume: fresh trainer restores epoch 2 state
    state2 = create_train_state(params, tx)
    tr2 = Trainer(step, state2, batches, steps_per_epoch=2, epochs=3,
                  log_dir=str(tmp_path / "logs"),
                  ckpt_dir=str(tmp_path / "ckpts"), log_every=1)
    assert tr2.resume()
    assert tr2.start_epoch == 2
    assert int(tr2.state.step) == 4
    final2 = tr2.train()
    assert int(final2.step) == 6


def test_validate_reasonseg_math(tmp_path):
    gt = np.zeros((2, 8, 8), np.int64)
    gt[0, :4] = 1
    # perfect prediction on sample 0; empty on an empty-gt sample
    def predict(sample):
        if sample == 0:
            return gt[0:1] == 1, gt[0:1]
        return np.zeros((1, 8, 8), bool), np.zeros((1, 8, 8), np.int64)

    giou, ciou = validate_reasonseg(predict, [0, 1],
                                    ScalarLogger(str(tmp_path)))
    assert giou == pytest.approx(1.0)   # IoU 1 + no-object convention 1
    assert ciou == pytest.approx(1.0)


def test_validate_mevis_math_and_dump(tmp_path):
    from videoglamm_tpu.training.trainer import validate_mevis
    T, H, W = 3, 8, 8
    gt = np.zeros((T, H, W), np.int64)
    gt[:, :4] = 1
    half = np.zeros((T, H, W), bool)
    half[:, :2] = True                  # IoU 0.5 on every frame

    def predict(sample):
        if sample == 0:
            return gt == 1, gt          # IoU 1
        return half, gt

    giou, ciou = validate_mevis(predict, [0, 1],
                                ScalarLogger(str(tmp_path)), epoch=0)
    assert giou == pytest.approx(0.75, abs=1e-3)
    # cIoU pools pixels: inter = 32T + 16T, union = 32T + 32T
    assert ciou == pytest.approx(48 / 64, abs=1e-3)

    # dump mode writes the benchmark PNG layout and returns None
    samples = [{"video": "vidZ", "exp_id": "0"}]
    out = validate_mevis(lambda s: (gt == 1, gt), samples,
                         save_masks_dir=str(tmp_path / "bench"))
    assert out is None
    files = sorted(os.listdir(tmp_path / "bench" / "vidZ" / "0"))
    assert files == [f"{t:05d}.png" for t in range(T)]
    from PIL import Image
    arr = np.asarray(Image.open(tmp_path / "bench" / "vidZ" / "0" /
                                "00000.png"))
    assert set(np.unique(arr)) <= {0, 255}


@pytest.mark.slow
def test_trainer_val_fn_hook(tmp_path):
    model = VideoGLaMM(CFG, dtype=jnp.float32)
    batch = make_batch(np.random.RandomState(0))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.PRNGKey(0), **jb)["params"]
    tcfg = TrainConfig(warmup_steps=1, total_steps=4)
    tx = make_optimizer(tcfg, params)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, tx))

    calls = []
    tr = Trainer(step, state, itertools.repeat(jb), steps_per_epoch=1,
                 epochs=2, log_dir=str(tmp_path / "logs"),
                 ckpt_dir=str(tmp_path / "ckpts"), log_every=1,
                 val_fn=lambda s, e, lg: calls.append((int(s.step), e)))
    tr.train()
    assert calls == [(1, 0), (2, 1)]
