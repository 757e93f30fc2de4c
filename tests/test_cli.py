"""CLI layer: metrics CLIs end-to-end on synthetic predictions, and the chat
pipeline wired through run_once on the tiny model with a fake tokenizer."""
import json
import os

import numpy as np
import pytest

from videoglamm_tpu.cli.eval_gcg_metrics import main as gcg_metrics_main
from videoglamm_tpu.cli.eval_referdavis_metrics import evaluate as davis_eval

from test_data import FakeTokenizer
from test_videoglamm import CFG, make_batch


def _save_mask(path, m):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((m * 255).astype(np.uint8)).save(path)


def test_referdavis_metrics_perfect(tmp_path):
    rng = np.random.RandomState(0)
    for vid in ["dog", "cat"]:
        m = rng.rand(4, 32, 32) > 0.6
        for t in range(4):
            _save_mask(str(tmp_path / "pred" / vid / "0" / f"{t:05d}.png"),
                       m[t])
            _save_mask(str(tmp_path / "gt" / vid / "0" / f"{t:05d}.png"),
                       m[t])
    res = davis_eval(str(tmp_path / "pred"), str(tmp_path / "gt"))
    assert res["n_sequences"] == 2
    assert res["J&F"] == pytest.approx(1.0)
    assert res["J-mean"] == pytest.approx(1.0)
    assert res["F-mean"] == pytest.approx(1.0)


def test_referdavis_metrics_imperfect(tmp_path):
    m = np.zeros((2, 32, 32), bool)
    m[:, 8:24, 8:24] = True
    shifted = np.roll(m, 4, axis=1)
    for t in range(2):
        _save_mask(str(tmp_path / "pred" / "v" / "0" / f"{t}.png"),
                   shifted[t])
        _save_mask(str(tmp_path / "gt" / "v" / "0" / f"{t}.png"), m[t])
    res = davis_eval(str(tmp_path / "pred"), str(tmp_path / "gt"))
    assert 0.0 < res["J-mean"] < 1.0


def test_gcg_metrics_cli(tmp_path, capsys):
    rng = np.random.RandomState(1)
    for vid in ["a", "b"]:
        masks = {str(i): rng.rand(2, 16, 16) > 0.5 for i in range(2)}
        for obj, tube in masks.items():
            for t in range(2):
                _save_mask(str(tmp_path / "pred" / vid / "pred_masks" / obj
                               / f"{t}.png"), tube[t])
                _save_mask(str(tmp_path / "gt" / vid / "gt_masks" / obj
                               / f"{t}.png"), tube[t])
        res = {"gt_text": "a red car drives", "pred_text": "a red car drives",
               "pred_text_cleaned": "a red car drives",
               "gt_phrases": ["red car", "road"],
               "pred_phrases": ["red car", "road"]}
        os.makedirs(tmp_path / "pred" / vid, exist_ok=True)
        json.dump(res, open(tmp_path / "pred" / vid / "res.json", "w"))

    out = gcg_metrics_main(["--pred_root", str(tmp_path / "pred"),
                            "--gt_root", str(tmp_path / "gt")])
    assert out["miou"] == pytest.approx(1.0)
    assert out["recall"] == pytest.approx(1.0)


@pytest.mark.slow
def test_chat_run_once_tiny():
    import jax
    import jax.numpy as jnp
    from videoglamm_tpu.cli.chat import run_once
    from videoglamm_tpu.data.conversation import ConvGenerator
    from videoglamm_tpu.inference import GroundedInference
    from videoglamm_tpu.models import VideoGLaMM

    model = VideoGLaMM(CFG, dtype=jnp.float32)
    batch = make_batch(np.random.RandomState(0))
    params = model.init(jax.random.PRNGKey(0), **batch)
    pipe = GroundedInference(model, params, max_new_tokens=4, eos_id=3)
    tok = FakeTokenizer()
    tok.decode = lambda ids, **kw: " ".join(str(i) for i in ids)
    conv = ConvGenerator("phi3")

    T = CFG.num_frames
    frames = [np.random.RandomState(t).randint(0, 255, (40, 60, 3), np.uint8)
              for t in range(T)]
    text, masks, res = run_once(pipe, conv, tok, frames, "segment the cat",
                                "video", use_video_branch=False,
                                max_text_len=32)
    assert isinstance(text, str)
    assert masks.shape[1:] == (T, 40, 60)  # original-resolution tubes
