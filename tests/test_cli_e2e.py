"""End-to-end CLI smoke tests on the tiny model: eval_gcg_infer,
eval_refer_infer, eval_grounding and train run their full main() with
monkeypatched model/tokenizer loading over synthetic data."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoglamm_tpu.models import VideoGLaMM

from test_data import FakeTokenizer
from test_videoglamm import CFG, make_batch


@pytest.fixture(scope="module")
def tiny_loadout():
    model = VideoGLaMM(CFG, dtype=jnp.float32)
    batch = make_batch(np.random.RandomState(0))
    params = model.init(jax.random.PRNGKey(0), **batch)
    tok = FakeTokenizer()
    tok.decode = lambda ids, **kw: " ".join(str(i) for i in ids)
    tok.eos_token_id = 3
    return model, params, tok


def _patch(monkeypatch, mod, tiny_loadout):
    model, params, tok = tiny_loadout
    monkeypatch.setattr(mod, "load_model",
                        lambda args, cfg=None: (model, params))
    monkeypatch.setattr(mod, "load_tokenizer", lambda path: tok)


def _save_img(path, arr):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def test_eval_gcg_infer_cli(tmp_path, monkeypatch, tiny_loadout):
    import videoglamm_tpu.cli.eval_gcg_infer as mod
    _patch(monkeypatch, mod, tiny_loadout)
    rng = np.random.RandomState(0)
    for t in range(3):
        _save_img(str(tmp_path / "data" / "vid0" / "frames" / f"{t}.jpg"),
                  rng.randint(0, 255, (30, 40, 3), np.uint8))
    json.dump({"caption": "a cat", "phrases": ["cat"]},
              open(tmp_path / "data" / "vid0" / "gt.json", "w"))
    mod.main(["--checkpoint", "x", "--tokenizer", "x",
              "--data_root", str(tmp_path / "data"),
              "--save_dir", str(tmp_path / "out"),
              "--max_new_tokens", "4"])
    res = json.load(open(tmp_path / "out" / "vid0" / "res.json"))
    assert "pred_text" in res and res["gt_phrases"] == ["cat"]


def test_eval_refer_infer_cli(tmp_path, monkeypatch, tiny_loadout):
    import videoglamm_tpu.cli.eval_refer_infer as mod
    _patch(monkeypatch, mod, tiny_loadout)
    rng = np.random.RandomState(1)
    for t in range(2):
        _save_img(str(tmp_path / "d" / "JPEGImages" / "v1" / f"{t:05d}.jpg"),
                  rng.randint(0, 255, (24, 32, 3), np.uint8))
    meta = {"videos": {"v1": {"expressions": {"0": {"exp": "the dog"}},
                              "frames": ["00000", "00001"]}}}
    json.dump(meta, open(tmp_path / "d" / "meta_expressions.json", "w"))
    mod.main(["--checkpoint", "x", "--tokenizer", "x",
              "--data_root", str(tmp_path / "d"),
              "--save_dir", str(tmp_path / "out"),
              "--max_new_tokens", "4"])
    out = tmp_path / "out" / "v1" / "0"
    assert out.is_dir() and len(list(out.glob("*.png"))) > 0


def test_eval_grounding_cli(tmp_path, monkeypatch, tiny_loadout):
    import videoglamm_tpu.cli.eval_grounding as mod
    _patch(monkeypatch, mod, tiny_loadout)
    rng = np.random.RandomState(2)
    fdir = tmp_path / "frames"
    for t in range(3):
        _save_img(str(fdir / f"{t}.jpg"),
                  rng.randint(0, 255, (20, 20, 3), np.uint8))
    anns = [{"vid": "v", "qtype": "declarative",
             "question": "who is walking",
             "frames_dir": str(fdir), "gt_sted": [0, 2],
             "gt_boxes": {"0": [1, 1, 9, 9], "1": [1, 1, 9, 9]}}]
    json.dump(anns, open(tmp_path / "ann.json", "w"))
    summary = mod.main(["--checkpoint", "x", "--tokenizer", "x",
                        "--annotations", str(tmp_path / "ann.json"),
                        "--max_new_tokens", "4"])
    assert "declarative" in summary
    assert "gt_viou" in summary["declarative"]


def test_eval_anet_cli(tmp_path, monkeypatch, tiny_loadout):
    import videoglamm_tpu.cli.eval_anet_entities_infer as mod
    _patch(monkeypatch, mod, tiny_loadout)
    rng = np.random.RandomState(3)
    fdir = tmp_path / "frames"
    for t in range(5):
        _save_img(str(fdir / f"{t}.jpg"),
                  rng.randint(0, 255, (20, 20, 3), np.uint8))
    anns = [{"vid": "v", "frames_dir": str(fdir), "phrase": "a person",
             "segment": [0.2, 0.8]}]
    json.dump(anns, open(tmp_path / "ann.json", "w"))
    mod.main(["--checkpoint", "x", "--tokenizer", "x",
              "--annotations", str(tmp_path / "ann.json"),
              "--save_dir", str(tmp_path / "out"),
              "--max_new_tokens", "4"])
    assert (tmp_path / "out" / "results.json").exists()
