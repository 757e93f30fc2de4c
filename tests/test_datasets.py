"""Dataset layer: RLE codec, GCG caption/mask building, ReferVOS, ReasonSeg
polygons, SemSeg, VQA, hybrid mixture -> collated batch -> model train step."""
import json
import os

import numpy as np
import pytest

from videoglamm_tpu.data.rle import rle_decode, rle_encode
from videoglamm_tpu.data.datasets import (DatasetSpec, GCGVideoDataset,
                                          HybridDataset, ReasonSegDataset,
                                          ReferVOSDataset, SampleBuilder,
                                          SemSegDataset, VQADataset)
from videoglamm_tpu.data.datasets.video_gcg import build_gcg_caption

from test_data import FakeTokenizer
from test_videoglamm import CFG


def _save_img(path, arr):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = rng.rand(13, 17) > 0.5
        assert (rle_decode(rle_encode(m)) == m).all()


def test_build_gcg_caption():
    cap = build_gcg_caption("a dog chases the cat", [1, 4])
    assert cap == "a <p> dog </p> [SEG] chases the <p> cat </p> [SEG]"


@pytest.fixture(scope="module")
def gcg_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("gcg")
    rng = np.random.RandomState(0)
    h, w, l = 24, 32, 3
    file_names = [f"v0/{t}.jpg" for t in range(l)]
    for f in file_names:
        _save_img(str(root / "frames" / f),
                  rng.randint(0, 255, (h, w, 3), np.uint8))
    m0 = np.zeros((h, w), bool)
    m0[2:10, 3:12] = True
    annotations = [{"id": 7, "segmentations": [rle_encode(m0), None,
                                               rle_encode(m0)]}]
    videos = [{
        "file_names": file_names, "width": w, "height": h, "length": l,
        "dense_cap": {"caption": "a dog runs fast", "token_pos": [1],
                      "mask_id": [7], "v_id2o_id": {}},
    }]
    json.dump({"videos": videos, "annotations": annotations},
              open(root / "train.json", "w"))
    return root


def test_gcg_dataset(gcg_root):
    ds = GCGVideoDataset(str(gcg_root / "train.json"),
                         str(gcg_root / "frames"), image_set="train",
                         max_num_frames=2)
    rec = ds[0]
    assert "<p> dog </p> [SEG]" in rec["sources"][0][1]["value"]
    assert rec["masks"][0].shape[0] == 1        # one object
    assert rec["masks"][0].dtype == bool
    # val mode returns all frames
    ds_val = GCGVideoDataset(str(gcg_root / "train.json"),
                             str(gcg_root / "frames"), image_set="val")
    rec = ds_val[0]
    assert len(rec["frames"]) == 3
    assert rec["masks"][0][0][0].any() and not rec["masks"][0][0][1].any()


@pytest.fixture(scope="module")
def mevis_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mevis")
    rng = np.random.RandomState(1)
    h, w, l = 20, 28, 2
    for t in range(l):
        _save_img(str(root / "JPEGImages" / "vid1" / f"{t:05d}.jpg"),
                  rng.randint(0, 255, (h, w, 3), np.uint8))
    m = np.zeros((h, w), bool)
    m[4:12, 5:20] = True
    mask_dict = {"55": [rle_encode(m), None]}
    json.dump(mask_dict, open(root / "mask_dict.json", "w"))
    meta = {"videos": {"vid1": {
        "expressions": {"0": {"exp": "the striped cat", "anno_id": [55]}},
        "frames": ["00000", "00001"]}}}
    json.dump(meta, open(root / "meta_expressions.json", "w"))
    return root


def test_refer_vos_dataset(mevis_root):
    ds = ReferVOSDataset(str(mevis_root))
    rec = ds[0]
    assert len(rec["sources"]) == 1
    q = rec["sources"][0][0]["value"]
    assert "the striped cat" in q
    assert rec["sources"][0][1]["value"].count("[SEG]") == 1
    assert rec["masks"][0].shape == (1, 2, 20, 28)
    assert rec["masks"][0][0, 0].any() and not rec["masks"][0][0, 1].any()


def test_reason_seg_dataset(tmp_path):
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (30, 40, 3), np.uint8)
    _save_img(str(tmp_path / "train" / "x.jpg"), img)
    anno = {"text": "the biggest object", "is_sentence": True,
            "shapes": [
                {"label": "target", "points": [[5, 5], [30, 5], [30, 20],
                                               [5, 20]]},
                {"label": "ignore_region", "points": [[0, 25], [10, 25],
                                                      [10, 29], [0, 29]]},
            ]}
    json.dump(anno, open(tmp_path / "train" / "x.json", "w"))
    ds = ReasonSegDataset(str(tmp_path), "train")
    rec = ds[0]
    m = rec["masks"][0][0, 0]
    assert (m == 1).sum() > 100
    assert (m == -1).sum() > 10          # ignore region
    assert "biggest object" in rec["sources"][0][0]["value"]


def test_sem_seg_dataset(tmp_path):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (16, 16, 3), np.uint8)
    label = np.zeros((16, 16), np.uint8)
    label[:8] = 1
    label[8:, :8] = 2
    _save_img(str(tmp_path / "img" / "a.jpg"), img)
    _save_img(str(tmp_path / "lab" / "a.png"), label)
    ds = SemSegDataset(str(tmp_path / "img"), str(tmp_path / "lab"),
                       ["wall", "sky"], label_offset=1)
    rec = ds[0]
    assert 1 <= len(rec["sources"]) <= 2
    names = {"wall", "sky"}
    assert any(n in rec["sources"][0][0]["value"] for n in names)
    assert rec["masks"][0].shape == (1, 1, 16, 16)


def test_vqa_dataset(tmp_path):
    rng = np.random.RandomState(4)
    _save_img(str(tmp_path / "media" / "p.jpg"),
              rng.randint(0, 255, (12, 12, 3), np.uint8))
    data = [{"image": "p.jpg",
             "conversations": [
                 {"from": "human", "value": "What is shown?"},
                 {"from": "gpt", "value": "Random noise."}]}]
    json.dump(data, open(tmp_path / "ann.json", "w"))
    ds = VQADataset(str(tmp_path / "ann.json"), str(tmp_path / "media"))
    rec = ds[0]
    assert "<image>" in rec["sources"][0][0]["value"]
    assert rec["masks"] is None


@pytest.mark.slow
def test_hybrid_to_train_step(gcg_root, mevis_root):
    """Full integration: hybrid mixture -> collate -> tiny-model step."""
    import jax
    import jax.numpy as jnp
    from videoglamm_tpu.config import TrainConfig
    from videoglamm_tpu.models import VideoGLaMM
    from videoglamm_tpu.training import (create_train_state, make_optimizer,
                                         make_train_step)

    tok = FakeTokenizer()
    builder = SampleBuilder(CFG, tok, max_text_len=64, num_frames_for_sam=2)
    hybrid = HybridDataset(
        [DatasetSpec("gcg", GCGVideoDataset(
            str(gcg_root / "train.json"), str(gcg_root / "frames"),
            max_num_frames=2), 1.0),
         DatasetSpec("refer_vos", ReferVOSDataset(str(mevis_root)), 1.0)],
        builder, samples_per_epoch=8)

    batch = next(hybrid.batches(batch_size=2, max_text_len=64))
    assert batch["frames"].shape[1] == CFG.num_frames
    assert batch["gt_masks"].shape[1] == CFG.max_seg_tokens

    # NOTE: FakeTokenizer ids don't include the model's seg_token_idx, so
    # rewrite answer [SEG] ids to the model's seg id for the step test
    seg_word = tok.vocab.get("[SEG]")
    ids = batch["input_ids"]
    seg_positions = (ids == seg_word) if seg_word else np.zeros_like(ids,
                                                                     bool)
    ids = np.where(seg_positions, CFG.seg_token_idx, ids)
    batch["input_ids"] = ids
    batch["labels"] = np.where(seg_positions, CFG.seg_token_idx,
                               batch["labels"])

    model = VideoGLaMM(CFG, dtype=jnp.float32)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.PRNGKey(0), **jb)["params"]
    tcfg = TrainConfig(warmup_steps=1, total_steps=4)
    tx = make_optimizer(tcfg, params)
    state = create_train_state(params, tx)
    step = make_train_step(model, tx)
    state, metrics = step(state, jb)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["mask_bce_loss"]) > 0


def test_temporal_grounding_dataset(tmp_path):
    rng = np.random.RandomState(5)
    d = tmp_path / "media" / "vidA"
    for t in range(6):
        _save_img(str(d / f"{t:03d}.jpg"),
                  rng.randint(0, 255, (16, 16, 3), np.uint8))
    txt = tmp_path / "charades.txt"
    txt.write_text("vidA 1.0 3.0##a person opens the door\n")
    from videoglamm_tpu.data.datasets import TemporalGroundingDataset
    ds = TemporalGroundingDataset.from_charades_sta(
        str(txt), str(tmp_path / "media"), max_num_frames=4)
    rec = ds[0]
    assert len(rec["frames"]) == 4
    a = rec["sources"][0][1]["value"]
    assert "frames:(" in a
    # span rescaled from 6 raw frames to 4: f in [floor(1*1), ceil(3*1)]
    # scaled by 4/6
    assert "frames:(0,2)" in a
    assert "temporally locate" in rec["sources"][0][0]["value"] or \
        "temporal" in rec["sources"][0][0]["value"]


def test_gcg_from_expressions(mevis_root):
    from videoglamm_tpu.data.datasets import (GCGFromExpressions,
                                              ReferVOSDataset)
    ds = GCGFromExpressions(ReferVOSDataset(str(mevis_root)))
    rec = ds[0]
    cap = rec["sources"][0][1]["value"]
    assert "<p> the striped cat </p> [SEG]" in cap
    assert rec["masks"][0].shape[0] == 1


def test_grandf_dataset(tmp_path):
    from videoglamm_tpu.data.rle import rle_encode
    from videoglamm_tpu.data.datasets import GranDfDataset
    rng = np.random.RandomState(6)
    _save_img(str(tmp_path / "img" / "z.jpg"),
              rng.randint(0, 255, (20, 20, 3), np.uint8))
    m = np.zeros((20, 20), bool)
    m[3:9, 3:9] = True
    anns = [{"image": "z.jpg", "caption": "A red ball on the grass",
             "groundings": {"red ball": [rle_encode(m)]}}]
    json.dump(anns, open(tmp_path / "ann.json", "w"))
    ds = GranDfDataset(str(tmp_path / "ann.json"), str(tmp_path / "img"))
    rec = ds[0]
    assert "<p> red ball </p> [SEG]" in rec["sources"][0][1]["value"]
    assert rec["masks"][0].shape == (1, 1, 20, 20)


def test_vidstg_dataset(tmp_path):
    from videoglamm_tpu.data.rle import rle_encode
    from videoglamm_tpu.data.datasets import VidSTGDataset
    rng = np.random.RandomState(7)
    fdir = tmp_path / "frames"
    for t in range(2):
        _save_img(str(fdir / f"{t}.jpg"),
                  rng.randint(0, 255, (14, 14, 3), np.uint8))
    m = np.zeros((14, 14), bool)
    m[2:6, 2:6] = True
    anns = [{"vid": "v", "frames_dir": str(fdir),
             "question": "the man in red", "qtype": "declarative",
             "mask_rles": [rle_encode(m), None]}]
    json.dump(anns, open(tmp_path / "ann.json", "w"))
    ds = VidSTGDataset(str(tmp_path / "ann.json"))
    rec = ds[0]
    assert rec["masks"][0].shape == (1, 2, 14, 14)
    assert rec["masks"][0][0, 0].any() and not rec["masks"][0][0, 1].any()


def test_refer_seg_dataset(tmp_path):
    from videoglamm_tpu.data.datasets import ReferSegDataset
    from videoglamm_tpu.data.rle import rle_encode
    rng = np.random.RandomState(8)
    _save_img(str(tmp_path / "img" / "r.jpg"),
              rng.randint(0, 255, (18, 22, 3), np.uint8))
    m = np.zeros((18, 22), bool)
    m[4:10, 6:16] = True
    anns = [{"image": "r.jpg", "height": 18, "width": 22,
             "refs": [
                 {"sentences": ["the left mug"], "segmentation": rle_encode(m)},
                 {"sentences": ["a polygon thing"],
                  "segmentation": [[2, 2, 12, 2, 12, 8, 2, 8]]},
             ]}]
    json.dump(anns, open(tmp_path / "ann.json", "w"))
    ds = ReferSegDataset(str(tmp_path / "ann.json"), str(tmp_path / "img"))
    rec = ds[0]
    assert len(rec["sources"]) == 2
    assert rec["masks"][0].shape == (1, 1, 18, 22)
    assert rec["masks"][0].sum() == m.sum()
    assert rec["masks"][1].sum() > 0   # polygon rasterized


def test_grounded_video_qa(tmp_path):
    from videoglamm_tpu.data.datasets import (GroundedVideoQADataset,
                                              normalize_seg_answer)
    from videoglamm_tpu.data.rle import rle_encode
    txt, order = normalize_seg_answer("The dog [SEG:1] bites the ball [SEG:0].")
    assert txt == "The dog [SEG] bites the ball [SEG]."
    assert order == [1, 0]

    rng = np.random.RandomState(9)
    fdir = tmp_path / "f"
    for t in range(3):
        _save_img(str(fdir / f"{t}.jpg"),
                  rng.randint(0, 255, (10, 10, 3), np.uint8))
    m = np.zeros((10, 10), bool)
    m[2:5, 2:5] = True
    anns = [{"video_id": "v", "frames_dir": str(fdir),
             "question": "What bites what?",
             "answer": "The dog [SEG:0] bites the ball [SEG:1].",
             "seg_token_to_obj": {
                 "[SEG:0]": {"frame_id": 1, "rle": rle_encode(m)},
                 "[SEG:1]": {"frame_id": 2, "rle": rle_encode(m)}}}]
    json.dump(anns, open(tmp_path / "ann.json", "w"))
    ds = GroundedVideoQADataset(str(tmp_path / "ann.json"))
    rec = ds[0]
    assert rec["sources"][0][1]["value"].count("[SEG]") == 2
    tubes = rec["masks"][0]
    assert tubes.shape == (2, 3, 10, 10)
    assert (tubes[0, 1] == 1).any() and (tubes[0, 0] == -1).all()


def test_sam_augmentations():
    from videoglamm_tpu.data.augment import apply_sam_augmentations
    rng = np.random.RandomState(10)
    frames = rng.rand(3, 32, 32, 3).astype(np.float32)
    masks = (rng.rand(2, 3, 32, 32) > 0.5).astype(np.float32)
    f2, m2 = apply_sam_augmentations(frames, masks, t_train=5,
                                     rng=np.random.RandomState(0))
    assert f2.shape == (5, 32, 32, 3)
    assert m2.shape == (2, 5, 32, 32)
    assert set(np.unique(m2)) <= {0.0, 1.0}   # masks stay binary


def test_clair_with_stub_judge():
    from videoglamm_tpu.evals import clair_metric
    judge = lambda prompt: '{"score": 80, "reason": "similar content"}'
    out = clair_metric([["a dog runs"]], [["a dog is running"]], judge)
    assert out["clair"] == 0.8 and out["n_scored"] == 1
