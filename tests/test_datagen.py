"""GCG datagen pipeline: {obj_} tag parsing and end-to-end record building
consumable by GCGVideoDataset."""
import json
import os

import numpy as np
import pytest

from videoglamm_tpu.datagen import (GCGAnnotationPipeline, StubLLM,
                                    parse_dense_caption)
from videoglamm_tpu.data.rle import rle_encode


def test_parse_dense_caption():
    d = parse_dense_caption("A dog {obj_0} chases the cat{obj_1} outside.")
    assert d["caption"] == "A dog chases the cat outside."
    assert d["token_pos"] == [1, 4]
    assert d["mask_id"] == [0, 1]


def test_pipeline_to_dataset(tmp_path):
    from PIL import Image
    from videoglamm_tpu.data.datasets import GCGVideoDataset

    rng = np.random.RandomState(0)
    h, w, l = 16, 20, 2
    file_names = [f"v/{t}.jpg" for t in range(l)]
    for f in file_names:
        p = tmp_path / "frames" / f
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(p)

    pipe = GCGAnnotationPipeline(StubLLM())
    meta = {"file_names": file_names, "width": w, "height": h, "length": l}
    objects = [{"id": 11, "cls": "dog"}, {"id": 12, "cls": "cat"}]
    record = pipe.annotate_video(meta, objects, frames=[])
    assert record["dense_cap"]["mask_id"] == [11, 12]
    assert len(record["dense_cap"]["token_pos"]) == 2

    m = np.zeros((h, w), bool)
    m[2:8, 2:8] = True
    ann = {"videos": [record],
           "annotations": [{"id": 11, "segmentations": [rle_encode(m)] * l},
                           {"id": 12, "segmentations": [None, rle_encode(m)]}]}
    json.dump(ann, open(tmp_path / "train.json", "w"))
    ds = GCGVideoDataset(str(tmp_path / "train.json"),
                         str(tmp_path / "frames"), image_set="val")
    rec = ds[0]
    assert rec["sources"][0][1]["value"].count("[SEG]") == 2
    assert rec["masks"][0].shape[0] == 2


@pytest.fixture(scope="module")
def segmenter():
    """Tiny SAM-2 box segmenter (random weights — geometry only)."""
    import jax
    import jax.numpy as jnp
    from videoglamm_tpu.config import SAM2Config
    from videoglamm_tpu.datagen.mask_extract import Sam2BoxSegmenter
    from videoglamm_tpu.models.sam2.sam2_base import SAM2Base
    cfg = SAM2Config.tiny()
    model = SAM2Base(cfg, dtype=jnp.float32)
    imgs = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    text = jnp.zeros((1, 1, cfg.d_model))
    params = model.init(jax.random.PRNGKey(0), imgs, text)
    return Sam2BoxSegmenter(model, params)


def _img(rng, h=40, w=48):
    return rng.randint(0, 255, (h, w, 3), np.uint8)


def test_sam2_box_segmenter_shapes(segmenter):
    rng = np.random.RandomState(0)
    frame = _img(rng)
    masks = segmenter(frame, [[5, 5, 30, 25], [10, 10, 40, 35]])
    assert masks.shape == (2, 40, 48)
    assert masks.dtype == bool


def test_extract_anet_gcg_masks_pipeline(segmenter, tmp_path):
    """Synthetic video+boxes -> mask extraction -> the ANet GCG dataset
    loads the result (VERDICT: datagen completeness)."""
    from PIL import Image
    from videoglamm_tpu.data.datasets import ANetEntitiesGCGDataset
    from videoglamm_tpu.datagen.mask_extract import extract_anet_gcg_masks
    rng = np.random.RandomState(1)
    root = tmp_path / "anet"
    vid, seg = "v_x1", "0"
    fdir = root / "video_frames" / vid / seg
    os.makedirs(fdir)
    for t in range(3):
        Image.fromarray(_img(rng)).save(fdir / f"{t:02d}.jpg")
    ann = {"refined_caption": "A cat [SEG:0] naps near a dog [SEG:1].",
           "seg_token_to_obj": {
               "[SEG:0]": {"frame_id": 0, "bbox": [2, 2, 20, 18]},
               "[SEG:1]": {"frame_id": 2, "bbox": [10, 8, 44, 36]}}}
    os.makedirs(root / "anns")
    json.dump(ann, open(root / "anns" / f"{vid}____{seg}.json", "w"))

    n = extract_anet_gcg_masks(segmenter, str(root))
    assert n == 2
    assert (root / "masks" / f"{vid}____{seg}" / "00" / "mask.png").exists()
    # idempotent unless overwrite
    assert extract_anet_gcg_masks(segmenter, str(root)) == 0

    ds = ANetEntitiesGCGDataset(str(root))
    rec = ds[0]
    assert rec["masks"][0].shape[0] == 2
    assert rec["sources"][0][1]["value"].count("[SEG]") == 2


def test_extract_vidstg_gcg_masks_pipeline(segmenter, tmp_path):
    from PIL import Image
    from videoglamm_tpu.data.datasets import VidSTGHCSTVGGCGDataset
    from videoglamm_tpu.datagen.mask_extract import extract_vidstg_gcg_masks
    rng = np.random.RandomState(2)
    root = tmp_path
    vdir = root / "vidstg_gcg" / "train" / "vidQ"
    os.makedirs(vdir / "frames")
    frames = [f"{t:04d}.png" for t in range(2)]
    for f in frames:
        Image.fromarray(_img(rng)).save(vdir / "frames" / f)
    boxes = {"1": {frames[0]: [3, 3, 25, 20], frames[1]: None}}
    json.dump(boxes, open(vdir / "boxes.json", "w"))
    cdir = root / "vidstg_gcg" / "train_captions"
    os.makedirs(cdir)
    json.dump({"caption": "[the cat](1) sleeps."},
              open(cdir / "vidQ.json", "w"))

    n = extract_vidstg_gcg_masks(segmenter, str(root))
    assert n == 2
    ds = VidSTGHCSTVGGCGDataset(str(root), "train", "vidstg")
    rec = ds[0]
    assert rec["masks"][0].shape == (1, 2, 40, 48)
    assert not rec["masks"][0][0, 1].any()     # null box -> empty mask


def test_merge_gcg_annotations(tmp_path):
    from videoglamm_tpu.data.rle import rle_encode
    from videoglamm_tpu.datagen.mask_extract import merge_gcg_annotations
    m = np.zeros((8, 8), bool)
    m[:4] = True

    def inst(vid_name, ann_id):
        return {
            "videos": [{"file_names": [f"{vid_name}/0.jpg"], "width": 8,
                        "height": 8, "length": 1,
                        "dense_cap": {"caption": "a cat", "token_pos": [1],
                                      "mask_id": [ann_id],
                                      "v_id2o_id": {"0": ann_id}}}],
            "annotations": [{"id": ann_id,
                             "segmentations": [rle_encode(m)]}],
        }

    p1, p2 = tmp_path / "a.json", tmp_path / "b.json"
    json.dump(inst("va", 3), open(p1, "w"))
    json.dump(inst("vb", 3), open(p2, "w"))
    merged = merge_gcg_annotations(
        [str(p1), str(p2)], out_json=str(tmp_path / "m.json"))
    assert len(merged["videos"]) == 2
    ids = [a["id"] for a in merged["annotations"]]
    assert len(set(ids)) == 2                      # re-offset, no collision
    for video in merged["videos"]:
        mid = video["dense_cap"]["mask_id"][0]
        assert mid in ids                          # references stay valid

    # skip list drops a video
    merged2 = merge_gcg_annotations([str(p1), str(p2)],
                                    skip_videos={str(p2): [0]})
    assert len(merged2["videos"]) == 1

    # merged file loads through GCGVideoDataset
    from videoglamm_tpu.data.datasets import GCGVideoDataset
    from PIL import Image
    rng = np.random.RandomState(3)
    for name in ("va", "vb"):
        os.makedirs(tmp_path / "frames" / name, exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (8, 8, 3), np.uint8)).save(
            tmp_path / "frames" / name / "0.jpg")
    ds = GCGVideoDataset(str(tmp_path / "m.json"), str(tmp_path / "frames"),
                         image_set="val")
    assert len(ds) == 2
    rec = ds[1]
    assert rec["masks"][0].sum() > 0
