"""GCG datagen pipeline: {obj_} tag parsing and end-to-end record building
consumable by GCGVideoDataset."""
import json

import numpy as np

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
