"""Round-2 data-layer breadth: native REFER/G_REFER databases, PACO/
pascal-part COCO-json parts, Mapillary/COCO-Stuff class loaders,
ANet-Entities GCG, VidSTG/HCSTVG GCG, A2D/JHMDB eval loaders — each over
synthetic fixtures, and all train formats registered in a HybridDataset
mixture."""
import json
import os
import pickle

import numpy as np
import pytest

from videoglamm_tpu.data.rle import rle_encode

from test_data import FakeTokenizer
from test_videoglamm import CFG


def _save_img(path, arr):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


# ---------------------------------------------------------------- REFER --

@pytest.fixture(scope="module")
def refer_root(tmp_path_factory):
    """refcoco-style database: refs(unc).p + instances.json + images."""
    root = tmp_path_factory.mktemp("refer")
    rng = np.random.RandomState(3)
    h, w = 20, 26
    img_dir = root / "images" / "mscoco" / "images" / "train2014"
    _save_img(str(img_dir / "COCO_train2014_000000000001.jpg"),
              rng.randint(0, 255, (h, w, 3), np.uint8))

    m = np.zeros((h, w), bool)
    m[3:9, 4:14] = True
    instances = {
        "images": [{"id": 1, "file_name": "COCO_train2014_000000000001.jpg",
                    "height": h, "width": w}],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 1,
             "segmentation": rle_encode(m), "bbox": [4, 3, 10, 6]},
            {"id": 11, "image_id": 1, "category_id": 1,
             "segmentation": [[1, 1, 9, 1, 9, 7, 1, 7]],
             "bbox": [1, 1, 8, 6]},
        ],
        "categories": [{"id": 1, "name": "mug"}],
    }
    refs = [
        {"ref_id": 0, "ann_id": 10, "image_id": 1, "category_id": 1,
         "split": "train",
         "sentences": [{"sent": "the left mug", "sent_id": 0,
                        "tokens": ["the", "left", "mug"]}]},
        {"ref_id": 1, "ann_id": 11, "image_id": 1, "category_id": 1,
         "split": "val",
         "sentences": [{"sent": "a square", "sent_id": 1,
                        "tokens": ["a", "square"]}]},
    ]
    os.makedirs(root / "refcoco")
    with open(root / "refcoco" / "refs(unc).p", "wb") as f:
        pickle.dump(refs, f)
    json.dump(instances, open(root / "refcoco" / "instances.json", "w"))

    # grefcoco: multi-ann ref + a no-target ref
    grefs = [
        {"ref_id": 0, "ann_id": [10, 11], "image_id": 1, "category_id": 1,
         "split": "train",
         "sentences": [{"sent": "both shapes", "sent_id": 0,
                        "tokens": ["both", "shapes"]}]},
        {"ref_id": 1, "ann_id": [-1], "image_id": 1, "category_id": 1,
         "split": "train",
         "sentences": [{"sent": "the purple elephant", "sent_id": 1,
                        "tokens": ["the", "purple", "elephant"]}]},
    ]
    os.makedirs(root / "grefcoco")
    with open(root / "grefcoco" / "grefs(unc).p", "wb") as f:
        pickle.dump(grefs, f)
    json.dump(instances, open(root / "grefcoco" / "instances.json", "w"))
    return root, m


def test_refer_api(refer_root):
    from videoglamm_tpu.data.refer_api import ReferAPI, export_consolidated
    root, m = refer_root
    api = ReferAPI(str(root), "refcoco", "unc")
    assert api.get_ref_ids(split="train") == [0]
    assert api.get_ref_ids(split="val") == [1]
    ref = api.load_ref(0)
    got = api.get_mask(ref)
    assert (got == m).all()
    assert api.get_ref_box(0) == [4, 3, 10, 6]
    recs = export_consolidated(api, split="train")
    assert len(recs) == 1 and len(recs[0]["refs"]) == 1
    assert recs[0]["refs"][0]["sentences"] == ["the left mug"]


def test_grefer_api_multi_and_no_target(refer_root):
    from videoglamm_tpu.data.refer_api import GReferAPI, open_refer
    root, m = refer_root
    api = open_refer(str(root), "grefcoco")
    assert isinstance(api, GReferAPI)
    merged = api.get_mask(api.load_ref(0))
    assert merged.sum() > m.sum()          # union of two anns
    assert api.is_no_target(api.load_ref(1))
    assert api.get_mask(api.load_ref(1)).sum() == 0


def test_refer_seg_from_refer(refer_root):
    from videoglamm_tpu.data.datasets import ReferSegDataset
    root, m = refer_root
    ds = ReferSegDataset.from_refer(str(root), "refcoco", "unc", "train")
    rec = ds[0]
    assert rec["masks"][0].sum() == m.sum()
    assert "the left mug" in rec["sources"][0][0]["value"]

    gds = ReferSegDataset.from_refer(str(root), "grefcoco", "unc", "train")
    rec = gds[0]
    assert len(rec["sources"]) == 2
    sums = sorted(float(x.sum()) for x in rec["masks"])
    assert sums[0] == 0.0 and sums[1] > m.sum()   # no-target + union


# ------------------------------------------------------- COCO part segs --

@pytest.fixture(scope="module")
def paco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("paco")
    rng = np.random.RandomState(4)
    h, w = 22, 30
    _save_img(str(root / "img" / "a.jpg"),
              rng.randint(0, 255, (h, w, 3), np.uint8))
    m = np.zeros((h, w), bool)
    m[2:8, 3:12] = True
    data = {
        "images": [{"id": 5, "file_name": "a.jpg", "height": h, "width": w}],
        "annotations": [
            {"id": 1, "image_id": 5, "category_id": 100,
             "segmentation": rle_encode(m)},
            {"id": 2, "image_id": 5, "category_id": 101,
             "segmentation": [[2, 10, 20, 10, 20, 18, 2, 18]]},
        ],
        "categories": [
            {"id": 100, "name": "car_(vehicle):wheel"},
            {"id": 101, "name": "dog_(animal)"},
        ],
    }
    json.dump(data, open(root / "train.json", "w"))
    return root, m


def test_coco_part_seg_dataset(paco_root):
    from videoglamm_tpu.data.datasets import CocoPartSegDataset
    root, m = paco_root
    ds = CocoPartSegDataset(str(root / "train.json"), str(root / "img"),
                            num_anns_per_sample=2)
    assert len(ds) == 1
    rec = ds[0]
    assert len(rec["sources"]) == 2
    qs = " ".join(s[0]["value"] for s in rec["sources"])
    # "car wheel" or "the wheel of the car", parens stripped
    assert "wheel" in qs and "car" in qs and "(" not in qs
    assert "dog" in qs
    assert any(abs(x.sum() - m.sum()) < 1 for x in rec["masks"])


def test_part_phrase_and_class_loaders(tmp_path):
    from videoglamm_tpu.data.datasets import (load_cocostuff_classes,
                                              load_mapillary_classes)
    from videoglamm_tpu.data.datasets.sem_seg import part_phrase
    rng = np.random.RandomState(0)
    seen = {part_phrase("car", "wheel", rng) for _ in range(20)}
    assert seen == {"car wheel", "the wheel of the car"}

    json.dump({"labels": [{"readable": "Bird"}, {"readable": "Curb Cut"}]},
              open(tmp_path / "config_v2.0.json", "w"))
    assert load_mapillary_classes(str(tmp_path / "config_v2.0.json")) == \
        ["bird", "curb cut"]

    with open(tmp_path / "cocostuff.txt", "w") as f:
        f.write("header\n0: person\n1: wall-brick\n2: sky\n")
    names, ignored = load_cocostuff_classes(str(tmp_path / "cocostuff.txt"))
    assert names == ["person", "wall-brick", "sky"]
    assert ignored == [1]


def test_sem_seg_ignored_values(tmp_path):
    from videoglamm_tpu.data.datasets import SemSegDataset
    rng = np.random.RandomState(5)
    _save_img(str(tmp_path / "img" / "s.jpg"),
              rng.randint(0, 255, (12, 14, 3), np.uint8))
    label = np.zeros((12, 14), np.uint8)
    label[:6] = 1                     # ignored class (e.g. 'wall-brick')
    label[6:] = 2
    _save_img(str(tmp_path / "lab" / "s.png"), label)
    ds = SemSegDataset(str(tmp_path / "img"), str(tmp_path / "lab"),
                       ["person", "wall-brick", "sky"], ignored_values=[1])
    rec = ds[0]
    names = " ".join(s[0]["value"] for s in rec["sources"])
    assert "wall-brick" not in names


# ------------------------------------------------------------ video GCG --

@pytest.fixture(scope="module")
def anet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("anet") / "activitynet_entities_gcg"
    rng = np.random.RandomState(6)
    h, w = 18, 24
    vid, seg = "v_abc", "3"
    for t in range(4):
        _save_img(str(root / "video_frames" / vid / seg / f"{t:02d}.jpg"),
                  rng.randint(0, 255, (h, w, 3), np.uint8))
    for si, frame_id in (("0", 1), ("1", 2)):
        m = np.zeros((h, w), np.uint8)
        m[2 + int(si) * 4: 8 + int(si) * 4, 3:12] = 255
        _save_img(str(root / "masks" / f"{vid}____{seg}" / si.zfill(2) /
                      "mask.png"), m)
    ann = {
        "refined_caption": "A man [SEG:0] pets a dog [SEG:1].",
        "seg_token_to_obj": {
            "[SEG:0]": {"frame_id": 1, "bbox": [3, 2, 12, 8]},
            "[SEG:1]": {"frame_id": 2, "bbox": [3, 6, 12, 12]},
        },
    }
    os.makedirs(root / "anns")
    json.dump(ann, open(root / "anns" / f"{vid}____{seg}.json", "w"))
    return root


def test_anet_entities_gcg(anet_root):
    from videoglamm_tpu.data.datasets import ANetEntitiesGCGDataset
    ds = ANetEntitiesGCGDataset(str(anet_root))
    assert len(ds) == 1
    rec = ds[0]
    ans = rec["sources"][0][1]["value"]
    assert ans.count("[SEG]") == 2 and "[SEG:" not in ans
    assert len(rec["frames"]) == 4
    assert list(rec["sam_frame_idx"]) == [1]       # first token's frame
    masks = rec["masks"][0]
    assert masks.shape == (2, 4, 18, 24)
    assert masks[0, 1].any() and masks[1, 1].any()  # GT placed at SAM frame
    assert not masks[0, 0].any()


@pytest.fixture(scope="module")
def vidstg_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("stg")
    rng = np.random.RandomState(7)
    h, w = 16, 20
    vdir = root / "vidstg_gcg" / "train" / "vidX"
    frames = [f"{t:04d}.png" for t in range(3)]
    for f in frames:
        _save_img(str(vdir / "frames" / f),
                  rng.randint(0, 255, (h, w, 3), np.uint8))
    for oid in ("1", "2"):
        for t, f in enumerate(frames):
            m = np.zeros((h, w), np.uint8)
            if t != 1:                      # absent in middle frame
                m[int(oid) * 3: int(oid) * 3 + 5, 2:10] = 255
            _save_img(str(vdir / "masks" / oid.zfill(3) / f), m)
    cap = {"caption": "[the man](1) waves at [a child](2) outside."}
    os.makedirs(root / "vidstg_gcg" / "train_captions")
    json.dump(cap, open(root / "vidstg_gcg" / "train_captions" /
                        "vidX.json", "w"))
    return root


def test_vidstg_gcg(vidstg_root):
    from videoglamm_tpu.data.datasets import VidSTGHCSTVGGCGDataset
    from videoglamm_tpu.data.datasets.video_gcg_extra import caption_to_gcg
    tagged, obj_ids, phrases = caption_to_gcg(
        "[the man](1) waves at [a child](2, 3) outside.")
    assert tagged == ("<p> the man </p> [SEG] waves at <p> a child </p> "
                      "[SEG] outside.")
    assert obj_ids == ["1", "2"] and phrases == ["the man", "a child"]

    ds = VidSTGHCSTVGGCGDataset(str(vidstg_root), "train", "vidstg")
    rec = ds[0]
    assert rec["sources"][0][1]["value"].count("[SEG]") == 2
    masks = rec["masks"][0]
    assert masks.shape == (2, 3, 16, 20)
    assert masks[0, 0].any() and not masks[0, 1].any() and masks[0, 2].any()


# ------------------------------------------------------- eval loaders ----

def test_a2d_sentences_dataset(tmp_path):
    import h5py
    from videoglamm_tpu.data.datasets import A2DSentencesDataset
    rng = np.random.RandomState(8)
    h, w, T = 14, 18, 6
    vid = "vidA"
    # frame-dir variant of clips320H
    for t in range(T):
        _save_img(str(tmp_path / "Release" / "clips320H" / vid /
                      f"{t:05d}.jpg"),
                  rng.randint(0, 255, (h, w, 3), np.uint8))
    frame_idx = 3                                   # 1-indexed
    masks_wh = np.zeros((2, w, h), np.uint8)        # stored [N, W, H]
    masks_wh[1, 4:12, 3:9] = 1
    hdir = tmp_path / "text_annotations" / "a2d_annotation_with_instances" \
        / vid
    os.makedirs(hdir)
    with h5py.File(hdir / f"{frame_idx:05d}.h5", "w") as f:
        f["instance"] = np.asarray([7, 9])
        f["reMask"] = masks_wh
    ann = [["A red ball  rolling", vid, frame_idx, 9]]
    json.dump(ann, open(tmp_path / "val_ann.json", "w"))

    ds = A2DSentencesDataset(str(tmp_path), str(tmp_path / "val_ann.json"),
                             num_frames=5)
    rec = ds[0]
    assert rec["caption"] == "a red ball rolling"
    assert rec["gt_mask"].shape == (h, w)
    assert rec["gt_mask"].sum() == 8 * 6
    assert len(rec["frames"]) == 5
    assert rec["frame_indices"][rec["valid_index"]] == frame_idx - 1
    assert rec["image_id"] == f"v_{vid}_f_{frame_idx}_i_9"


def test_jhmdb_sentences_dataset(tmp_path):
    import scipy.io
    from videoglamm_tpu.data.datasets import JHMDBSentencesDataset
    rng = np.random.RandomState(9)
    h, w, T = 12, 16, 5
    rel_dir = "Rename_Images/brush_hair/clipZ"
    for t in range(1, T + 1):                       # 1-indexed frames
        _save_img(str(tmp_path / rel_dir / f"{t:05d}.png"),
                  rng.randint(0, 255, (h, w, 3), np.uint8))
    part_mask = np.zeros((h, w, T), np.uint8)
    part_mask[2:7, 3:9, 2] = 1                      # frame 3 (0-idx 2)
    os.makedirs(tmp_path / "puppet_mask" / "brush_hair" / "clipZ")
    mat_rel = "puppet_mask/brush_hair/clipZ/puppet_mask.mat"
    scipy.io.savemat(str(tmp_path / mat_rel), {"part_mask": part_mask})
    rows = [["clipZ", f"./{rel_dir}/00003.png", mat_rel, T,
             "A  person brushing hair"]]
    json.dump(rows, open(tmp_path / "jhmdb_ann.json", "w"))

    ds = JHMDBSentencesDataset(str(tmp_path),
                               str(tmp_path / "jhmdb_ann.json"),
                               num_frames=3)
    rec = ds[0]
    assert rec["caption"] == "a person brushing hair"
    assert rec["gt_mask"].sum() == 5 * 6
    assert len(rec["frames"]) == 3
    assert rec["frame_indices"][rec["valid_index"]] == 3
    assert rec["image_id"] == "v_clipZ_f_3"


# ------------------------------------------------ mixture registration --

def test_new_formats_in_hybrid_mixture(refer_root, paco_root, anet_root,
                                       vidstg_root):
    from videoglamm_tpu.data.datasets import (ANetEntitiesGCGDataset,
                                              CocoPartSegDataset,
                                              DatasetSpec, HybridDataset,
                                              ReferSegDataset, SampleBuilder,
                                              VidSTGHCSTVGGCGDataset)
    tok = FakeTokenizer()
    builder = SampleBuilder(CFG, tok, max_text_len=64, num_frames_for_sam=2)
    specs = [
        DatasetSpec("refcoco", ReferSegDataset.from_refer(
            str(refer_root[0]), "refcoco", "unc", "train"), 1.0),
        DatasetSpec("grefcoco", ReferSegDataset.from_refer(
            str(refer_root[0]), "grefcoco", "unc", "train"), 1.0),
        DatasetSpec("paco", CocoPartSegDataset(
            str(paco_root[0] / "train.json"), str(paco_root[0] / "img")),
            1.0),
        DatasetSpec("anet_gcg", ANetEntitiesGCGDataset(str(anet_root)), 1.0),
        DatasetSpec("vidstg_gcg", VidSTGHCSTVGGCGDataset(
            str(vidstg_root), "train", "vidstg"), 1.0),
    ]
    hybrid = HybridDataset(specs, builder, samples_per_epoch=len(specs) * 2)
    for i in range(len(specs) * 2):
        sample = hybrid[i]
        assert sample["frames"].shape[0] == CFG.num_frames
        assert sample["conversations"]


def test_val_gcg_union(tmp_path, vidstg_root):
    """ValGCGDataset equivalent: '||'-joined GCG val splits concatenate;
    missing components are skipped."""
    import shutil
    from videoglamm_tpu.data.datasets import ConcatDataset, build_val_gcg
    from videoglamm_tpu.data.rle import rle_encode
    base = tmp_path / "videos"
    rng = np.random.RandomState(11)
    # video_gcg test split
    h, w = 12, 16
    _save_img(str(base / "video_gcg" / "frames" / "v0" / "0.jpg"),
              rng.randint(0, 255, (h, w, 3), np.uint8))
    m = np.zeros((h, w), bool)
    m[:6] = True
    inst = {"videos": [{"file_names": ["v0/0.jpg"], "width": w, "height": h,
                        "length": 1,
                        "dense_cap": {"caption": "a cat naps",
                                      "token_pos": [1], "mask_id": [1],
                                      "v_id2o_id": {}}}],
            "annotations": [{"id": 1, "segmentations": [rle_encode(m)]}]}
    json.dump(inst, open(base / "video_gcg" / "test.json", "w"))
    # vidstg_gcg val split: reuse the train fixture dirs as val
    src = vidstg_root / "vidstg_gcg"
    shutil.copytree(src / "train", base / "vidstg_gcg" / "val")
    shutil.copytree(src / "train_captions",
                    base / "vidstg_gcg" / "val_captions")

    ds = build_val_gcg(str(base))      # mevis missing -> skipped
    assert isinstance(ds, ConcatDataset)
    assert len(ds) == 2
    rec0, rec1 = ds[0], ds[1]
    assert rec0["sources"][0][1]["value"].count("[SEG]") == 1
    assert rec1["sources"][0][1]["value"].count("[SEG]") == 2


def test_refer_sentences_train_adapter(tmp_path):
    """A2D record -> train record: one declarative conversation, mask tube
    supervised only at the annotated frame, SAM frames pinned to it
    (reference registers a2d/jhmdb as train sources,
    utils/refer_vos_dataset.py:25,99-123)."""
    import h5py
    from videoglamm_tpu.data.datasets import (A2DSentencesDataset,
                                              ReferSentencesTrainDataset)
    rng = np.random.RandomState(12)
    h, w, T = 14, 18, 6
    vid = "vidB"
    for t in range(T):
        _save_img(str(tmp_path / "Release" / "clips320H" / vid /
                      f"{t:05d}.jpg"),
                  rng.randint(0, 255, (h, w, 3), np.uint8))
    frame_idx = 4
    masks_wh = np.zeros((1, w, h), np.uint8)
    masks_wh[0, 2:10, 2:8] = 1
    hdir = tmp_path / "text_annotations" / "a2d_annotation_with_instances" \
        / vid
    os.makedirs(hdir)
    with h5py.File(hdir / f"{frame_idx:05d}.h5", "w") as f:
        f["instance"] = np.asarray([5])
        f["reMask"] = masks_wh[0]
    json.dump([["a dog running", vid, frame_idx, 5]],
              open(tmp_path / "ann.json", "w"))

    base = A2DSentencesDataset(str(tmp_path), str(tmp_path / "ann.json"),
                               num_frames=5)
    ds = ReferSentencesTrainDataset(base, num_frames_for_sam=3)
    rec = ds[0]
    assert len(rec["sources"]) == 1
    assert rec["sources"][0][1]["value"].count("[SEG]") == 1
    assert "a dog running" in rec["sources"][0][0]["value"]
    tube = rec["masks"][0]
    assert tube.shape == (1, 5, h, w)
    vi = base[0]["valid_index"]
    assert tube[0, vi].sum() == 8 * 6
    assert tube[0, [i for i in range(5) if i != vi]].sum() == 0
    assert rec["sam_frame_idx"] == [vi] * 3

    # flows through SampleBuilder (mixture-ready)
    from videoglamm_tpu.config import VideoGLaMMConfig
    from videoglamm_tpu.data.datasets import SampleBuilder
    from test_data import FakeTokenizer
    cfg = VideoGLaMMConfig.tiny(num_frames=4)
    builder = SampleBuilder(cfg, FakeTokenizer(), num_frames_for_sam=3,
                            mask_hw=(16, 16))
    sample = builder(rec)
    assert sample["frames_sam"].shape[0] == 3
    assert sample["masks"][0].shape == (1, 3, 16, 16)
    assert all(sample["masks"][0][0, t].any() for t in range(3))


def test_anet_entities_official_converter(tmp_path):
    """Official ANet-Entities trainval + split files -> per-box entries
    (reference parsing: eval_anet_entities_infer.py:86-146; VERDICT r2
    missing #2)."""
    from videoglamm_tpu.data.anet_entities import (
        convert_official_annotations, segment_frame_indices)

    ref = {"annotations": {
        "v_abc": {"segments": {
            "0": {"timestamps": [2.0, 6.5],
                  "tokens": ["a", "man", "rides", "a", "horse"],
                  "process_clss": [["man"], ["horse"]],
                  "process_idx": [[1], [4]],
                  "process_bnd_box": [[10, 20, 50, 80], [60, 30, 120, 90]],
                  "frame_ind": [3, 7],
                  "crowds": [0, 0]},
            "1": {"timestamps": [7.0, 9.0], "tokens": ["sky"],
                  "process_clss": [], "process_idx": [],
                  "process_bnd_box": [], "frame_ind": [], "crowds": []},
        }},
        "v_excluded": {"segments": {"0": {
            "timestamps": [0, 1], "tokens": ["x"], "process_clss": [["x"]],
            "process_idx": [[0]], "process_bnd_box": [[0, 0, 1, 1]],
            "frame_ind": [0], "crowds": [0]}}},
    }}
    split = {"validation": ["v_abc"], "training": ["v_excluded"]}
    json.dump(ref, open(tmp_path / "ref.json", "w"))
    json.dump(split, open(tmp_path / "split.json", "w"))

    entries = convert_official_annotations(str(tmp_path / "ref.json"),
                                           str(tmp_path / "split.json"))
    # one entry per grounded box; split filtering; boxless segment skipped
    assert len(entries) == 2
    assert all(e["vid"] == "v_abc" and e["seg"] == "0" for e in entries)
    assert entries[0]["phrase"] == "man"
    assert entries[1]["phrase"] == "horse"
    assert entries[0]["gt_box"] == [10.0, 20.0, 50.0, 80.0]
    assert entries[1]["gt_frame"] == 7
    assert entries[0]["timestamps"] == [2.0, 6.5]
    assert entries[0]["caption"] == "a man rides a horse"
    assert entries[0]["video"] is None

    # video resolution: subdir + extension search order
    os.makedirs(tmp_path / "videos" / "train")
    open(tmp_path / "videos" / "train" / "v_abc.mkv", "wb").close()
    entries = convert_official_annotations(
        str(tmp_path / "ref.json"), str(tmp_path / "split.json"),
        videos_root=str(tmp_path / "videos"))
    assert entries[0]["video"].endswith("train/v_abc.mkv")

    # fps-scaled segment window matches the reference's load_frames math
    idx = segment_frame_indices(total_frames=100, fps=10.0,
                                timestamps=[2.0, 6.5], num_frames=5)
    assert idx[0] == 20 and idx[-1] == 65 and len(idx) == 5
    idx = segment_frame_indices(10, 10.0, [0.5, 5.0], 4)  # end clamped
    assert idx[0] == 5 and idx[-1] == 9


def test_refclef_format(tmp_path):
    """RefCLEF through ReferAPI (VERDICT r2 missing #4): saiapr_tc-12 image
    layout with nested file_names (reference refer.py:53-54,
    refer_seg_dataset.py:303-306) and the refclef mask format — the
    distributed instances.json stores masks converted from the original
    .mat files as UNCOMPRESSED RLE (counts list, Fortran order), decoded
    via mask.decode in the reference (refer.py:285-288)."""
    from videoglamm_tpu.data.refer_api import ReferAPI

    rng = np.random.RandomState(13)
    h, w = 4, 5
    # nested saiapr layout: <subset>/images/<name>.jpg
    img_rel = "19/images/19000.jpg"
    _save_img(str(tmp_path / "images" / "saiapr_tc-12" / "19" / "images" /
                  "19000.jpg"), rng.randint(0, 255, (h, w, 3), np.uint8))

    # uncompressed RLE, counts list, Fortran(column-major) order:
    # 3 zeros, 2 ones, rest zeros -> flat idx 3 = (row 3, col 0),
    # idx 4 = (row 0, col 1)
    seg = {"size": [h, w], "counts": [3, 2, h * w - 5]}
    instances = {
        "images": [{"id": 1, "file_name": img_rel, "height": h, "width": w}],
        "annotations": [{"id": 10, "image_id": 1, "category_id": 1,
                         "segmentation": seg, "bbox": [0, 0, 2, 4]}],
        "categories": [{"id": 1, "name": "thing"}],
    }
    refs = [{"ref_id": 0, "ann_id": 10, "image_id": 1, "category_id": 1,
             "split": "train",
             "sentences": [{"sent": "dark region", "sent_id": 0,
                            "tokens": ["dark", "region"]}]}]
    os.makedirs(tmp_path / "refclef")
    with open(tmp_path / "refclef" / "refs(unc).p", "wb") as f:
        pickle.dump(refs, f)
    json.dump(instances, open(tmp_path / "refclef" / "instances.json", "w"))

    api = ReferAPI(str(tmp_path), "refclef")
    assert api.split_by == "unc"        # reference refer_seg_dataset.py:58-61
    assert api.image_path(1) == os.path.join("images", "saiapr_tc-12",
                                             img_rel)
    assert os.path.exists(os.path.join(str(tmp_path), api.image_path(1)))
    got = api.get_mask(api.load_ref(0))
    want = np.zeros((h, w), bool)
    want[3, 0] = True
    want[0, 1] = True
    assert (got == want).all()
