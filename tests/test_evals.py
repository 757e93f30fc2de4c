"""Eval metrics: IoU/mIoU matching, DAVIS J&F, grounding IoUs, postprocess."""
import numpy as np
import pytest

from videoglamm_tpu.evals import (boundary_f_measure, clean_caption,
                                  compute_iou, compute_miou, davis_j,
                                  extract_phrases, find_best_matches,
                                  intersection_and_union, masks_to_boxes,
                                  np_box_iou, remove_small_blobs, seg2bmap,
                                  temporal_iou, video_iou)


def test_compute_iou_and_miou():
    a = np.zeros((8, 8), bool)
    a[:4] = True
    b = np.zeros((8, 8), bool)
    b[2:6] = True
    assert compute_iou(a, a) == 1.0
    assert abs(compute_iou(a, b) - (16 / 48)) < 1e-9
    # greedy matching pairs identical masks first
    assert compute_miou([a, b], [b, a]) == 1.0
    assert compute_miou([a], [b]) == pytest.approx(1 / 3)
    assert compute_miou([], [a]) == 0.0


def test_find_best_matches_dual_threshold():
    a = np.zeros((8, 8), bool)
    a[:4] = True
    sim_hi = lambda x, y: 1.0
    sim_lo = lambda x, y: 0.1
    m = find_best_matches([a], ["cat"], [a], ["cat"], sim_hi)
    assert m == [(0, 0)]
    # IoU perfect but text dissimilar -> no match
    m = find_best_matches([a], ["cat"], [a], ["car"], sim_lo)
    assert m == []


def test_davis_j():
    a = np.zeros((2, 8, 8))
    s = np.zeros((2, 8, 8))
    a[0, :4] = 1
    s[0, :4] = 1
    j = davis_j(a, s)
    assert j[0] == 1.0
    assert j[1] == 1.0  # both empty -> 1 by convention


def test_boundary_f():
    gt = np.zeros((32, 32))
    gt[8:24, 8:24] = 1
    assert boundary_f_measure(gt.copy(), gt) == 1.0
    shifted = np.roll(gt, 1, axis=0)
    f = boundary_f_measure(shifted, gt)
    assert 0.5 < f <= 1.0
    assert boundary_f_measure(np.zeros_like(gt), np.zeros_like(gt)) == 1.0
    assert boundary_f_measure(np.zeros_like(gt), gt) == 0.0


def test_intersection_and_union():
    pred = np.array([[1, 1, 0, 0]])
    tgt = np.array([[1, 0, 0, 255]])
    inter, union, target = intersection_and_union(pred, tgt)
    # class 1: inter 1, union 2; class 0: positions 2 only (255 ignored)
    assert inter[1] == 1 and union[1] == 2
    assert target[1] == 1


def test_boxes():
    m = np.zeros((1, 10, 10))
    m[0, 2:5, 3:7] = 1
    box = masks_to_boxes(m)[0]
    assert list(box) == [3, 2, 6, 4]
    iou = np_box_iou(np.array([[0, 0, 4, 4]]), np.array([[2, 2, 6, 6]]))
    assert iou[0, 0] == pytest.approx(4 / 28)


def test_temporal_and_video_iou():
    tiou, union, inter = temporal_iou((2, 6), (4, 8), list(range(10)))
    assert tiou == pytest.approx(2 / 6)
    assert set(union) == set(range(2, 8))
    assert inter == {4, 5}
    pred = {4: [0, 0, 4, 4], 5: [0, 0, 4, 4]}
    gt = {4: [0, 0, 4, 4], 5: [2, 2, 6, 6]}
    v = video_iou(pred, gt, union, inter)
    assert v == pytest.approx((1.0 + 4 / 28) / 6)


def test_postprocess():
    cap = "The <p> red car </p> [SEG] drives past <p>a tree</p> [SEG].<|end|>"
    assert extract_phrases(cap) == ["red car", "a tree"]
    assert clean_caption(cap) == "The red car drives past a tree ."

    m = np.zeros((16, 16), bool)
    m[0:4, 0:4] = True      # 16 px blob
    m[10, 10] = True        # 1 px blob
    out = remove_small_blobs(m, min_size=5)
    assert out[:4, :4].all() and not out[10, 10]

    b = seg2bmap(np.pad(np.ones((4, 4)), 2))
    assert b.sum() > 0
    inner = b[3:5, 3:5]
    assert not inner.all()  # interior is not boundary


def test_cider_d_vendored():
    from videoglamm_tpu.evals.caption_metrics import cider_d
    gts = {0: ["a red car drives down the road"],
           1: ["a dog runs across the field"],
           2: ["two people sit on a bench"]}
    perfect = {k: list(v) for k, v in gts.items()}
    score, per = cider_d(gts, perfect)
    assert score == pytest.approx(10.0, abs=1e-6)   # identical -> 10
    assert all(s == pytest.approx(10.0, abs=1e-6) for s in per)

    disjoint = {0: ["purple elephants fly tonight"],
                1: ["seven ships sank quietly"],
                2: ["glass towers hum loudly"]}
    score_bad, _ = cider_d(gts, disjoint)
    assert score_bad == pytest.approx(0.0, abs=1e-6)

    partial = {0: ["a red car drives"],
               1: ["a dog runs"],
               2: ["two people sit"]}
    score_mid, _ = cider_d(gts, partial)
    assert 0.0 < score_mid < 10.0


def test_meteor_vendored():
    from videoglamm_tpu.evals.caption_metrics import meteor
    gts = {0: ["the cat sat on the mat"]}
    score, _ = meteor(gts, {0: ["the cat sat on the mat"]})
    assert score == pytest.approx(1.0 - 0.5 * (1 / 6) ** 3, abs=1e-6)
    score0, _ = meteor(gts, {0: ["zebras gallop west"]})
    assert score0 == 0.0
    # stem matching: 'sitting' aligns with 'sat'? no — different stems;
    # but 'cats' aligns with 'cat'
    s_stem, _ = meteor(gts, {0: ["cats mat"]})
    assert s_stem > 0.0
    # word-order fragmentation lowers the score
    s_order, _ = meteor(gts, {0: ["mat the on sat cat the"]})
    s_exact, _ = meteor(gts, {0: ["the cat sat on the mat"]})
    assert s_order < s_exact


def test_gcg_metrics_cli_produces_caption_scores(tmp_path):
    """In this image (no pycocoevalcap) the CLI must still produce
    METEOR/CIDEr via the vendored implementations."""
    import json as _json
    from PIL import Image
    from videoglamm_tpu.cli import eval_gcg_metrics
    m = (np.zeros((8, 8), np.uint8))
    m[:4] = 255
    caps = {"v0": "a red car drives", "v1": "a dog runs fast",
            "v2": "two people sit down"}
    for vid, cap in caps.items():
        for root, sub in ((tmp_path / "pred", "pred_masks"),
                          (tmp_path / "gt", "gt_masks")):
            d = root / vid / sub / "0"
            d.mkdir(parents=True)
            Image.fromarray(m).save(d / "00000.png")
        rec = {"gt_text": cap, "pred_text_cleaned": cap,
               "gt_phrases": [cap.split()[1]],
               "pred_phrases": [cap.split()[1]]}
        with open(tmp_path / "pred" / vid / "res.json", "w") as f:
            _json.dump(rec, f)
    out = eval_gcg_metrics.main(["--pred_root", str(tmp_path / "pred"),
                                 "--gt_root", str(tmp_path / "gt")])
    assert "meteor" in out and "cider" in out
    assert out["cider"] == pytest.approx(10.0, abs=1e-4)
    assert out["meteor"] > 0.9
    assert out["miou"] == pytest.approx(1.0)


def test_meteor_synonym_stage():
    """Synonym matching (official METEOR stage 3) with hand-computed
    expectations — quantifies the exact+stem vs +synonym deviation
    (VERDICT r2 missing #3).

    hyp 'the dog runs' vs ref 'the canine runs':
    - exact+stem only: matches (the, runs) -> m=2, P=R=2/3,
      fmean=10PR/(R+9P)=2/3, chunks=2 -> penalty=0.5*(2/2)^3=0.5,
      score = 2/3 * 0.5 = 1/3.
    - with dog~canine: m=3, P=R=1, fmean=1, 1 chunk ->
      penalty=0.5*(1/3)^3, score = 1 - 0.5/27 = 0.981481.
    """
    from videoglamm_tpu.evals.caption_metrics import (meteor,
                                                      register_synonyms)
    gts = {0: ["the canine runs"]}
    score, _ = meteor(gts, {0: ["the dog runs"]})
    assert abs(score - (1 - 0.5 / 27)) < 1e-9, score

    # an unknown pair falls back to exact+stem behavior...
    gts2 = {0: ["the zorblax runs"]}
    s_no_syn, _ = meteor(gts2, {0: ["the fnordle runs"]})
    assert abs(s_no_syn - 1.0 / 3.0) < 1e-9, s_no_syn
    # ...until registered
    register_synonyms(("zorblax", "fnordle"))
    s_syn, _ = meteor(gts2, {0: ["the fnordle runs"]})
    assert abs(s_syn - (1 - 0.5 / 27)) < 1e-9, s_syn

    # documented deviation magnitude: one missed synonym on a 3-token
    # caption costs ~0.648 METEOR — the worst-case per-pair drift vs the
    # jar when a synonym pair is absent from the table/corpus
    assert abs((s_syn - s_no_syn) - 0.64815) < 1e-4
