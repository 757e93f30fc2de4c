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
