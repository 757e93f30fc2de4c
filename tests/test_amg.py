"""SAM-2 automatic mask generator: unit behavior + golden parity against the
REAL reference SAM2AutomaticMaskGenerator (driven end-to-end with minimal
torchvision transforms/NMS shims so the reference executes as the oracle)."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoglamm_tpu.models.sam2.amg import (SAM2AutomaticMaskGenerator,
                                            build_all_layer_point_grids,
                                            build_point_grid,
                                            generate_crop_boxes,
                                            is_box_near_crop_edge, nms_xyxy,
                                            remove_small_regions)
from videoglamm_tpu.models.sam2.sam2_base import SAM2Base
from test_image_predictor import CFG, _stub_torchvision


# ---------------------------------------------------------------------------
# pure utils vs the reference formulas (no model)
# ---------------------------------------------------------------------------

def test_point_grids_and_crops_match_reference():
    from ref_sam2 import load_reference_sam2
    load_reference_sam2()  # hydra stubs + sys.path for the reference pkg
    from model.segment_anything_2.sam2.utils import amg as ref_amg

    np.testing.assert_allclose(build_point_grid(5),
                               ref_amg.build_point_grid(5))
    ours = build_all_layer_point_grids(16, 2, 2)
    ref = ref_amg.build_all_layer_point_grids(16, 2, 2)
    assert len(ours) == len(ref)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b)

    for size, layers in (((480, 640), 1), ((71, 96), 2)):
        cb, li = generate_crop_boxes(size, layers, 512 / 1500)
        cb_r, li_r = ref_amg.generate_crop_boxes(size, layers, 512 / 1500)
        assert cb == cb_r and li == li_r


def test_nms_greedy_semantics():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30],
                      [0, 0, 10, 10]], np.float64)
    scores = np.array([0.9, 0.8, 0.7, 0.95])
    # box 3 (highest) suppresses 0 and 1 (iou > 0.5); box 2 disjoint
    keep = nms_xyxy(boxes, scores, 0.5)
    assert keep.tolist() == [3, 2]
    # threshold 1.0 keeps everything, score-descending
    assert nms_xyxy(boxes, scores, 1.0).tolist() == [3, 0, 1, 2]


def test_box_near_crop_edge():
    boxes = np.array([[5, 30, 50, 60],     # near crop left = image left: no
                      [85, 30, 95, 60],    # near crop right != image right
                      [30, 30, 50, 50]], np.float64)
    near = is_box_near_crop_edge(boxes, [0, 0, 100, 80], [0, 0, 200, 80])
    assert near.tolist() == [False, True, False]


def test_remove_small_regions():
    mask = np.zeros((32, 32), bool)
    mask[4:20, 4:20] = True
    mask[8:10, 8:10] = False      # 4-px hole
    mask[28:30, 28:30] = True     # 4-px island
    out, changed = remove_small_regions(mask, 5, "holes")
    assert changed and out[8:10, 8:10].all() and out[28:30, 28:30].all()
    out2, changed2 = remove_small_regions(out, 5, "islands")
    assert changed2 and not out2[28:30, 28:30].any() and out2[4:20, 4:20].all()
    # all-below-threshold islands keep the largest region
    tiny = np.zeros((16, 16), bool)
    tiny[0:2, 0:2] = True
    tiny[8:11, 8:11] = True
    out3, _ = remove_small_regions(tiny, 50, "islands")
    assert out3[8:11, 8:11].all() and not out3[0:2, 0:2].any()


# ---------------------------------------------------------------------------
# generator behavior on the tiny random-init model
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_model():
    model = SAM2Base(CFG, dtype=jnp.float32)
    x = jnp.zeros((1, CFG.image_size, CFG.image_size, 3), jnp.float32)
    params = {"params": model.init(jax.random.PRNGKey(0), x)["params"]}
    return model, params


def test_generate_smoke_and_record_schema(tiny_model):
    model, params = tiny_model
    gen = SAM2AutomaticMaskGenerator(
        model, params, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        box_nms_thresh=1.0)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(48, 64, 3), dtype=np.uint8)
    anns = gen.generate(img)
    assert len(anns) == 16 * 3  # all candidates survive with open gates
    for a in anns:
        assert a["segmentation"].shape == (48, 64)
        assert a["segmentation"].dtype == bool
        assert len(a["bbox"]) == 4 and len(a["crop_box"]) == 4
        assert a["crop_box"] == [0.0, 0.0, 64.0, 48.0]
        assert a["area"] == int(a["segmentation"].sum())
        assert 0.0 <= a["stability_score"] <= 1.0


def test_generate_crops_and_m2m_smoke(tiny_model):
    model, params = tiny_model
    gen = SAM2AutomaticMaskGenerator(
        model, params, points_per_side=2, points_per_batch=4,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        crop_n_layers=1, use_m2m=True, multimask_output=False,
        output_mode="uncompressed_rle")
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(40, 56, 3), dtype=np.uint8)
    anns = gen.generate(img)
    assert anns, "crop+m2m path produced no candidates"
    crop_boxes = {tuple(a["crop_box"]) for a in anns}
    assert len(crop_boxes) >= 1  # crop NMS may keep only some layers
    for a in anns:
        assert isinstance(a["segmentation"]["counts"], list)
        assert a["segmentation"]["size"] == [40, 56]


# ---------------------------------------------------------------------------
# golden parity vs the reference generator
# ---------------------------------------------------------------------------

def _stub_torchvision_ops():
    """torchvision.ops.boxes shim: eager-torch greedy NMS + box_area with
    the exact torchvision contract the reference relies on (all-zero
    category ids -> batched_nms degenerates to plain NMS)."""
    import torch

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def nms(boxes, scores, iou_threshold):
        order = torch.argsort(scores, descending=True, stable=True)
        areas = box_area(boxes)
        keep = []
        while order.numel():
            i = order[0].item()
            keep.append(i)
            rest = order[1:]
            lt = torch.maximum(boxes[i, :2], boxes[rest][:, :2])
            rb = torch.minimum(boxes[i, 2:], boxes[rest][:, 2:])
            wh = (rb - lt).clamp(min=0)
            inter = wh[:, 0] * wh[:, 1]
            iou = inter / (areas[i] + areas[rest] - inter).clamp(min=1e-12)
            order = rest[iou <= iou_threshold]
        return torch.as_tensor(keep, dtype=torch.long)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        assert (idxs == 0).all(), "AMG only uses a single category"
        return nms(boxes, scores, iou_threshold)

    _stub_torchvision()
    tv = sys.modules["torchvision"]
    ops = types.ModuleType("torchvision.ops")
    bx = types.ModuleType("torchvision.ops.boxes")
    import importlib.machinery
    for m in (ops, bx):
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, None)
    ops.boxes = bx
    tv.ops = ops
    sys.modules.setdefault("torchvision.ops", ops)
    sys.modules.setdefault("torchvision.ops.boxes", bx)
    # overwrite attrs on whichever module object is registered — an earlier
    # None-stub (test_sam1_golden._load_ref) must gain the real functions
    mod = sys.modules["torchvision.ops.boxes"]
    mod.batched_nms, mod.box_area, mod.nms = batched_nms, box_area, nms
    sys.modules["torchvision.ops"].boxes = mod
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]


def _build_ref_amg(ref, **kw):
    import torch
    _stub_torchvision_ops()
    orig_script = torch.jit.script
    torch.jit.script = lambda m, *a, **k: m
    try:
        from model.segment_anything_2.sam2.automatic_mask_generator import \
            SAM2AutomaticMaskGenerator as RefAMG
        amg = RefAMG(ref, **kw)
    finally:
        torch.jit.script = orig_script
    E = CFG.image_size // CFG.backbone_stride
    amg.predictor._bb_feat_sizes = [(4 * E, 4 * E), (2 * E, 2 * E), (E, E)]
    pe_fwd = ref.sam_prompt_encoder.forward
    ref.sam_prompt_encoder.forward = \
        lambda points=None, boxes=None, masks=None, text_embeds=None: \
        pe_fwd(points, boxes, masks, text_embeds)
    return amg


@pytest.mark.golden
@pytest.mark.slow
def test_amg_golden():
    import torch
    from videoglamm_tpu.io.import_torch import import_sam2
    from ref_sam2 import build_reference_sam2

    ref = build_reference_sam2(CFG)
    kw = dict(points_per_side=4, points_per_batch=8, pred_iou_thresh=0.0,
              stability_score_thresh=0.0, box_nms_thresh=1.0)
    ref_amg = _build_ref_amg(ref, **kw)

    model = SAM2Base(CFG, dtype=jnp.float32)
    params = {"params": import_sam2(ref.state_dict(), CFG)}
    gen = SAM2AutomaticMaskGenerator(model, params, **kw)

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(71, 96, 3), dtype=np.uint8)
    with torch.no_grad():
        want = ref_amg.generate(img)
    got = gen.generate(img)
    assert len(got) == len(want) == 4 * 4 * 3

    def key(a):
        return (round(a["point_coords"][0][0], 3),
                round(a["point_coords"][0][1], 3), a["area"])

    got = sorted(got, key=key)
    want = sorted(want, key=key)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g["point_coords"], w["point_coords"],
                                   atol=1e-4)
        assert abs(g["predicted_iou"] - w["predicted_iou"]) < 2e-2
        assert abs(g["stability_score"] - w["stability_score"]) < 2e-2
        gm, wm = g["segmentation"], w["segmentation"]
        union = (gm | wm).sum()
        iou = (gm & wm).sum() / union if union else 1.0
        assert iou > 0.97, f"mask IoU {iou:.3f} at point {key(g)}"
        np.testing.assert_allclose(g["bbox"], w["bbox"], atol=3)
        assert g["crop_box"] == [float(v) for v in w["crop_box"]]


@pytest.mark.golden
@pytest.mark.slow
def test_amg_golden_m2m_and_crops():
    """Crop layers + m2m refinement vs the reference generator. Candidate
    sets can differ at the crop-edge-filter boundary (binarization noise
    shifts int boxes a few px around the atol=20 bucket), so the contract
    is: near-identical candidate counts and high mask IoU for point-matched
    pairs."""
    import torch
    from videoglamm_tpu.io.import_torch import import_sam2
    from ref_sam2 import build_reference_sam2

    ref = build_reference_sam2(CFG)
    kw = dict(points_per_side=3, points_per_batch=8, pred_iou_thresh=0.0,
              stability_score_thresh=0.0, box_nms_thresh=1.0,
              crop_n_layers=1, crop_nms_thresh=1.0, use_m2m=True,
              multimask_output=False)
    ref_amg = _build_ref_amg(ref, **kw)

    model = SAM2Base(CFG, dtype=jnp.float32)
    params = {"params": import_sam2(ref.state_dict(), CFG)}
    gen = SAM2AutomaticMaskGenerator(model, params, **kw)

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(61, 83, 3), dtype=np.uint8)
    with torch.no_grad():
        want = ref_amg.generate(img)
    got = gen.generate(img)
    assert abs(len(got) - len(want)) <= max(2, len(want) // 20), \
        (len(got), len(want))

    def key(a):
        return (round(a["point_coords"][0][0], 2),
                round(a["point_coords"][0][1], 2),
                tuple(a["crop_box"]))

    gmap = {key(a): a for a in got}
    wmap = {key(a): a for a in want}
    common = set(gmap) & set(wmap)
    assert len(common) >= min(len(got), len(want)) - 2
    for k in common:
        g, w = gmap[k], wmap[k]
        gm, wm = g["segmentation"], w["segmentation"]
        union = (gm | wm).sum()
        iou = (gm & wm).sum() / union if union else 1.0
        assert iou > 0.95, f"mask IoU {iou:.3f} at {k}"
        assert abs(g["predicted_iou"] - w["predicted_iou"]) < 3e-2
