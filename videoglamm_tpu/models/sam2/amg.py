"""SAM-2 automatic mask generator ("segment everything" mode).

Behavioral contract from the reference SAM2AutomaticMaskGenerator
(/root/reference/VideoGLaMM/model/segment_anything_2/sam2/
automatic_mask_generator.py:36-434) and its amg utilities
(sam2/utils/amg.py:80-348):

- a regular point grid (points_per_side^2, cell-centered in [0,1]^2) is run
  through the prompted decoder in batches of points_per_batch, multimask by
  default;
- candidates are filtered by predicted IoU (> pred_iou_thresh), by mask
  stability (IoU between the +offset / -offset binarizations,
  >= stability_score_thresh), and by touching a crop edge that is not an
  image edge (atol 20 px);
- per-crop greedy box NMS (iou > box_nms_thresh suppresses) dedups
  candidates; with crop_n_layers > 0 the whole procedure repeats on
  overlapping image crops and a second NMS (scored by 1/crop_area, so
  smaller crops win) merges across crops;
- min_mask_region_area > 0 routes through the predictor's hole/sprinkle
  filling (automatic_mask_generator.py:131-135); use_m2m adds one
  refinement round feeding each candidate's low-res logits back as a mask
  prompt (automatic_mask_generator.py:417-434);
- records carry segmentation (binary / uncompressed RLE / coco RLE), area,
  xywh bbox, predicted_iou, the prompting point, stability_score, and the
  crop box.

TPU-first notes: candidate scoring is fused into one fixed-shape device
program per (batch, crop-size) key — decode, optional hole/sprinkle fill on
the low-res logits (device connected components, not OpenCV), bilinear
upscale, stability IoUs, binarization, and mask->box reduction all happen
on device; only boolean masks and per-candidate scalars cross to the host,
where compaction, NMS, and RLE encoding run in numpy. Grid batches are
padded to points_per_batch so every batch reuses the same compiled program.
"""
from __future__ import annotations

from itertools import product
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...data.rle import rle_decode, rle_encode
from ...ops.connected_components import (connected_components,
                                         postprocess_mask_scores)
from ...ops.resize import resize_bilinear
from .image_predictor import SAM2ImagePredictor
from .sam2_base import SAM2Base


# ---------------------------------------------------------------------------
# grids and crops (host; amg.py:181-236)
# ---------------------------------------------------------------------------

def build_point_grid(n_per_side: int) -> np.ndarray:
    """Cell-centered n x n grid in [0,1]^2, row-major, (x, y) order."""
    offset = 1 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    xs = np.tile(pts[None, :], (n_per_side, 1))
    ys = np.tile(pts[:, None], (1, n_per_side))
    return np.stack([xs, ys], axis=-1).reshape(-1, 2)


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> List[np.ndarray]:
    return [build_point_grid(int(n_per_side / (scale_per_layer ** i)))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size: Tuple[int, ...], n_layers: int,
                        overlap_ratio: float):
    """Layer i has (2^i)^2 xyxy crops overlapping by a scaled fraction of
    the short side; layer 0 is the full image."""
    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes, layer_idxs = [[0, 0, im_w, im_h]], [0]

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_per_side))
        crop_w = crop_len(im_w, n_per_side, overlap)
        crop_h = crop_len(im_h, n_per_side, overlap)
        x0s = [int((crop_w - overlap) * i) for i in range(n_per_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_per_side)]
        for x0, y0 in product(x0s, y0s):
            crop_boxes.append([x0, y0, min(x0 + crop_w, im_w),
                               min(y0 + crop_h, im_h)])
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


# ---------------------------------------------------------------------------
# host-side geometry / NMS / RLE helpers
# ---------------------------------------------------------------------------

def nms_xyxy(boxes: np.ndarray, scores: np.ndarray,
             iou_thresh: float) -> np.ndarray:
    """Greedy box NMS (torchvision semantics: IoU > threshold suppresses;
    descending score order, stable on ties). All categories are zero in the
    reference's batched_nms calls, so plain NMS is the whole contract."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    boxes = boxes.astype(np.float64)
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        np.maximum(boxes[:, 3] - boxes[:, 1], 0)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        lt = np.maximum(boxes[i, :2], boxes[rest, :2])
        rb = np.minimum(boxes[i, 2:], boxes[rest, 2:])
        wh = np.maximum(rb - lt, 0)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-12)
        order = rest[iou <= iou_thresh]
    return np.asarray(keep, np.int64)


def is_box_near_crop_edge(boxes: np.ndarray, crop_box: List[int],
                          orig_box: List[int],
                          atol: float = 20.0) -> np.ndarray:
    """True for boxes near a crop edge that is not also an image edge
    (boxes already in ORIGINAL-image coordinates)."""
    crop = np.asarray(crop_box, np.float64)
    orig = np.asarray(orig_box, np.float64)
    b = boxes.astype(np.float64)
    near_crop = np.abs(b - crop[None]) <= atol
    near_img = np.abs(b - orig[None]) <= atol
    return np.any(near_crop & ~near_img, axis=1)


def area_from_rle(rle: Dict[str, Any]) -> int:
    return int(sum(rle["counts"][1::2]))


def _box_xyxy_to_xywh(b) -> List[float]:
    b = [float(v) for v in b]
    return [b[0], b[1], b[2] - b[0], b[3] - b[1]]


def remove_small_regions(mask: np.ndarray, area_thresh: float,
                         mode: str) -> Tuple[np.ndarray, bool]:
    """Fill small holes / drop small islands (amg.py:269-293) using the
    device connected-components op in place of OpenCV; 8-connectivity
    either way. Returns (mask, changed)."""
    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = np.asarray(mask, bool) ^ correct_holes
    labels, areas = (np.asarray(a[0]) for a in
                     connected_components(jnp.asarray(working[None])))
    small = (areas > 0) & (areas < area_thresh)
    if not small.any():
        return np.asarray(mask, bool), False
    if correct_holes:
        return np.asarray(mask, bool) | small, True
    kept = working & ~small
    if not kept.any() and working.any():
        # every region below threshold: keep the largest one
        kept = working & (areas == areas.max())
    return kept, True


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------

class SAM2AutomaticMaskGenerator:
    """Grid-prompted everything-mode segmentation over SAM2Base."""

    def __init__(self, model: SAM2Base, params,
                 points_per_side: Optional[int] = 32,
                 points_per_batch: int = 64,
                 pred_iou_thresh: float = 0.8,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0,
                 mask_threshold: float = 0.0,
                 box_nms_thresh: float = 0.7,
                 crop_n_layers: int = 0,
                 crop_nms_thresh: float = 0.7,
                 crop_overlap_ratio: float = 512 / 1500,
                 crop_n_points_downscale_factor: int = 1,
                 point_grids: Optional[List[np.ndarray]] = None,
                 min_mask_region_area: int = 0,
                 output_mode: str = "binary_mask",
                 use_m2m: bool = False,
                 multimask_output: bool = True):
        assert (points_per_side is None) != (point_grids is None), \
            "exactly one of points_per_side or point_grids must be provided"
        self.point_grids = (point_grids if point_grids is not None else
                            build_all_layer_point_grids(
                                points_per_side, crop_n_layers,
                                crop_n_points_downscale_factor))
        assert output_mode in ("binary_mask", "uncompressed_rle", "coco_rle")
        self.predictor = self._make_predictor(model, params, mask_threshold,
                                              min_mask_region_area)
        self.model = model
        self.params = params
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.mask_threshold = mask_threshold
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.crop_n_points_downscale_factor = crop_n_points_downscale_factor
        self.min_mask_region_area = min_mask_region_area
        self.output_mode = output_mode
        self.use_m2m = use_m2m
        self.multimask_output = multimask_output
        self._jit_cache: Dict = {}

    # ------------------------------------------------------------------
    # overridable hooks (the SAM-1 twin swaps these,
    # models/sam1_predictor.py)
    # ------------------------------------------------------------------
    def _make_predictor(self, model, params, mask_threshold,
                        min_mask_region_area):
        return SAM2ImagePredictor(
            model, params, mask_threshold=mask_threshold,
            max_hole_area=min_mask_region_area,
            max_sprinkle_area=min_mask_region_area)

    def _model_coords(self, points: np.ndarray, im_size) -> np.ndarray:
        """Pixel coords in the (cropped) image -> model space. SAM-2:
        normalize by the image size, scale by the square model resolution
        (transforms.py:44-72)."""
        ch, cw = im_size
        return (points / np.array([cw, ch])) * self.model.cfg.image_size

    # ------------------------------------------------------------------
    # fused device programs
    # ------------------------------------------------------------------
    def _decode_fn(self, P: int, multimask: bool, refine: bool):
        """coords [P, 1, 2] (model space) -> clamped low-res logits
        [P, M, h, w] + iou predictions [P, M]; refine adds a low-res mask
        prompt (the m2m round, single-mask output)."""
        key = ("dec", P, multimask, refine)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        model = self.model

        def raw(params, h0, h1, embed, coords, mask_in):
            def m(mdl):
                labels = jnp.ones((P, 1), jnp.int32)
                sparse, dense = mdl.sam_prompt_encoder(
                    points=(coords, labels),
                    masks=None if mask_in is None else mask_in[..., None])
                image_pe = mdl.sam_prompt_encoder.get_dense_pe()
                eb = jnp.broadcast_to(embed, (P,) + embed.shape[1:])
                f0 = jnp.broadcast_to(h0, (P,) + h0.shape[1:])
                f1 = jnp.broadcast_to(h1, (P,) + h1.shape[1:])
                dec = mdl.sam_mask_decoder(
                    eb, image_pe, sparse, dense,
                    multimask_output=multimask and not refine,
                    high_res_features=(f0, f1))
                low = jnp.clip(dec.masks.astype(jnp.float32), -32.0, 32.0)
                return low, dec.iou_pred.astype(jnp.float32)
            return model.apply(params, method=m)

        fn = jax.jit(raw)
        self._jit_cache[key] = fn
        return fn

    def _score_fn(self, N: int, crop_hw: Tuple[int, int]):
        """Low-res logits [N, h, w] -> (binary masks at crop resolution,
        stability scores, xyxy boxes): optional hole/sprinkle fill, bilinear
        upscale, two-threshold stability IoU, and the mask->box reduction,
        one device program."""
        key = ("score", N, crop_hw)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        thr = float(self.mask_threshold)
        off = float(self.stability_score_offset)
        hole = float(self.min_mask_region_area)

        def raw(low):
            filled = (postprocess_mask_scores(
                low, max_hole_area=hole, max_sprinkle_area=hole,
                mask_threshold=thr) if hole > 0 else low)
            up = resize_bilinear(filled[..., None], crop_hw)[..., 0]
            inter = jnp.sum(up > thr + off, axis=(-2, -1))
            union = jnp.sum(up > thr - off, axis=(-2, -1))
            # empty-union masks score 0 (the reference's 0/0 NaN also fails
            # every >= threshold, so the surviving set is identical)
            stab = inter / jnp.maximum(union, 1)
            binm = up > thr
            # mask -> xyxy box (amg.py:305-348): extreme coordinates via
            # max/min reductions; empty masks -> [0, 0, 0, 0]
            Hc, Wc = crop_hw
            in_h = jnp.any(binm, axis=-1)
            in_w = jnp.any(binm, axis=-2)
            hc = jnp.arange(Hc, dtype=jnp.int32)
            wc = jnp.arange(Wc, dtype=jnp.int32)
            bottom = jnp.max(jnp.where(in_h, hc[None], 0), axis=-1)
            top = jnp.min(jnp.where(in_h, hc[None], Hc), axis=-1)
            right = jnp.max(jnp.where(in_w, wc[None], 0), axis=-1)
            left = jnp.min(jnp.where(in_w, wc[None], Wc), axis=-1)
            empty = (right < left) | (bottom < top)
            boxes = jnp.stack([left, top, right, bottom], axis=-1)
            boxes = jnp.where(empty[:, None], 0, boxes)
            return binm, stab, boxes

        fn = jax.jit(raw)
        self._jit_cache[key] = fn
        return fn

    # ------------------------------------------------------------------
    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        """image: [H, W, 3] RGB uint8. Returns one record per kept mask
        (automatic_mask_generator.py:152-204)."""
        data = self._generate_masks(np.asarray(image))
        if self.output_mode == "coco_rle":
            segs = [dict(rle, counts=rle_encode(
                rle_decode(rle))["counts"]) for rle in data["rles"]]
        elif self.output_mode == "binary_mask":
            segs = [rle_decode(rle) for rle in data["rles"]]
        else:
            segs = data["rles"]
        return [{
            "segmentation": segs[i],
            "area": area_from_rle(data["rles"][i]),
            "bbox": _box_xyxy_to_xywh(data["boxes"][i]),
            "predicted_iou": float(data["iou_preds"][i]),
            "point_coords": [data["points"][i].tolist()],
            "stability_score": float(data["stability_score"][i]),
            "crop_box": _box_xyxy_to_xywh(data["crop_boxes"][i]),
        } for i in range(len(segs))]

    def _generate_masks(self, image: np.ndarray) -> Dict[str, Any]:
        orig_size = image.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            orig_size, self.crop_n_layers, self.crop_overlap_ratio)
        data = _cat_all([self._process_crop(image, cb, li, orig_size)
                         for cb, li in zip(crop_boxes, layer_idxs)])
        if len(crop_boxes) > 1:
            # dedup across crops, preferring masks from smaller crops
            cb = data["crop_boxes"].astype(np.float64)
            scores = 1.0 / np.maximum(
                (cb[:, 2] - cb[:, 0]) * (cb[:, 3] - cb[:, 1]), 1e-12)
            keep = nms_xyxy(data["boxes"].astype(np.float64), scores,
                            self.crop_nms_thresh)
            data = _filter(data, keep)
        return data

    def _crop_features(self):
        """Features for the decode program, as the 3-tuple _decode_fn
        consumes (the SAM-1 twin adapts its single embedding here)."""
        return self.predictor._features

    def _process_crop(self, image, crop_box, layer_idx, orig_size):
        x0, y0, x1, y1 = crop_box
        crop = image[y0:y1, x0:x1, :]
        ch, cw = crop.shape[:2]
        self.predictor.set_image(crop)
        feats = self._crop_features()  # device arrays, stay on device

        pts = self.point_grids[layer_idx] * np.array([cw, ch])[None]
        P = self.points_per_batch
        batches = []
        for s in range(0, len(pts), P):
            chunk = pts[s:s + P]
            n_real = len(chunk)
            if n_real < P:  # pad to the compiled batch shape
                chunk = np.concatenate(
                    [chunk, np.tile(chunk[-1:], (P - n_real, 1))])
            batches.append(self._process_batch(
                chunk, n_real, (ch, cw), crop_box, orig_size,
                feats))
        self.predictor.reset_predictor()
        data = _cat_all(batches)

        keep = nms_xyxy(data["boxes"].astype(np.float64),
                        data["iou_preds"].astype(np.float64),
                        self.box_nms_thresh)
        data = _filter(data, keep)
        data["boxes"] = data["boxes"] + np.array([x0, y0, x0, y0])
        data["points"] = data["points"] + np.array([x0, y0])
        data["crop_boxes"] = np.tile(np.asarray(crop_box, np.float64)[None],
                                     (len(data["rles"]), 1))
        return data

    def _process_batch(self, points, n_real, im_size, crop_box, orig_size,
                       feats):
        ch, cw = im_size
        orig_h, orig_w = orig_size
        P = len(points)
        coords = jnp.asarray(self._model_coords(points, im_size),
                             jnp.float32)[:, None, :]
        h0, h1, embed = feats

        low, ious = self._decode_fn(P, self.multimask_output, False)(
            self.params, h0, h1, embed, coords, None)
        M = low.shape[1]
        N = P * M
        low = np.asarray(low).reshape(N, *low.shape[2:])
        ious = np.asarray(ious).reshape(N)
        pts_rep = np.repeat(points, M, axis=0)

        if self.use_m2m:
            # one refinement round: each candidate's clamped low-res logits
            # feed back as the dense prompt for its own point, single-mask
            r_coords = jnp.asarray(self._model_coords(pts_rep, im_size),
                                   jnp.float32)[:, None, :]
            ref_fn = self._decode_fn(P, False, True)
            lows, ious_l = [], []
            for s in range(0, N, P):
                c = r_coords[s:s + P]
                m_in = jnp.asarray(low[s:s + P])
                pad = P - c.shape[0]
                if pad:
                    c = jnp.concatenate([c, jnp.tile(c[-1:], (pad, 1, 1))])
                    m_in = jnp.concatenate(
                        [m_in, jnp.tile(m_in[-1:], (pad, 1, 1))])
                lo, io = ref_fn(self.params, h0, h1, embed, c, m_in)
                lows.append(np.asarray(lo)[:P - pad, 0])
                ious_l.append(np.asarray(io)[:P - pad, 0])
            low = np.concatenate(lows)
            ious = np.concatenate(ious_l)

        binm, stab, boxes = (np.asarray(a) for a in
                             self._score_fn(N, (ch, cw))(jnp.asarray(low)))
        # drop padded grid points, then filter
        real = np.arange(N) < n_real * M
        data = dict(iou_preds=ious[real], points=pts_rep[real],
                    stability_score=np.asarray(stab)[real],
                    boxes=boxes[real].astype(np.float64))
        binm = binm[real]

        keep = np.ones(len(binm), bool)
        if self.pred_iou_thresh > 0.0:
            keep &= data["iou_preds"] > self.pred_iou_thresh
        if self.stability_score_thresh > 0.0:
            keep &= data["stability_score"] >= self.stability_score_thresh
        # boxes to original-image coordinates for the crop-edge filter
        x0, y0, _, _ = crop_box
        keep &= ~is_box_near_crop_edge(
            data["boxes"] + np.array([x0, y0, x0, y0]), crop_box,
            [0, 0, orig_w, orig_h])
        data = _filter(data, np.flatnonzero(keep))
        binm = binm[keep]

        # uncrop into the full canvas and RLE-encode (uncompressed counts,
        # Fortran order — the pycocotools layout, amg.py:109-137)
        rles = []
        for m in binm:
            canvas = np.zeros((orig_h, orig_w), bool)
            canvas[y0:y0 + ch, x0:x0 + cw] = m
            rles.append(rle_encode(canvas, compress=False))
        data["rles"] = rles
        return data

    @staticmethod
    def postprocess_small_regions(data: Dict[str, Any], min_area: int,
                                  nms_thresh: float) -> Dict[str, Any]:
        """Remove small disconnected regions/holes from every mask, then
        re-run box NMS preferring unchanged masks
        (automatic_mask_generator.py:366-415)."""
        if len(data["rles"]) == 0:
            return data
        new_masks, scores = [], []
        for rle in data["rles"]:
            mask = rle_decode(rle)
            mask, ch1 = remove_small_regions(mask, min_area, "holes")
            mask, ch2 = remove_small_regions(mask, min_area, "islands")
            new_masks.append(mask)
            scores.append(float(not (ch1 or ch2)))
        masks = np.stack(new_masks)
        ys = masks.any(axis=2)
        xs = masks.any(axis=1)
        H, W = masks.shape[1:]
        hidx, widx = np.arange(H), np.arange(W)
        bottom = np.where(ys, hidx[None], 0).max(1)
        top = np.where(ys, hidx[None], H).min(1)
        right = np.where(xs, widx[None], 0).max(1)
        left = np.where(xs, widx[None], W).min(1)
        empty = (right < left) | (bottom < top)
        boxes = np.stack([left, top, right, bottom], axis=-1)
        boxes = np.where(empty[:, None], 0, boxes).astype(np.float64)
        keep = nms_xyxy(boxes, np.asarray(scores), nms_thresh)
        for i in keep:
            if scores[i] == 0.0:  # changed: refresh RLE and box
                data["rles"][i] = rle_encode(masks[i], compress=False)
                data["boxes"][i] = boxes[i]
        return _filter(data, keep)


def _filter(data: Dict[str, Any], keep: np.ndarray) -> Dict[str, Any]:
    out = {}
    for k, v in data.items():
        out[k] = [v[i] for i in keep] if isinstance(v, list) else v[keep]
    return out


def _cat_all(parts: List[Dict[str, Any]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for p in parts:
        for k, v in p.items():
            if k not in out:
                out[k] = list(v) if isinstance(v, list) else v
            elif isinstance(v, list):
                out[k] = out[k] + v
            else:
                out[k] = np.concatenate([out[k], v], axis=0)
    return out
