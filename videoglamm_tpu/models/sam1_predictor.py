"""SAM-1 prompted image predictor + automatic mask generator.

Behavioral contract from the reference segment-anything fork
(/root/reference/VideoGLaMM/model/segment_anything/predictor.py:16-269,
utils/transforms.py:16-111, automatic_mask_generator.py:23-372,
modeling/sam.py preprocess/postprocess_masks):

- set_image: ResizeLongestSide (scale so the longest side equals the model
  resolution; PIL-bilinear), ImageNet 0..255 normalization, then zero-pad
  bottom/right to the square model resolution;
- predict: pixel prompts scale by the SAME longest-side factor (not the
  SAM-2 per-axis square normalization); boxes go through the prompt
  encoder's corner-embedding path (no padding point is appended when a box
  is present); mask_input is the 4x-embedding-resolution dense prompt;
- postprocess: low-res logits -> bilinear to the square model resolution
  -> crop the valid (newh, neww) region -> bilinear to the original size;
- the automatic generator is the SAM-2 one minus m2m (and the SAM-1
  generate() DOES run postprocess_small_regions when min_mask_region_area
  is set, automatic_mask_generator.py:156-161).

TPU-first notes: same design as the SAM-2 twins — cached separable resize
matrices feed the MXU, decode+score run as fixed-shape jitted programs
keyed by prompt layout, and the AMG host pipeline (grids, NMS, RLE, crops)
is shared with models/sam2/amg.py via its override hooks.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import SAM_PIXEL_MEAN, SAM_PIXEL_STD
from ..ops.preprocess import _sep
from ..ops.resize import pil_resize_matrix, resize_bilinear
from .sam1 import SAM1
from .sam2.amg import SAM2AutomaticMaskGenerator


def preprocess_shape(h: int, w: int, long_side: int) -> Tuple[int, int]:
    """ResizeLongestSide.get_preprocess_shape (transforms.py:103-111)."""
    scale = long_side / max(h, w)
    return int(h * scale + 0.5), int(w * scale + 0.5)


@functools.lru_cache(maxsize=64)
def _longest_mats(H: int, W: int, size: int):
    nh, nw = preprocess_shape(H, W, size)
    return pil_resize_matrix(H, nh, "bilinear"), \
        pil_resize_matrix(W, nw, "bilinear"), (nh, nw)


def preprocess_image_longest(image, size: int, dtype=jnp.float32):
    """[H, W, 3] uint8/float 0..255 -> ([size, size, 3] normalized with
    bottom/right zero pad, (newh, neww))."""
    H, W = image.shape[-3], image.shape[-2]
    mh, mw, (nh, nw) = _longest_mats(int(H), int(W), size)
    x = jnp.asarray(image).astype(jnp.float32)
    y = _sep(x, mh, mw)
    y = (y - jnp.asarray(SAM_PIXEL_MEAN)) / jnp.asarray(SAM_PIXEL_STD)
    y = jnp.pad(y, ((0, size - nh), (0, size - nw), (0, 0)))
    return y.astype(dtype), (nh, nw)


class SAM1ImagePredictor:
    """Stateful single-image prompting session over SAM1 (the reference
    SamPredictor: set_image -> predict -> reset_image)."""

    def __init__(self, model: SAM1, params, mask_threshold: float = 0.0):
        self.model = model
        self.params = params
        self.mask_threshold = float(mask_threshold)
        self._jit_cache = {}
        self._encode = jax.jit(lambda p, x: model.apply(
            p, x, method=lambda mdl, a: mdl.forward_image(a)))
        self.reset_image()

    def reset_image(self) -> None:
        self._features = None
        self._orig_hw = None
        self._input_hw = None
        self._is_image_set = False

    # the shared AMG pipeline calls the SAM-2 predictor method name
    reset_predictor = reset_image

    def set_image(self, image, image_format: str = "RGB") -> None:
        assert image_format in ("RGB", "BGR")
        img = np.asarray(image)
        if image_format == "BGR":
            img = img[..., ::-1]
        self.reset_image()
        self._orig_hw = img.shape[:2]
        x, self._input_hw = preprocess_image_longest(
            img, self.model.cfg.image_size, dtype=self.model.dtype)
        self._features = self._encode(self.params, x[None])
        self._is_image_set = True

    def get_image_embedding(self, channels_first: bool = False):
        """[B, E, E, C] channels-last by default (the reference returns
        [B, C, E, E]; pass channels_first=True for the torch layout)."""
        assert self._is_image_set, "call set_image first"
        emb = self._features
        return jnp.moveaxis(emb, -1, 1) if channels_first else emb

    # ------------------------------------------------------------------
    def _coord_scale(self):
        """Per-axis (sx, sy) from the ROUNDED resized shape — the reference
        apply_coords scales by (new_w / old_w, new_h / old_h)
        (transforms.py:36-49), which differs from the uniform longest-side
        factor by the +0.5 rounding."""
        H, W = self._orig_hw
        nh, nw = self._input_hw
        return nw / W, nh / H

    def _decode_fn(self, n_points: int, has_box: bool, has_mask: bool,
                   multimask: bool):
        key = (n_points, has_box, has_mask, multimask)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        model = self.model

        def raw(params, embed, coords, labels, boxes, mask_in):
            def m(mdl):
                B = (coords.shape[0] if coords is not None else
                     boxes.shape[0] if boxes is not None else
                     mask_in.shape[0] if mask_in is not None else 1)
                sparse, dense = mdl.prompt_encoder(
                    points=(coords, labels) if coords is not None else None,
                    boxes=boxes, masks=mask_in)
                pe = mdl.prompt_encoder.get_dense_pe()
                eb = jnp.broadcast_to(embed, (B,) + embed.shape[1:])
                dec = mdl.mask_decoder(eb, pe, sparse, dense,
                                       multimask_output=multimask)
                return dec.masks.astype(jnp.float32), \
                    dec.iou_pred.astype(jnp.float32)
            return model.apply(params, method=m)

        fn = jax.jit(raw)
        self._jit_cache[key] = fn
        return fn

    def postprocess_masks(self, low_res):
        """[N, h, w] low-res logits -> [N, H, W] at the original size
        (Sam.postprocess_masks: upscale to the square model resolution,
        crop the valid region, upscale to the original size)."""
        size = self.model.cfg.image_size
        nh, nw = self._input_hw
        up = resize_bilinear(low_res[..., None], (size, size))
        up = up[:, :nh, :nw]
        return resize_bilinear(up, tuple(self._orig_hw))[..., 0]

    def predict(self, point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                mask_input: Optional[np.ndarray] = None,
                multimask_output: bool = True,
                return_logits: bool = False):
        """Returns (masks [C, H, W], iou_predictions [C],
        low_res_logits [C, 4E, 4E]) — C = 3 when multimask else 1
        (predictor.py:66-153)."""
        assert self._is_image_set, \
            "an image must be set with set_image(...) before prediction"
        sx, sy = self._coord_scale()
        sc = np.asarray([sx, sy], np.float32)
        coords = labels = boxes = mask_in = None
        if point_coords is not None:
            assert point_labels is not None
            coords = jnp.asarray(np.asarray(point_coords, np.float32) * sc
                                 )[None]
            labels = jnp.asarray(np.asarray(point_labels, np.int32))[None]
        if box is not None:
            boxes = jnp.asarray(
                np.asarray(box, np.float32).reshape(1, 2, 2) * sc
            ).reshape(1, 4)
        if mask_input is not None:
            m = np.asarray(mask_input, np.float32)
            if m.ndim == 3:          # [1, h, w] torch layout
                m = m[None]
            mask_in = jnp.asarray(m.transpose(0, 2, 3, 1))
        fn = self._decode_fn(
            0 if coords is None else int(coords.shape[1]),
            boxes is not None, mask_in is not None, bool(multimask_output))
        low, ious = fn(self.params, self._features, coords, labels, boxes,
                       mask_in)
        B, M = low.shape[:2]
        masks = np.asarray(self.postprocess_masks(
            low.reshape((B * M,) + low.shape[2:]))).reshape(
            (B, M) + tuple(self._orig_hw))
        if not return_logits:
            masks = masks > self.mask_threshold
        return masks[0], np.asarray(ious)[0], np.asarray(low)[0]


class SAM1AutomaticMaskGenerator(SAM2AutomaticMaskGenerator):
    """SamAutomaticMaskGenerator twin over the shared AMG pipeline
    (automatic_mask_generator.py:23-372): SAM-1 longest-side coordinate
    transform, no high-res features, the crop-aware postprocess chain, and
    small-region cleanup inside generate()."""

    def __init__(self, model: SAM1, params, **kw):
        kw.setdefault("use_m2m", False)
        assert not kw["use_m2m"], "SAM-1 has no m2m refinement round"
        super().__init__(model, params, **kw)

    def _make_predictor(self, model, params, mask_threshold,
                        min_mask_region_area):
        # SAM-1 runs small-region cleanup AFTER generation
        # (postprocess_small_regions), not inside the transforms
        return SAM1ImagePredictor(model, params,
                                  mask_threshold=mask_threshold)

    def _model_coords(self, points, im_size):
        ch, cw = im_size
        nh, nw = preprocess_shape(ch, cw, self.model.cfg.image_size)
        return points * np.array([nw / cw, nh / ch])

    def _decode_fn(self, P: int, multimask: bool, refine: bool):
        assert not refine
        key = ("dec", P, multimask)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        model = self.model

        def raw(params, h0, h1, embed, coords, mask_in):
            del h0, h1, mask_in

            def m(mdl):
                labels = jnp.ones((P, 1), jnp.int32)
                sparse, dense = mdl.prompt_encoder(points=(coords, labels))
                pe = mdl.prompt_encoder.get_dense_pe()
                eb = jnp.broadcast_to(embed, (P,) + embed.shape[1:])
                dec = mdl.mask_decoder(eb, pe, sparse, dense,
                                       multimask_output=multimask)
                low = jnp.clip(dec.masks.astype(jnp.float32), -32.0, 32.0)
                return low, dec.iou_pred.astype(jnp.float32)
            return model.apply(params, method=m)

        fn = jax.jit(raw)
        self._jit_cache[key] = fn
        return fn

    def _score_fn(self, N: int, crop_hw: Tuple[int, int]):
        key = ("score", N, crop_hw)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        thr = float(self.mask_threshold)
        off = float(self.stability_score_offset)
        size = self.model.cfg.image_size
        nh, nw = preprocess_shape(crop_hw[0], crop_hw[1], size)

        def raw(low):
            up = resize_bilinear(low[..., None], (size, size))[:, :nh, :nw]
            up = resize_bilinear(up, crop_hw)[..., 0]
            inter = jnp.sum(up > thr + off, axis=(-2, -1))
            union = jnp.sum(up > thr - off, axis=(-2, -1))
            stab = inter / jnp.maximum(union, 1)
            binm = up > thr
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

    def _crop_features(self):
        # one embedding level -> the shared pipeline's 3-tuple contract
        return (None, None, self.predictor._features)

    def _generate_masks(self, image: np.ndarray):
        data = super()._generate_masks(image)
        if self.min_mask_region_area > 0:
            # SAM-1 runs the cleanup inside generate
            # (automatic_mask_generator.py:156-161)
            data = self.postprocess_small_regions(
                data, self.min_mask_region_area,
                max(self.box_nms_thresh, self.crop_nms_thresh))
        return data
