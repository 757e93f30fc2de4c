"""SAM-2 image predictor: prompted single-image segmentation.

Behavioral contract from the reference SAM2ImagePredictor
(/root/reference/VideoGLaMM/model/segment_anything_2/sam2/
sam2_image_predictor.py:20-439) and SAM2Transforms
(sam2/utils/transforms.py:13-100):

- set_image: direct square antialiased-bilinear resize to cfg.image_size +
  ImageNet normalization (transforms.py:28-37), one backbone encode, and
  no_mem_embed added to the top feature level (directly_add_no_mem_embed,
  sam2_hiera_l.yaml:95, sam2_image_predictor.py:99-101);
- predict: pixel-space point/box prompts are scaled into model space
  (transforms.py:44-72); a box becomes two corner points labeled [2, 3]
  merged AHEAD of the click points into one point list
  (sam2_image_predictor.py:373-390); low-res mask logits from a previous
  round feed back as the dense mask prompt; the decoder runs WITHOUT the
  video path's object-score mask gating or best-mask selection — all
  hypothesis masks and their IoU predictions are returned
  (sam2_image_predictor.py:392-418);
- postprocessing: hole / sprinkle filling on the low-res logits via
  connected components, then bilinear resize to the original image size and
  thresholding (transforms.py:74-100).

TPU-first notes: the square resize is two cached static matrices contracted
on the MXU (same design as ops/preprocess.py); prompt rounds run through
shape-keyed jitted programs, so iterative clicking with a growing point
count compiles once per count and then reuses the cache; hole filling uses
the device connected-components op (ops/connected_components.py) instead of
the reference's CUDA extension.
"""
from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...constants import SAM_PIXEL_MEAN, SAM_PIXEL_STD
from ...ops.connected_components import postprocess_mask_scores
from ...ops.preprocess import _sep
from ...ops.resize import pil_resize_matrix, resize_bilinear
from .sam2_base import SAM2Base


@functools.lru_cache(maxsize=64)
def _square_mats(H: int, W: int, size: int):
    """Direct square resize (torchvision Resize((size, size)) with the
    antialiased bilinear filter — the PIL triangle kernel)."""
    return (pil_resize_matrix(H, size, "bilinear"),
            pil_resize_matrix(W, size, "bilinear"))


def preprocess_image_square(image, size: int, dtype=jnp.float32):
    """[H, W, 3] uint8/float in 0..255 -> [size, size, 3] SAM-normalized
    (SAM2Transforms.__call__, transforms.py:28-37; the mean/std constants
    are the 0..255-scale ImageNet values, i.e. 255 * [0.485, ...])."""
    H, W = image.shape[-3], image.shape[-2]
    x = jnp.asarray(image).astype(jnp.float32)
    y = _sep(x, *_square_mats(int(H), int(W), size))
    y = (y - jnp.asarray(SAM_PIXEL_MEAN)) / jnp.asarray(SAM_PIXEL_STD)
    return y.astype(dtype)


class SAM2ImagePredictor:
    """Stateful single/batch-image prompting session over SAM2Base.

    Mirrors the reference user API: set_image / set_image_batch -> predict /
    predict_batch -> (masks at original resolution, iou predictions,
    low-res logits reusable as the next round's mask_input), plus
    reset_predictor and get_image_embedding.
    """

    def __init__(self, model: SAM2Base, params, mask_threshold: float = 0.0,
                 max_hole_area: float = 0.0, max_sprinkle_area: float = 0.0):
        self.model = model
        self.params = params
        self.mask_threshold = float(mask_threshold)
        self.max_hole_area = float(max_hole_area)
        self.max_sprinkle_area = float(max_sprinkle_area)
        self._jit_cache = {}

        def encode(p, x):
            def m(mdl, imgs):
                feats, _ = mdl.forward_image(imgs)
                top = feats[2] + mdl.no_mem_embed.reshape(
                    1, 1, 1, -1).astype(feats[2].dtype)
                return feats[0], feats[1], top
            return model.apply(p, x, method=m)

        self._encode = jax.jit(encode)
        self.reset_predictor()

    # ------------------------------------------------------------------
    def reset_predictor(self) -> None:
        """Drop the set image(s) and their embeddings
        (sam2_image_predictor.py:439-447)."""
        self._features = None
        self._orig_hw: List = []
        self._is_image_set = False
        self._is_batch = False

    def set_image(self, image) -> None:
        """image: [H, W, 3] RGB np.ndarray (or PIL Image) in 0..255."""
        self.reset_predictor()
        img = np.asarray(image)
        assert img.ndim == 3 and img.shape[-1] == 3, img.shape
        self._orig_hw = [img.shape[:2]]
        x = preprocess_image_square(img, self.model.cfg.image_size,
                                    dtype=self.model.dtype)
        self._features = self._encode(self.params, x[None])
        self._is_image_set = True

    def set_image_batch(self, image_list) -> None:
        """Same-size images encode as ONE batch (the TPU-friendly layout);
        mixed sizes fall back to per-image encodes."""
        self.reset_predictor()
        imgs = [np.asarray(im) for im in image_list]
        self._orig_hw = [im.shape[:2] for im in imgs]
        size = self.model.cfg.image_size
        x = jnp.stack([preprocess_image_square(im, size,
                                               dtype=self.model.dtype)
                       for im in imgs])
        self._features = self._encode(self.params, x)
        self._is_image_set = True
        self._is_batch = True

    def get_image_embedding(self, channels_first: bool = False):
        """Top-level image embedding. DEFAULT LAYOUT DIVERGES FROM THE
        REFERENCE: channels-last [B, E, E, C] (the TPU-native layout every
        internal consumer uses); the reference returns [B, C, E, E]. Code
        ported from the reference should pass channels_first=True to get
        the torch layout explicitly."""
        assert self._is_image_set, "call set_image first"
        emb = self._features[2]
        return jnp.moveaxis(emb, -1, 1) if channels_first else emb

    # ------------------------------------------------------------------
    def _prep_prompts(self, point_coords, point_labels, box, mask_input,
                      normalize_coords: bool, img_idx: int):
        """Host-side prompt normalization (sam2_image_predictor.py:285-316 +
        transforms.py:44-72): scale pixel coords from the original image
        into model space; merge box corners ahead of the points."""
        size = self.model.cfg.image_size
        H, W = self._orig_hw[img_idx]
        coords_parts, label_parts = [], []
        if box is not None:
            b = np.asarray(box, np.float32).reshape(-1, 2, 2)
            if normalize_coords:
                b = b / np.asarray([W, H], np.float32)
            b = b * size
            coords_parts.append(b)
            label_parts.append(np.tile(np.asarray([[2, 3]], np.int32),
                                       (b.shape[0], 1)))
        if point_coords is not None:
            assert point_labels is not None, \
                "point_labels must be supplied with point_coords"
            c = np.asarray(point_coords, np.float32)
            l = np.asarray(point_labels, np.int32)
            if c.ndim == 2:
                c, l = c[None], l[None]
            if normalize_coords:
                c = c / np.asarray([W, H], np.float32)
            c = c * size
            coords_parts.append(c)
            label_parts.append(l)
        coords = labels = None
        if coords_parts:
            B = max(p.shape[0] for p in coords_parts)
            coords_parts = [np.broadcast_to(p, (B,) + p.shape[1:])
                            for p in coords_parts]
            label_parts = [np.broadcast_to(p, (B,) + p.shape[1:])
                           for p in label_parts]
            coords = jnp.asarray(np.concatenate(coords_parts, axis=1))
            labels = jnp.asarray(np.concatenate(label_parts, axis=1))
        mask_in = None
        if mask_input is not None:
            m = np.asarray(mask_input, np.float32)
            if m.ndim == 3:          # [1, h, w] torch layout
                m = m[None]
            mask_in = jnp.asarray(m.transpose(0, 2, 3, 1))  # -> [B, h, w, 1]
        return coords, labels, mask_in

    def _decode_fn(self, n_points: int, has_mask: bool, multimask: bool):
        key = (n_points, has_mask, multimask)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        model = self.model

        def raw(params, h0, h1, embed, coords, labels, mask_in):
            def m(mdl):
                B = (coords.shape[0] if coords is not None else
                     (mask_in.shape[0] if mask_in is not None else 1))
                sparse, dense = mdl.sam_prompt_encoder(
                    points=(coords, labels) if coords is not None else None,
                    masks=mask_in)
                image_pe = mdl.sam_prompt_encoder.get_dense_pe()
                # repeat_image: one encoded image serves a batch of prompts
                # (sam2_image_predictor.py:393-396)
                eb = jnp.broadcast_to(embed, (B,) + embed.shape[1:])
                f0 = jnp.broadcast_to(h0, (B,) + h0.shape[1:])
                f1 = jnp.broadcast_to(h1, (B,) + h1.shape[1:])
                dec = mdl.sam_mask_decoder(
                    eb, image_pe, sparse, dense,
                    multimask_output=multimask,
                    high_res_features=(f0, f1))
                return dec.masks.astype(jnp.float32), \
                    dec.iou_pred.astype(jnp.float32)
            return model.apply(params, method=m)

        fn = jax.jit(raw)
        self._jit_cache[key] = fn
        return fn

    def _predict_idx(self, img_idx, point_coords, point_labels, box,
                     mask_input, multimask_output, return_logits,
                     normalize_coords):
        assert self._is_image_set, \
            "an image must be set with set_image(...) before prediction"
        coords, labels, mask_in = self._prep_prompts(
            point_coords, point_labels, box, mask_input, normalize_coords,
            img_idx)
        fn = self._decode_fn(
            0 if coords is None else int(coords.shape[1]),
            mask_in is not None, bool(multimask_output))
        h0, h1, embed = (f[img_idx][None] for f in self._features)
        low_res, ious = fn(self.params, h0, h1, embed, coords, labels,
                           mask_in)

        B, M, h, w = low_res.shape
        filled = low_res
        if self.max_hole_area > 0 or self.max_sprinkle_area > 0:
            filled = postprocess_mask_scores(
                low_res.reshape(B * M, h, w),
                max_hole_area=self.max_hole_area,
                max_sprinkle_area=self.max_sprinkle_area,
                mask_threshold=self.mask_threshold).reshape(low_res.shape)
        masks = resize_bilinear(
            filled.reshape(B * M, h, w)[..., None],
            tuple(self._orig_hw[img_idx]))[..., 0].reshape(
            (B, M) + tuple(self._orig_hw[img_idx]))
        masks = np.asarray(masks)
        if not return_logits:
            masks = masks > self.mask_threshold
        # low-res logits are clamped for reuse as the next mask_input
        # (sam2_image_predictor.py:416)
        low_np = np.clip(np.asarray(low_res), -32.0, 32.0)
        return masks, np.asarray(ious), low_np

    # ------------------------------------------------------------------
    def predict(self, point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                mask_input: Optional[np.ndarray] = None,
                multimask_output: bool = True, return_logits: bool = False,
                normalize_coords: bool = True):
        """Predict masks for the set image. Returns (masks [C, H, W],
        iou_predictions [C], low_res_logits [C, 4E, 4E]) — C = 3 when
        multimask_output else 1 (sam2_image_predictor.py:217-283)."""
        masks, ious, low = self._predict_idx(
            -1, point_coords, point_labels, box, mask_input,
            multimask_output, return_logits, normalize_coords)
        if masks.shape[0] == 1:  # torch .squeeze(0): multi-box keeps [B,...]
            masks, ious, low = masks[0], ious[0], low[0]
        return masks, ious, low

    def predict_batch(self, point_coords_batch=None, point_labels_batch=None,
                      box_batch=None, mask_input_batch=None,
                      multimask_output: bool = True,
                      return_logits: bool = False,
                      normalize_coords: bool = True):
        """Per-image prompts over a set_image_batch session
        (sam2_image_predictor.py:155-215)."""
        assert self._is_batch, "use set_image_batch for batched prediction"
        n = len(self._orig_hw)

        def pick(lst, i):
            return None if lst is None else lst[i]

        all_masks, all_ious, all_lows = [], [], []
        for i in range(n):
            masks, ious, low = self._predict_idx(
                i, pick(point_coords_batch, i), pick(point_labels_batch, i),
                pick(box_batch, i), pick(mask_input_batch, i),
                multimask_output, return_logits, normalize_coords)
            if masks.shape[0] == 1:
                masks, ious, low = masks[0], ious[0], low[0]
            all_masks.append(masks)
            all_ious.append(ious)
            all_lows.append(low)
        return all_masks, all_ious, all_lows
