"""Fused on-device video preprocessing: decoded uint8 frames -> all three
encoder input streams in ONE compiled program.

The reference preprocesses per frame on the host with PIL/cv2
(/root/reference/VideoGLaMM/chat.py:382-427 + utils/enc_preprocessors.py +
utils/sam_transforms.py): InternVideo2 224^2 bilinear + ImageNet norm, CLIP
shortest-edge 336 bicubic + center crop + CLIP norm, SAM-2 longest-side 1024
bilinear + SAM norm (+ a torch bilinear to the square). That host boundary
costs a per-frame CPU tax the accelerator waits on.

TPU-first redesign: every PIL/torch resize is a SEPARABLE LINEAR map with a
static (in_size, out_size) matrix (ops/resize.py pil_resize_matrix /
_linear_matrix), so the whole pipeline — three resizes, the CLIP center
crop (a row-slice of the resize matrix), the SAM resize-then-square
composition, and all three normalizations (resize matrices are
row-stochastic, so normalize commutes with resize) — folds into six small
matmuls on the MXU. The host ships ONE uint8 tensor per clip; all float
traffic stays in HBM.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from ..constants import (CLIP_IMAGE_SIZE, CLIP_MEAN, CLIP_STD, IMAGENET_MEAN,
                         IMAGENET_STD, INTERNVIDEO_IMAGE_SIZE,
                         SAM_IMAGE_SIZE, SAM_PIXEL_MEAN, SAM_PIXEL_STD)
from .resize import _linear_matrix, pil_resize_matrix


@functools.lru_cache(maxsize=64)
def _iv_mats(H: int, W: int, size: int):
    """Direct bilinear to size x size (reference VideoTrainProcessor,
    internvideo utils.py:104-140)."""
    return pil_resize_matrix(H, size, "bilinear"), \
        pil_resize_matrix(W, size, "bilinear")


@functools.lru_cache(maxsize=64)
def _clip_mats(H: int, W: int, size: int):
    """Shortest-edge bicubic + center crop (HF CLIPImageProcessor defaults,
    reference enc_preprocessors.py:106-166). The crop is a row-slice of the
    resize matrix."""
    short = min(W, H)
    nw, nh = round(W * size / short), round(H * size / short)
    mh = pil_resize_matrix(H, nh, "bicubic")
    mw = pil_resize_matrix(W, nw, "bicubic")
    top, left = (nh - size) // 2, (nw - size) // 2
    return mh[top:top + size], mw[left:left + size]


@functools.lru_cache(maxsize=64)
def _sam_mats(H: int, W: int, size: int):
    """ResizeLongestSide (PIL bilinear) then torch bilinear to the square
    (reference utils/sam_transforms.py:26-74, model_type='sam2'). Both maps
    are row-stochastic, so they compose into one matrix per axis and the
    normalization that sits between them in the reference commutes out."""
    scale = size / max(W, H)
    nw, nh = int(W * scale + 0.5), int(H * scale + 0.5)
    mh = pil_resize_matrix(H, nh, "bilinear")
    mw = pil_resize_matrix(W, nw, "bilinear")
    if nh != size:
        mh = _linear_matrix(nh, size) @ mh
    if nw != size:
        mw = _linear_matrix(nw, size) @ mw
    return mh, mw


def _sep(x, mh, mw):
    """x: [..., H, W, C] f32 -> [..., oh, ow, C]."""
    y = jnp.einsum("oh,...hwc->...owc", jnp.asarray(mh), x)
    return jnp.einsum("pw,...owc->...opc", jnp.asarray(mw), y)


def _sep_clamped(x, mh, mw):
    """PIL's uint8 bicubic clamps overshoot to [0, 255] between its
    horizontal and vertical passes (ImagingResampleInner: x-pass first);
    without this the composed map diverges by up to ~0.13 pixel-scale at
    overshooting edges. Bilinear kernels are non-negative, so only the
    bicubic (CLIP) stream needs it."""
    y = jnp.einsum("pw,...hwc->...hpc", jnp.asarray(mw), x)
    y = jnp.clip(y, 0.0, 255.0)
    y = jnp.einsum("oh,...hpc->...opc", jnp.asarray(mh), y)
    return jnp.clip(y, 0.0, 255.0)


def preprocess_iv_stream(frames, size: int = INTERNVIDEO_IMAGE_SIZE,
                         dtype=jnp.float32) -> jnp.ndarray:
    """[.., H, W, 3] uint8/float 0-255 -> [.., size, size, 3] ImageNet-norm."""
    H, W = frames.shape[-3], frames.shape[-2]
    x = frames.astype(jnp.float32)
    iv = _sep(x, *_iv_mats(H, W, size)) / 255.0
    iv = (iv - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return iv.astype(dtype)


def preprocess_clip_stream(frames, size: int = CLIP_IMAGE_SIZE,
                           dtype=jnp.float32) -> jnp.ndarray:
    """[.., H, W, 3] -> [.., size, size, 3] CLIP-norm (bicubic + crop)."""
    H, W = frames.shape[-3], frames.shape[-2]
    x = frames.astype(jnp.float32)
    cl = _sep_clamped(x, *_clip_mats(H, W, size)) / 255.0
    cl = (cl - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    return cl.astype(dtype)


def preprocess_sam_stream(frames, size: int = SAM_IMAGE_SIZE,
                          dtype=jnp.float32) -> jnp.ndarray:
    """[.., H, W, 3] -> [.., size, size, 3] SAM-norm. Separate from the
    other streams because eval propagates masks over ALL frames while the
    LLM prefix sees a sampled subset (reference eval_mevis.py)."""
    H, W = frames.shape[-3], frames.shape[-2]
    x = frames.astype(jnp.float32)
    sam = _sep(x, *_sam_mats(H, W, size))
    sam = (sam - jnp.asarray(SAM_PIXEL_MEAN)) / jnp.asarray(SAM_PIXEL_STD)
    return sam.astype(dtype)


def preprocess_streams(frames,
                       iv_size: int = INTERNVIDEO_IMAGE_SIZE,
                       clip_size: int = CLIP_IMAGE_SIZE,
                       sam_size: int = SAM_IMAGE_SIZE,
                       dtype=jnp.float32,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[T, H, W, 3] uint8 (or float 0-255) RGB frames -> the three encoder
    streams ([T, 224, 224, 3] ImageNet-norm, [T, 336, 336, 3] CLIP-norm,
    [T, 1024, 1024, 3] SAM-norm), jit-friendly, float-exact vs the PIL host
    path (data/preprocess.py) up to the host's uint8 coefficient
    quantization (~1/255 per pixel, plus inter-pass clamping on bicubic)."""
    return (preprocess_iv_stream(frames, iv_size, dtype),
            preprocess_clip_stream(frames, clip_size, dtype),
            preprocess_sam_stream(frames, sam_size, dtype))
