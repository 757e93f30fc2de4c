"""Image resize with exact torch F.interpolate semantics.

The reference resizes masks/frames with F.interpolate(mode='bilinear',
align_corners=False) everywhere (e.g. /root/reference/VideoGLaMM/model/
VideoGLaMM.py:152 and sam_transforms). Bit-comparable mask outputs require
matching its half-pixel sampling + edge clamping, which we implement as two
separable 1-D gathers expressed as sparse matmuls (MXU-friendly for the
1024->orig_hw mask upsamples).
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def _linear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Row-stochastic matrix implementing 1-D linear interpolation with
    half-pixel centers (align_corners=False) and edge clamping."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        src = min(max(src, 0.0), in_size - 1.0)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


@functools.lru_cache(maxsize=256)
def _cubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """1-D cubic-convolution interpolation (a=-0.75) with half-pixel centers
    and edge clamping — torch F.interpolate(mode='bicubic',
    align_corners=False) semantics."""
    a = -0.75

    def k(t):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
        if t < 2:
            return a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
        return 0.0

    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        lo = int(np.floor(src))
        for j in range(lo - 1, lo + 3):
            w = k(src - j)
            m[i, min(max(j, 0), in_size - 1)] += w
    return m


@functools.lru_cache(maxsize=256)
def _pil_matrix(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """Row-stochastic matrix implementing PIL Image.resize's ANTIALIASED
    separable filter (Pillow precompute_coeffs): kernel support scales with
    the downscale factor and boundary windows are clipped + renormalized —
    unlike torch's fixed-2-tap align_corners=False sampling. This is the
    math of the reference host pipeline's PIL resizes (utils/
    sam_transforms.py, internvideo utils.py, HF CLIPImageProcessor), so the
    on-device preprocessing can reproduce them as matmuls. float-exact vs
    PIL mode-'F' resizes; the uint8 path additionally quantizes
    coefficients, bounded by ~1/255 per pixel."""
    if mode == "bilinear":
        support = 1.0

        def f(t):
            t = abs(t)
            return 1.0 - t if t < 1.0 else 0.0
    elif mode == "bicubic":
        support, a = 2.0, -0.5

        def f(t):
            t = abs(t)
            if t <= 1.0:
                return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
            if t < 2.0:
                return a * (t ** 3 - 5 * t ** 2 + 8 * t - 4)
            return 0.0
    else:
        raise ValueError(mode)

    m = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    fscale = max(scale, 1.0)
    sup = support * fscale
    for i in range(out_size):
        center = (i + 0.5) * scale
        jmin = max(int(center - sup + 0.5), 0)
        jmax = min(int(center + sup + 0.5), in_size)
        w = np.array([f((j + 0.5 - center) / fscale)
                      for j in range(jmin, jmax)])
        m[i, jmin:jmax] = w / w.sum()
    return m.astype(np.float32)


def pil_resize_matrix(in_size: int, out_size: int,
                      mode: str = "bilinear") -> np.ndarray:
    """Public accessor for the PIL-semantics 1-D resize matrix."""
    return _pil_matrix(in_size, out_size, mode)


@functools.lru_cache(maxsize=256)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Torch F.interpolate(mode='nearest'): src = floor(i * in/out)."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        src = min(int(i * in_size / out_size), in_size - 1)
        m[i, src] = 1.0
    return m


def _apply_separable(x, mh, mw):
    """x: [..., H, W, C]."""
    xf = x.astype(jnp.float32)
    y = jnp.einsum("oh,...hwc->...owc", mh, xf)
    y = jnp.einsum("pw,...owc->...opc", mw, y)
    return y


def resize_bilinear(x, out_hw, channels_last: bool = True):
    """Bilinear resize matching torch align_corners=False.

    x: [..., H, W, C] (channels_last) or [..., H, W] when the trailing dim is
    spatial; pass channels_last=False for [..., C, H, W]."""
    oh, ow = out_hw
    if not channels_last:
        x = jnp.moveaxis(x, -3, -1)
    H, W = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(_linear_matrix(H, oh))
    mw = jnp.asarray(_linear_matrix(W, ow))
    y = _apply_separable(x, mh, mw).astype(x.dtype)
    if not channels_last:
        y = jnp.moveaxis(y, -1, -3)
    return y


def resize_bilinear_antialias(x, out_hw, channels_last: bool = True):
    """torch F.interpolate(mode='bilinear', antialias=True) semantics: the
    triangle kernel's support scales with the downscale factor and clipped
    boundary windows renormalize — identical math to PIL's BILINEAR filter
    (torch's _upsample_bilinear2d_aa implements exactly that), so the PIL
    matrix serves both. Used by SAM-2's mask-input path
    (reference sam2_base.py:422-428)."""
    oh, ow = out_hw
    if not channels_last:
        x = jnp.moveaxis(x, -3, -1)
    H, W = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(_pil_matrix(H, oh, "bilinear"))
    mw = jnp.asarray(_pil_matrix(W, ow, "bilinear"))
    y = _apply_separable(x, mh, mw).astype(x.dtype)
    if not channels_last:
        y = jnp.moveaxis(y, -1, -3)
    return y


def resize_bicubic(x, out_hw, channels_last: bool = True):
    """Bicubic resize matching torch align_corners=False (used by the Hiera
    background position embedding, reference hieradet.py:271)."""
    oh, ow = out_hw
    if not channels_last:
        x = jnp.moveaxis(x, -3, -1)
    H, W = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(_cubic_matrix(H, oh))
    mw = jnp.asarray(_cubic_matrix(W, ow))
    y = _apply_separable(x, mh, mw).astype(x.dtype)
    if not channels_last:
        y = jnp.moveaxis(y, -1, -3)
    return y


def resize_nearest(x, out_hw, channels_last: bool = True):
    oh, ow = out_hw
    if not channels_last:
        x = jnp.moveaxis(x, -3, -1)
    H, W = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(_nearest_matrix(H, oh))
    mw = jnp.asarray(_nearest_matrix(W, ow))
    y = _apply_separable(x, mh, mw).astype(x.dtype)
    if not channels_last:
        y = jnp.moveaxis(y, -1, -3)
    return y
