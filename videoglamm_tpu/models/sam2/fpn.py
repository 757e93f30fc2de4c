"""SAM-2 image encoder = Hiera trunk + FPN neck.

Behavioral contract from the reference
(/root/reference/VideoGLaMM/model/segment_anything_2/sam2/modeling/backbones/
image_encoder.py): 1x1 lateral convs to d_model, top-down 2x nearest
upsampling added only at the configured levels, per-level sine position
encodings, `scalp=1` drops the lowest-resolution level. Output levels for
Hiera-L @1024: 256x256, 128x128, 64x64 (all 256-d).
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ...config import SAM2Config
from ...ops.resize import resize_nearest
from .hiera import Hiera
from .pos_enc import sine_pe


class FpnNeck(nn.Module):
    cfg: SAM2Config
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]):
        """xs: per-stage trunk features, HIGHEST resolution first.

        Returns (features, pos) lists, highest resolution first."""
        cfg = self.cfg
        n = len(xs) - 1
        out = [None] * len(xs)
        pos = [None] * len(xs)
        prev = None
        # top-down: lowest resolution (index n) first. Lateral conv index
        # follows the reference convention: convs[j] consumes the (n-j)-th
        # resolution level (backbone_channel_list is highest-stage first).
        for i in range(n, -1, -1):
            lateral = nn.Dense(cfg.d_model, dtype=self.dtype,
                               param_dtype=jnp.float32,
                               name=f"convs_{n - i}")(xs[i].astype(self.dtype))
            if i in cfg.fpn_top_down_levels and prev is not None:
                h, w = lateral.shape[1], lateral.shape[2]
                top_down = resize_nearest(prev.astype(jnp.float32), (h, w))
                prev = lateral + top_down.astype(lateral.dtype)
            else:
                prev = lateral
            out[i] = prev
            pos[i] = sine_pe(prev.shape[1], prev.shape[2], cfg.d_model)
        return out, pos


class SAM2ImageEncoder(nn.Module):
    """Trunk + neck; drops `backbone_scalp` lowest-res levels.

    __call__(images [B,H,W,3]) -> (features, pos): lists of channels-last
    feature maps, highest resolution first; features[-1] is the SAM trunk
    feature (stride 16)."""
    cfg: SAM2Config
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        cfg = self.cfg
        feats = Hiera(cfg.hiera, dtype=self.dtype, name="trunk")(images)
        feats, pos = FpnNeck(cfg, dtype=self.dtype, name="neck")(feats)
        if cfg.backbone_scalp > 0:
            feats = feats[: -cfg.backbone_scalp]
            pos = pos[: -cfg.backbone_scalp]
        return feats, pos
