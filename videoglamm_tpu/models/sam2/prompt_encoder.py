"""SAM-2 prompt encoder with the VideoGLaMM text-prompt extension.

Behavioral contract from the reference
(/root/reference/VideoGLaMM/model/segment_anything_2/sam2/modeling/sam/
prompt_encoder.py:17-245): random-Fourier point PE + learned per-label
embeddings; box corners as two labeled points; mask downscaling conv stack;
`text_embeds` concatenated onto the sparse embeddings (the VideoGLaMM hook at
:179-180 — this is how `[SEG]` projections prompt the decoder).

TPU-first notes: prompts are fixed-shape with label -1 = padding (the
reference mutates tensors in place per label; here it is a vectorized
select), so any prompt mix compiles to one program.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ...config import SAM2Config
from ..common import LayerNorm
from .pos_enc import random_pe_coords, random_pe_grid


class PromptEncoder(nn.Module):
    cfg: SAM2Config
    mask_in_chans: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.cfg.d_model
        self.pe_gauss = self.param("pe_gauss", nn.initializers.normal(1.0),
                                   (2, d // 2), jnp.float32)
        # 0: negative point, 1: positive point, 2/3: box corners
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, d), jnp.float32)
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (d,), jnp.float32)
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (d,), jnp.float32)
        ch = self.mask_in_chans
        self.mask_conv1 = nn.Conv(ch // 4, (2, 2), strides=(2, 2),
                                  param_dtype=jnp.float32, name="mask_conv1")
        self.mask_ln1 = LayerNorm(eps=1e-6, name="mask_ln1")
        self.mask_conv2 = nn.Conv(ch, (2, 2), strides=(2, 2),
                                  param_dtype=jnp.float32, name="mask_conv2")
        self.mask_ln2 = LayerNorm(eps=1e-6, name="mask_ln2")
        self.mask_conv3 = nn.Conv(self.cfg.d_model, (1, 1),
                                  param_dtype=jnp.float32, name="mask_conv3")

    @property
    def embed_size(self) -> int:
        return self.cfg.image_size // self.cfg.backbone_stride

    def get_dense_pe(self):
        """[H, W, d_model] dense PE over the image-embedding grid."""
        return random_pe_grid(self.pe_gauss, self.embed_size, self.embed_size)

    def embed_points(self, coords, labels):
        """coords: [B, P, 2] pixel xy; labels: [B, P] in {-1,0,1,2,3}
        (-1 = padding)."""
        size = self.cfg.image_size
        c = (coords + 0.5) / size
        pe = random_pe_coords(self.pe_gauss, c)  # [B, P, d]
        lab = labels[..., None]
        pe = jnp.where(lab == -1, 0.0, pe)
        pe = pe + jnp.where(lab == -1, self.not_a_point_embed, 0.0)
        for li in range(4):
            pe = pe + jnp.where(lab == li, self.point_embeddings[li], 0.0)
        return pe

    def embed_boxes(self, boxes):
        """boxes: [B, 4] xyxy -> [B, 2, d]."""
        B = boxes.shape[0]
        corners = boxes.reshape(B, 2, 2)
        labels = jnp.tile(jnp.array([[2, 3]], jnp.int32), (B, 1))
        return self.embed_points(corners, labels)

    def embed_masks(self, masks):
        """masks: [B, 4*E, 4*E, 1] -> [B, E, E, d]."""
        x = self.mask_conv1(masks)
        x = nn.gelu(self.mask_ln1(x), approximate=False)
        x = self.mask_conv2(x)
        x = nn.gelu(self.mask_ln2(x), approximate=False)
        return self.mask_conv3(x)

    def __call__(self, points: Optional[Tuple] = None,
                 boxes=None, masks=None, text_embeds=None):
        """Returns (sparse [B, N, d], dense [B, E, E, d])."""
        parts = []
        if points is not None:
            coords, labels = points
            if boxes is None:  # pad with one not-a-point (reference :88-92)
                coords = jnp.concatenate(
                    [coords, jnp.zeros_like(coords[:, :1])], axis=1)
                labels = jnp.concatenate(
                    [labels, -jnp.ones_like(labels[:, :1])], axis=1)
            parts.append(self.embed_points(coords, labels))
        if boxes is not None:
            parts.append(self.embed_boxes(boxes))
        if text_embeds is not None:
            parts.append(text_embeds.astype(jnp.float32))
        bs = parts[0].shape[0] if parts else (
            masks.shape[0] if masks is not None else 1)
        sparse = jnp.concatenate(parts, axis=1) if parts else \
            jnp.zeros((bs, 0, self.cfg.d_model), jnp.float32)

        e = self.embed_size
        if masks is not None:
            dense = self.embed_masks(masks)
        else:
            dense = jnp.broadcast_to(
                self.no_mask_embed, (bs, e, e, self.cfg.d_model))
        return sparse, dense
