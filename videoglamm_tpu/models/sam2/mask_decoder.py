"""SAM-2 mask decoder.

Behavioral contract from the reference
(/root/reference/VideoGLaMM/model/segment_anything_2/sam2/modeling/sam/
mask_decoder.py:15-295): [obj_score | iou | 4 mask] output tokens prepended to
the sparse prompts through a TwoWayTransformer; transposed-conv 4x upscaling
with high-res skip features (conv_s0/s1); per-mask-token hypernetwork MLPs;
sigmoid IoU head; object-score head (3-layer MLP); multimask selection and
the dynamic single-mask -> best-multimask stability fallback.

TPU-first notes: the multimask/stability selection is a vectorized
`jnp.where` (no data-dependent control flow), so conditioning frames and
tracking frames compile to the same program.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...config import SAM2Config
from ..common import LayerNorm, MLPBlock
from .transformer import TwoWayTransformer


class MaskDecoderOutput(NamedTuple):
    masks: jnp.ndarray               # [B, M, 4E, 4E] selected mask logits
    iou_pred: jnp.ndarray            # [B, M]
    sam_tokens_out: jnp.ndarray      # [B, M, C] tokens used for obj pointers
    object_score_logits: jnp.ndarray  # [B, 1]


class MaskDecoder(nn.Module):
    cfg: SAM2Config
    num_multimask_outputs: int = 3
    dtype: jnp.dtype = jnp.float32

    @property
    def num_mask_tokens(self):
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt_embeddings,
                 dense_prompt_embeddings, multimask_output: bool,
                 high_res_features=None, training: bool = False):
        """image_embeddings: [B, E, E, C]; image_pe: [E, E, C];
        sparse: [B, N, C]; dense: [B, E, E, C];
        high_res_features: ([B, 4E, 4E, C/8], [B, 2E, 2E, C/4]) or None."""
        cfg = self.cfg
        C = cfg.d_model
        B, E = image_embeddings.shape[0], image_embeddings.shape[1]
        nmt = self.num_mask_tokens

        obj_score_token = self.param("obj_score_token",
                                     nn.initializers.normal(0.02), (1, C),
                                     jnp.float32)
        iou_token = self.param("iou_token", nn.initializers.normal(0.02),
                               (1, C), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(0.02),
                                 (nmt, C), jnp.float32)

        out_tokens = jnp.concatenate([obj_score_token, iou_token, mask_tokens],
                                     axis=0)
        s = 1  # pred_obj_scores offset
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens, (B,) + out_tokens.shape),
             sparse_prompt_embeddings.astype(jnp.float32)], axis=1)

        src = image_embeddings.astype(jnp.float32) + \
            dense_prompt_embeddings.astype(jnp.float32)
        hs, src = TwoWayTransformer(dtype=self.dtype,
                                    embedding_dim=C,
                                    name="transformer")(
            src, jnp.broadcast_to(image_pe, (B, E, E, C)), tokens)
        iou_token_out = hs[:, s]
        mask_tokens_out = hs[:, s + 1: s + 1 + nmt]

        # upscaling: 2x transposed conv (+s1 skip), LN, GELU, 2x (+s0), GELU
        src = src.reshape(B, E, E, C)
        up1 = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2),
                               param_dtype=jnp.float32, dtype=self.dtype,
                               name="upscale_conv1")(src.astype(self.dtype))
        if cfg.use_high_res_features_in_sam:
            feat_s0, feat_s1 = high_res_features
            up1 = up1 + feat_s1.astype(up1.dtype)
        up1 = nn.gelu(LayerNorm(eps=1e-6, name="upscale_ln")(up1),
                      approximate=False)
        up2 = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2),
                               param_dtype=jnp.float32, dtype=self.dtype,
                               name="upscale_conv2")(up1)
        if cfg.use_high_res_features_in_sam:
            up2 = up2 + feat_s0.astype(up2.dtype)
        upscaled = nn.gelu(up2, approximate=False)          # [B, 4E, 4E, C/8]

        hyper_in = jnp.stack([
            MLPBlock(C, C // 8, 3, dtype=self.dtype,
                     name=f"hyper_mlps_{i}")(mask_tokens_out[:, i])
            for i in range(nmt)], axis=1)                    # [B, nmt, C/8]
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper_in.astype(jnp.float32),
                           upscaled.astype(jnp.float32))     # [B, nmt, 4E, 4E]

        iou_pred = MLPBlock(256, nmt, 3,
                            sigmoid_output=cfg.iou_prediction_use_sigmoid,
                            dtype=self.dtype, name="iou_head")(iou_token_out)
        object_score_logits = MLPBlock(C, 1, 3, dtype=self.dtype,
                                       name="obj_score_head")(hs[:, 0])

        if multimask_output:
            out_masks = masks[:, 1:]
            out_iou = iou_pred[:, 1:]
        elif cfg.dynamic_multimask_via_stability and not training:
            out_masks, out_iou = self._dynamic_multimask(masks, iou_pred)
        else:
            out_masks = masks[:, 0:1]
            out_iou = iou_pred[:, 0:1]

        if multimask_output and cfg.use_multimask_token_for_obj_ptr:
            sam_tokens_out = mask_tokens_out[:, 1:]
        else:
            sam_tokens_out = mask_tokens_out[:, 0:1]

        return MaskDecoderOutput(out_masks, out_iou, sam_tokens_out,
                                 object_score_logits.astype(jnp.float32))

    def _stability_scores(self, mask_logits):
        delta = self.cfg.dynamic_multimask_stability_delta
        flat = mask_logits.reshape(mask_logits.shape[:-2] + (-1,))
        area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
        area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
        return jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1.0), 1.0)

    def _dynamic_multimask(self, all_masks, all_iou):
        """Single-mask output with fallback to the best multimask candidate
        when the single mask is unstable (reference mask_decoder.py:260-295)."""
        multi = all_masks[:, 1:]
        multi_iou = all_iou[:, 1:]
        best = jnp.argmax(multi_iou, axis=-1)
        bidx = jnp.arange(all_masks.shape[0])
        best_masks = multi[bidx, best][:, None]
        best_iou = multi_iou[bidx, best][:, None]

        single = all_masks[:, 0:1]
        single_iou = all_iou[:, 0:1]
        stable = self._stability_scores(single) >= \
            self.cfg.dynamic_multimask_stability_thresh
        masks = jnp.where(stable[..., None, None], single, best_masks)
        iou = jnp.where(stable, single_iou, best_iou)
        return masks, iou
