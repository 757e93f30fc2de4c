"""SAM-2 base model: functional composition of image encoder, prompt encoder,
mask decoder, memory encoder, and memory attention.

Behavioral contract from the reference SAM2Base
(/root/reference/VideoGLaMM/model/segment_anything_2/sam2/modeling/
sam2_base.py:22-833), including the VideoGLaMM text-prompt extension
(`text_inputs` threaded into the prompt encoder, :250-345) and object-score /
object-pointer handling. The stateful Python machinery
(_prepare_memory_conditioned_features over dicts of per-frame outputs) is
re-designed in video_predictor.py as a fixed-shape memory bank consumed here
by `condition_features` through a boolean attention mask.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...config import SAM2Config
from ...ops.resize import resize_bilinear
from ..common import Dense, MLPBlock
from .fpn import SAM2ImageEncoder
from .mask_decoder import MaskDecoder
from .memory import MemoryAttention, MemoryEncoder
from .prompt_encoder import PromptEncoder

NO_OBJ_SCORE = -1024.0


class SamHeadsOutput(NamedTuple):
    low_res_multimasks: jnp.ndarray   # [B, M, 4E, 4E]
    high_res_multimasks: jnp.ndarray  # [B, M, S, S]
    ious: jnp.ndarray                 # [B, M]
    low_res_masks: jnp.ndarray        # [B, 1, 4E, 4E] best mask
    high_res_masks: jnp.ndarray       # [B, 1, S, S]
    obj_ptr: jnp.ndarray              # [B, C]
    object_score_logits: jnp.ndarray  # [B, 1]


class SAM2Base(nn.Module):
    cfg: SAM2Config
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        C = cfg.d_model
        self.image_encoder = SAM2ImageEncoder(cfg, dtype=self.dtype)
        self.sam_prompt_encoder = PromptEncoder(cfg)
        self.sam_mask_decoder = MaskDecoder(cfg, dtype=jnp.float32)
        self.memory_encoder = MemoryEncoder(cfg)
        self.memory_attention = MemoryAttention(cfg)
        # high-res skip projections (owned by the torch mask decoder;
        # reference applies them in forward_image, sam2_base.py:468-476)
        self.conv_s0 = Dense(C // 8, dtype=self.dtype, name="conv_s0")
        self.conv_s1 = Dense(C // 4, dtype=self.dtype, name="conv_s1")
        # memory machinery params
        self.no_mem_embed = self.param("no_mem_embed",
                                       nn.initializers.normal(0.02),
                                       (1, 1, C), jnp.float32)
        self.no_mem_pos_enc = self.param("no_mem_pos_enc",
                                         nn.initializers.normal(0.02),
                                         (1, 1, C), jnp.float32)
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", nn.initializers.normal(0.02),
            (cfg.num_maskmem, 1, cfg.mem_dim), jnp.float32)
        self.no_obj_ptr = self.param("no_obj_ptr",
                                     nn.initializers.normal(0.02),
                                     (C,), jnp.float32)
        self.obj_ptr_proj = MLPBlock(C, C, 3, dtype=jnp.float32,
                                     name="obj_ptr_proj")
        self.mask_downsample = nn.Conv(1, (4, 4), strides=(4, 4),
                                       param_dtype=jnp.float32,
                                       name="mask_downsample")

    # ------------------------------------------------------------------
    def forward_image(self, images):
        """images: [B, S, S, 3] (SAM-normalized). Returns
        (feats, pos): 3 levels highest-res first; levels 0/1 already passed
        through conv_s0/s1 (decoder skip projections)."""
        feats, pos = self.image_encoder(images)
        feats = [self.conv_s0(feats[0]), self.conv_s1(feats[1]), feats[2]]
        return feats, pos

    # ------------------------------------------------------------------
    def forward_sam_heads(self, backbone_features, point_inputs=None,
                          mask_inputs=None, text_inputs=None,
                          high_res_features=None, multimask_output=False,
                          training=False) -> SamHeadsOutput:
        """Prompt encoder + mask decoder (reference sam2_base.py:250-412)."""
        cfg = self.cfg
        B = backbone_features.shape[0]

        if point_inputs is None:
            coords = jnp.zeros((B, 1, 2), jnp.float32)
            labels = -jnp.ones((B, 1), jnp.int32)
        else:
            coords, labels = point_inputs

        sam_mask_prompt = None
        if mask_inputs is not None:
            tgt = 4 * (cfg.image_size // cfg.backbone_stride)
            if mask_inputs.shape[1] != tgt:
                sam_mask_prompt = resize_bilinear(
                    mask_inputs.astype(jnp.float32), (tgt, tgt))
            else:
                sam_mask_prompt = mask_inputs.astype(jnp.float32)

        sparse, dense = self.sam_prompt_encoder(
            points=(coords, labels), masks=sam_mask_prompt,
            text_embeds=text_inputs)
        image_pe = self.sam_prompt_encoder.get_dense_pe()

        dec = self.sam_mask_decoder(
            backbone_features, image_pe, sparse, dense,
            multimask_output=multimask_output,
            high_res_features=high_res_features, training=training)

        low_res_multimasks = dec.masks
        is_obj_appearing = dec.object_score_logits > 0
        low_res_multimasks = jnp.where(is_obj_appearing[:, None, None],
                                       low_res_multimasks, NO_OBJ_SCORE)
        low_res_multimasks = low_res_multimasks.astype(jnp.float32)
        high_res_multimasks = resize_bilinear(
            low_res_multimasks.transpose(0, 2, 3, 1),
            (cfg.image_size, cfg.image_size)).transpose(0, 3, 1, 2)

        sam_output_token = dec.sam_tokens_out[:, 0]
        if multimask_output:
            best = jnp.argmax(dec.iou_pred, axis=-1)
            bidx = jnp.arange(B)
            low_res_masks = low_res_multimasks[bidx, best][:, None]
            high_res_masks = high_res_multimasks[bidx, best][:, None]
            if dec.sam_tokens_out.shape[1] > 1:
                sam_output_token = dec.sam_tokens_out[bidx, best]
        else:
            low_res_masks = low_res_multimasks
            high_res_masks = high_res_multimasks

        obj_ptr = self.obj_ptr_proj(sam_output_token)
        # hard no-object mixing (soft_no_obj_ptr=False, fixed_no_obj_ptr=True)
        lam = is_obj_appearing.astype(jnp.float32)
        obj_ptr = lam * obj_ptr + (1.0 - lam) * self.no_obj_ptr

        return SamHeadsOutput(low_res_multimasks, high_res_multimasks,
                              dec.iou_pred, low_res_masks, high_res_masks,
                              obj_ptr, dec.object_score_logits)

    # ------------------------------------------------------------------
    def use_mask_as_output(self, backbone_features, high_res_features,
                           mask_inputs) -> SamHeadsOutput:
        """Treat a given binary mask as the output (reference :413-464)."""
        cfg = self.cfg
        out_scale, out_bias = 20.0, -10.0
        m = mask_inputs.astype(jnp.float32)  # [B, S, S, 1]
        high = (m * out_scale + out_bias).transpose(0, 3, 1, 2)  # [B,1,S,S]
        # the reference downsamples the mask with antialias=True
        # (sam2_base.py:422-428) — a PIL-style scaled triangle filter, not
        # the plain 2-tap bilinear
        from ...ops.resize import resize_bilinear_antialias
        low = resize_bilinear_antialias(
            high.transpose(0, 2, 3, 1),
            (high.shape[-2] // 4, high.shape[-1] // 4)).transpose(0, 3, 1, 2)
        ious = jnp.ones((m.shape[0], 1), jnp.float32)
        heads = self.forward_sam_heads(
            backbone_features, mask_inputs=self.mask_downsample(m),
            high_res_features=high_res_features)
        obj_ptr = heads.obj_ptr
        is_obj = jnp.any(m.reshape(m.shape[0], -1) > 0.0, axis=1,
                         keepdims=True).astype(jnp.float32)
        score = out_scale * is_obj + out_bias
        obj_ptr = is_obj * obj_ptr + (1.0 - is_obj) * self.no_obj_ptr
        return SamHeadsOutput(low, high, ious, low, high, obj_ptr, score)

    # ------------------------------------------------------------------
    def encode_new_memory(self, pix_feat, high_res_masks, object_score_logits,
                          binarize: bool = False):
        """pix_feat: [B, E, E, C]; high_res_masks: [B, S, S, 1] logits.
        Returns (memory [B, E*E, mem_dim], pos [E*E, mem_dim]).

        binarize=True hard-thresholds the logits at 0 instead of sigmoid —
        the eval-time `binarize_mask_from_pts_for_mem_enc` behavior the video
        predictor build enables for user-prompted frames (reference
        build_sam.py:62, sam2_base.py:687-691; the predictor's preflight
        consolidation re-encodes every prompted frame with
        is_mask_from_pts=True, sam2_video_predictor.py:626-632)."""
        cfg = self.cfg
        if binarize:
            m = (high_res_masks > 0).astype(jnp.float32)
        else:
            m = jax.nn.sigmoid(high_res_masks.astype(jnp.float32))
        m = m * cfg.sigmoid_scale_for_mem_enc + cfg.sigmoid_bias_for_mem_enc
        mem, pos = self.memory_encoder(pix_feat, m)
        B, E = mem.shape[0], mem.shape[1]
        return mem.reshape(B, E * E, cfg.mem_dim), \
            pos.reshape(E * E, cfg.mem_dim)

    # ------------------------------------------------------------------
    def condition_features(self, curr_feat, curr_pos, memory, memory_pos,
                           num_obj_ptr_tokens: int, kv_mask, use_memory):
        """Memory-conditioned current-frame features.

        curr_feat/curr_pos: [B, E, E, C]; memory: [B, M, mem_dim] (spatial
        memories then obj-ptr tokens); kv_mask: [B, M] bool validity;
        use_memory: [B] or scalar bool — False selects the
        `directly_add_no_mem_embed` init-frame path (reference :643-650)."""
        B, E, _, C = curr_feat.shape
        tokens = curr_feat.reshape(B, E * E, C).astype(jnp.float32)
        pos = curr_pos.reshape(B, E * E, C).astype(jnp.float32)

        conditioned = self.memory_attention(
            tokens, pos, memory.astype(jnp.float32),
            memory_pos.astype(jnp.float32), num_obj_ptr_tokens, kv_mask)
        no_mem = tokens + self.no_mem_embed
        use_memory = jnp.asarray(use_memory)
        sel = use_memory.reshape((-1,) + (1,) * (conditioned.ndim - 1)) \
            if use_memory.ndim else use_memory
        out = jnp.where(sel, conditioned, no_mem)
        return out.reshape(B, E, E, C).astype(curr_feat.dtype)

    def __call__(self, images, text_inputs=None):
        """Single-frame init path (for param initialization and the
        framewise/no-memory pipeline): encode image, decode with optional
        text prompt, encode memory."""
        feats, pos = self.forward_image(images)
        if self.is_initializing():
            # trace the mask-prompt branch too so `model.init(key, imgs)`
            # materializes mask_downsample and the prompt encoder's mask
            # downscaling convs — the interactive predictor needs them
            B, S = images.shape[0], self.cfg.image_size
            self.use_mask_as_output(
                feats[-1], (feats[0], feats[1]),
                jnp.zeros((B, S, S, 1), jnp.float32))
        heads = self.forward_sam_heads(
            feats[-1], text_inputs=text_inputs,
            high_res_features=(feats[0], feats[1]),
            multimask_output=self.cfg.multimask_output_in_sam)
        mem, mem_pos = self.encode_new_memory(
            feats[-1], heads.high_res_masks.transpose(0, 2, 3, 1),
            heads.object_score_logits)
        B = images.shape[0]
        M = mem.shape[1]
        cond = self.condition_features(
            feats[-1], pos[-1], mem, jnp.broadcast_to(mem_pos, mem.shape),
            0, jnp.ones((B, M), bool), jnp.zeros((B,), bool))
        del cond
        return heads
