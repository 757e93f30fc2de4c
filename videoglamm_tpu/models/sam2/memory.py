"""SAM-2 memory encoder + memory attention.

Behavioral contracts from the reference:
- MemoryEncoder (/root/reference/VideoGLaMM/model/segment_anything_2/sam2/
  modeling/memory_encoder.py:17-181): stride-16 mask conv pyramid (channels
  1->4->16->64->256 -> 1x1 to 256), pix_feat 1x1 proj, sum, 2x ConvNeXt
  CXBlocks (7x7 depthwise), 1x1 out_proj to mem_dim=64, sine PE.
- MemoryAttention (memory_attention.py:17-169): 4 layers of pre-norm
  self-attn (2-D RoPE) on the current frame tokens + cross-attn (RoPE with
  k-repeat over memory frames; obj-ptr key suffix excluded from RoPE,
  kv_in_dim 64) into the concatenated memory, ReLU FFN 2048, `curr + 0.1*pos`
  input PE, final LayerNorm.

TPU-first notes: the memory bank is fixed shape; invalid slots are handled
by a [B, Sk] boolean attention mask instead of the reference's Python-list
concatenation of a variable number of memories.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...config import SAM2Config
from ..common import Dense, LayerNorm
from .pos_enc import sine_pe
from .transformer import RoPEAttention, SAMAttention


class CXBlock(nn.Module):
    """ConvNeXt block, channels-last."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.dim, param_dtype=jnp.float32,
                    dtype=self.dtype, name="dwconv")(x)
        x = LayerNorm(eps=1e-6, name="norm")(x)
        x = Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.dim,), jnp.float32)
        return inp + gamma.astype(x.dtype) * x


class MemoryEncoder(nn.Module):
    cfg: SAM2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pix_feat, masks):
        """pix_feat: [B, E, E, C]; masks: [B, 16E, 16E, 1] (already scaled
        sigmoid probabilities, reference _encode_new_memory applies
        sigmoid*20-10 before calling with skip_mask_sigmoid=True).

        Returns (memory [B, E, E, mem_dim], pos [E, E, mem_dim])."""
        cfg = self.cfg
        x = masks.astype(self.dtype)
        ch = 1
        for i in range(4):  # total stride 16, stride 2 each
            ch = ch * 4
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        param_dtype=jnp.float32, dtype=self.dtype,
                        name=f"mask_down_{i}")(x)
            x = LayerNorm(eps=1e-6, name=f"mask_down_ln_{i}")(x)
            x = nn.gelu(x, approximate=False)
        x = nn.Conv(cfg.d_model, (1, 1), param_dtype=jnp.float32,
                    dtype=self.dtype, name="mask_down_out")(x)

        pix = Dense(cfg.d_model, dtype=self.dtype,
                    name="pix_feat_proj")(pix_feat.astype(self.dtype))
        y = pix + x
        for i in range(2):
            y = CXBlock(cfg.d_model, dtype=self.dtype, name=f"fuser_{i}")(y)
        mem = Dense(cfg.mem_dim, dtype=self.dtype, name="out_proj")(y)
        pos = sine_pe(mem.shape[1], mem.shape[2], cfg.mem_dim)
        return mem.astype(jnp.float32), pos


class MemoryAttentionLayer(nn.Module):
    cfg: SAM2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, num_obj_ptr_tokens: int,
                 kv_mask=None):
        cfg = self.cfg
        d = cfg.d_model
        grid = cfg.low_res_size

        # self-attention (pos_enc_at_attn = False)
        t2 = LayerNorm(name="norm1")(tgt)
        t2 = RoPEAttention(d, 1, feat_sizes=(grid, grid),
                           rope_theta=cfg.memory_rope_theta, dtype=self.dtype,
                           name="self_attn")(t2, t2, t2)
        tgt = tgt + t2

        # cross-attention into memory (pos on keys only)
        t2 = LayerNorm(name="norm2")(tgt)
        t2 = RoPEAttention(d, 1, feat_sizes=(grid, grid),
                           rope_theta=cfg.memory_rope_theta,
                           rope_k_repeat=True, kv_in_dim=cfg.mem_dim,
                           dtype=self.dtype, name="cross_attn_image")(
            t2, memory + pos, memory,
            num_k_exclude_rope=num_obj_ptr_tokens, kv_mask=kv_mask)
        tgt = tgt + t2

        # FFN (relu)
        t2 = LayerNorm(name="norm3")(tgt)
        t2 = Dense(cfg.memory_attention_dim_feedforward, dtype=self.dtype,
                   name="linear1")(t2)
        t2 = jax.nn.relu(t2)
        t2 = Dense(d, dtype=self.dtype, name="linear2")(t2)
        return tgt + t2


class MemoryAttention(nn.Module):
    cfg: SAM2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, curr, curr_pos, memory, memory_pos,
                 num_obj_ptr_tokens: int, kv_mask=None):
        """curr: [B, HW, C] current-frame tokens; memory: [B, M, mem_dim]
        (spatial memories first, then obj-ptr tokens); kv_mask: [B, M] bool.

        Returns conditioned tokens [B, HW, C]."""
        x = curr + 0.1 * curr_pos  # pos_enc_at_input
        for i in range(self.cfg.memory_attention_layers):
            x = MemoryAttentionLayer(self.cfg, dtype=self.dtype,
                                     name=f"layers_{i}")(
                x, memory, memory_pos, curr_pos, num_obj_ptr_tokens, kv_mask)
        return LayerNorm(name="norm")(x)
