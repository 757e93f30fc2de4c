"""SAM two-way transformer + attention variants.

Behavioral contract from the reference
(/root/reference/VideoGLaMM/model/segment_anything_2/sam2/modeling/sam/
transformer.py): 2-layer TwoWayTransformer (token self-attn, token->image
cross-attn, MLP, image->token cross-attn; PE added pre-attention, first layer
skips query PE in self-attn), internal-dim downsampling (rate 2), and
RoPEAttention (2-D axial rotary, optional k-repeat across memory frames and
a rope-excluded key suffix for object-pointer tokens).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ...ops import dot_product_attention
from ...ops.rope import apply_axial_rope, axial_rope_cos_sin
from ..common import Dense, LayerNorm, Mlp


class SAMAttention(nn.Module):
    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, kv_mask=None):
        inner = self.embedding_dim // self.downsample_rate
        nh = self.num_heads
        hd = inner // nh
        q = Dense(inner, dtype=self.dtype, name="q_proj")(q)
        k = Dense(inner, dtype=self.dtype, name="k_proj")(k)
        v = Dense(inner, dtype=self.dtype, name="v_proj")(v)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], nh, hd).transpose(0, 2, 1, 3)

        o = dot_product_attention(split(q), split(k), split(v), kv_mask=kv_mask)
        o = o.transpose(0, 2, 1, 3).reshape(o.shape[0], -1, inner)
        return Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(o)


class RoPEAttention(nn.Module):
    """Attention with 2-D axial rotary embedding on the q (and spatial-k)
    tokens over a feat_sizes grid; the last `num_k_exclude_rope` keys
    (object pointers) are not rotated."""
    embedding_dim: int
    num_heads: int
    feat_sizes: tuple
    rope_theta: float = 10000.0
    rope_k_repeat: bool = False
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, num_k_exclude_rope: int = 0, kv_mask=None):
        inner = self.embedding_dim // self.downsample_rate
        nh = self.num_heads
        hd = inner // nh
        qp = Dense(inner, dtype=self.dtype, name="q_proj")(q)
        kp = Dense(inner, dtype=self.dtype, name="k_proj")(k)
        vp = Dense(inner, dtype=self.dtype, name="v_proj")(v)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], nh, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(qp), split(kp), split(vp)
        ex, ey = self.feat_sizes
        assert qh.shape[2] == ex * ey, (
            f"RoPE grid {ex}x{ey} != q len {qh.shape[2]}")
        cos, sin = axial_rope_cos_sin(hd, ex, ey, self.rope_theta)
        qh = apply_axial_rope(qh, cos, sin)
        n_rope = kh.shape[2] - num_k_exclude_rope
        if n_rope > 0:
            k_rot = apply_axial_rope(kh[:, :, :n_rope], cos, sin)
            kh = jnp.concatenate([k_rot, kh[:, :, n_rope:]], axis=2) \
                if num_k_exclude_rope > 0 else k_rot
        o = dot_product_attention(qh, kh, vh, kv_mask=kv_mask)
        o = o.transpose(0, 2, 1, 3).reshape(o.shape[0], -1, inner)
        return Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(o)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = SAMAttention(self.embedding_dim, self.num_heads,
                                   dtype=self.dtype, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + SAMAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn")(q, q, queries)
        queries = LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + SAMAttention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = LayerNorm(name="norm2")(queries)

        queries = queries + Mlp(self.mlp_dim, activation=nn.relu,
                                dtype=self.dtype, name="mlp")(queries)
        queries = LayerNorm(name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + SAMAttention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = LayerNorm(name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: [B, H, W, C]; point_embedding: [B, N, C].

        Returns (queries [B, N, C], keys [B, HW, C])."""
        B, H, W, C = image_embedding.shape
        keys = image_embedding.reshape(B, H * W, C)
        key_pe = image_pe.reshape(B, H * W, C) if image_pe.ndim == 4 \
            else image_pe
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layers_{i}")(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + SAMAttention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, dtype=self.dtype,
            name="final_attn_token_to_image")(q, k, keys)
        queries = LayerNorm(name="norm_final_attn")(queries)
        return queries, keys
