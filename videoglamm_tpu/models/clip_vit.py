"""CLIP ViT-L/336 spatial ("context image") encoder.

Behavioral contract from the reference CLIPVisionTower
(/root/reference/VideoGLaMM/model/videogpt_plus/model/multimodal_encoder/
clip_encoder.py:7-120): per-frame CLIP ViT-L/14-336 forward, features taken
from hidden_states[select_layer] (default -2, i.e. the output of layer
N-1 of N), with the CLS token dropped ("patch" feature select). The fusion
layer consumes [B, 576, 1024].

TPU-first notes: the patch conv is a reshaped matmul (stride==kernel), all
attention goes through the shared flash-attention op, and the trailing
unused layers are simply not instantiated/executed (the reference computes
all 24 then discards — we stop at the selected layer).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import CLIPVisionConfig
from .common import Dense, LayerNorm, MultiHeadAttention, patchify_conv


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = LayerNorm(eps=cfg.layer_norm_eps, name="layer_norm1")(x)
        h = MultiHeadAttention(num_heads=cfg.num_heads, dtype=self.dtype,
                               name="self_attn")(h)
        x = x + h
        h = LayerNorm(eps=cfg.layer_norm_eps, name="layer_norm2")(x)
        h = Dense(cfg.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = Dense(cfg.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """Returns patch features from the selected hidden layer.

    __call__(pixel_values: [B, H, W, 3]) -> [B, num_patches, hidden]
    """
    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.cfg
        B = pixel_values.shape[0]
        D = cfg.hidden_size

        patch_kernel = self.param(
            "patch_embedding",
            nn.initializers.lecun_normal(),
            (cfg.patch_size, cfg.patch_size, 3, D), jnp.float32)
        cls_embed = self.param("class_embedding",
                               nn.initializers.normal(0.02), (D,), jnp.float32)
        pos_embed = self.param("position_embedding",
                               nn.initializers.normal(0.02),
                               (cfg.num_patches + 1, D), jnp.float32)

        x = patchify_conv(pixel_values.astype(self.dtype), patch_kernel, None,
                          cfg.patch_size)  # [B, L, D]
        cls = jnp.broadcast_to(cls_embed.astype(self.dtype), (B, 1, D))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_embed.astype(self.dtype)[None]
        x = LayerNorm(eps=cfg.layer_norm_eps, name="pre_layrnorm")(x)

        # hidden_states[select_layer] == output after (num_layers+select_layer+1)
        # encoder layers; only those layers run.
        n_run = cfg.num_layers + cfg.select_layer + 1 \
            if cfg.select_layer < 0 else cfg.select_layer
        assert 0 < n_run <= cfg.num_layers
        for i in range(n_run):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)

        if cfg.select_feature == "patch":
            return x[:, 1:]
        elif cfg.select_feature == "cls_patch":
            return x
        raise ValueError(cfg.select_feature)
