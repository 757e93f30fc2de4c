"""SAM-1 (ViT-H) pixel decoder — the v1 / v1_itm alternative.

Behavioral contract from the reference segment_anything fork
(/root/reference/VideoGLaMM/model/segment_anything/build_sam.py:16-112,
modeling/image_encoder.py:17-426, modeling/mask_decoder.py:75-396):
- plain ViT image encoder: 16x16 patches, learned abs pos embed, windowed
  attention (window 14, 4 global blocks) with MViTv2-style decomposed
  relative position biases, 2-conv neck with LayerNorm2d to 256;
- prompt encoder identical to SAM-2's (points/boxes/masks + the VideoGLaMM
  text_embeds hook, prompt_encoder.py:176-177) — reused directly;
- mask decoder WITHOUT obj-score / high-res skips / stability fallback
  (iou token + 4 mask tokens), plus the VideoGLaMM ITM extension: 4 track
  tokens appended to the output tokens and an ITM head (2x Linear+ReLU with
  residual) producing the next frame's track tokens from the mask tokens
  (mask_decoder.py:197-396) — the temporal-consistency mechanism of the
  SAM-1 path.

TPU-first notes: rel-pos biases enter the shared attention op as a bias
term; windows fold into the batch dim as static reshapes; the track-token
recurrence across frames is a lax.scan (see track_frames).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import SAM1Config, SAM2Config
from ..ops import dot_product_attention
from .common import Dense, LayerNorm, MLPBlock, Mlp, patchify_conv
from .sam2.hiera import window_partition, window_unpartition
from .sam2.prompt_encoder import PromptEncoder
from .sam2.transformer import TwoWayTransformer


def _rel_pos_bias(q, rel_pos_h, rel_pos_w, hw: Tuple[int, int]):
    """Decomposed relative position bias (reference image_encoder.py
    add_decomposed_rel_pos). q: [B, nh, S, hd] with S == h*w; returns
    [B, nh, S, S]."""
    h, w = hw
    # q_size == k_size: Rh[i, j] = rel_pos[(i - j) + (size - 1)]
    def gather(rel, size):
        idx = jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + size - 1
        return rel[idx]                                # [size, size, hd]

    Rh = gather(rel_pos_h, h)
    Rw = gather(rel_pos_w, w)
    B, nh, S, hd = q.shape
    rq = q.reshape(B, nh, h, w, hd)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", rq.astype(jnp.float32),
                       Rh.astype(jnp.float32))
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", rq.astype(jnp.float32),
                       Rw.astype(jnp.float32))
    bias = rel_h[:, :, :, :, :, None] + rel_w[:, :, :, :, None, :]
    # note: reference adds AFTER q*scale @ k — the bias is unscaled
    return bias.reshape(B, nh, S, S)


class SAM1Attention(nn.Module):
    dim: int
    num_heads: int
    use_rel_pos: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        nh = self.num_heads
        hd = self.dim // nh
        qkv = Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, nh, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        bias = None
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * H - 1, hd), jnp.float32)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * W - 1, hd), jnp.float32)
            # the attention op adds `bias` after the hd^-0.5 logit scaling,
            # exactly like the reference's post-scale addition
            bias = _rel_pos_bias(q, rel_h, rel_w, (H, W))

        o = dot_product_attention(q, k, v, bias=bias)
        o = o.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        return Dense(self.dim, dtype=self.dtype, name="proj")(o)


class SAM1Block(nn.Module):
    dim: int
    num_heads: int
    window_size: int           # 0 => global
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = LayerNorm(eps=1e-6, name="norm1")(x)
        H, W = x.shape[1], x.shape[2]
        if self.window_size > 0:
            x, pad_hw = window_partition(x, self.window_size)
        x = SAM1Attention(self.dim, self.num_heads, dtype=self.dtype,
                          name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        h = LayerNorm(eps=1e-6, name="norm2")(x)
        h = Mlp(self.dim * 4, dtype=self.dtype, name="mlp")(h)
        return x + h


class SAM1ImageEncoder(nn.Module):
    cfg: SAM1Config
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images):
        """images: [B, S, S, 3] -> [B, S/16, S/16, 256]."""
        cfg = self.cfg
        D = cfg.encoder_embed_dim
        patch = 16
        kernel = self.param("patch_embedding", nn.initializers.lecun_normal(),
                            (patch, patch, 3, D), jnp.float32)
        bias = self.param("patch_bias", nn.initializers.zeros, (D,),
                          jnp.float32)
        B = images.shape[0]
        g = cfg.image_size // patch
        x = patchify_conv(images.astype(self.dtype), kernel, bias, patch)
        x = x.reshape(B, g, g, D)
        pos = self.param("pos_embed", nn.initializers.zeros, (g, g, D),
                         jnp.float32)
        x = x + pos.astype(x.dtype)

        for i in range(cfg.encoder_depth):
            ws = 0 if i in cfg.encoder_global_attn_indexes else \
                cfg.window_size
            x = SAM1Block(D, cfg.encoder_num_heads, window_size=ws,
                          dtype=self.dtype, name=f"blocks_{i}")(x)

        C = cfg.prompt_embed_dim
        x = Dense(C, use_bias=False, dtype=self.dtype, name="neck_conv1")(x)
        x = LayerNorm(eps=1e-6, name="neck_ln1")(x)
        x = nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    param_dtype=jnp.float32, dtype=self.dtype,
                    name="neck_conv2")(x)
        return LayerNorm(eps=1e-6, name="neck_ln2")(x)


class SAM1DecoderOutput(NamedTuple):
    masks: jnp.ndarray           # [B, M, 4E, 4E]
    iou_pred: jnp.ndarray        # [B, M]
    track_token_out: jnp.ndarray  # [B, num_mask_tokens, C]


class SAM1MaskDecoder(nn.Module):
    """CustomMaskDecoder with ITM (reference mask_decoder.py:227-396);
    with_itm=False reproduces the plain SAM decoder (track tokens unused)."""
    cfg: SAM1Config
    num_multimask_outputs: int = 3
    dtype: jnp.dtype = jnp.float32

    @property
    def num_mask_tokens(self):
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse, dense,
                 multimask_output: bool, track_token_in=None
                 ) -> SAM1DecoderOutput:
        cfg = self.cfg
        C = cfg.prompt_embed_dim
        B, E = image_embeddings.shape[0], image_embeddings.shape[1]
        nmt = self.num_mask_tokens

        iou_token = self.param("iou_token", nn.initializers.normal(0.02),
                               (1, C), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(0.02),
                                 (nmt, C), jnp.float32)
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        out_tokens = jnp.broadcast_to(out_tokens, (B,) + out_tokens.shape)
        if track_token_in is not None:
            out_tokens = jnp.concatenate(
                [out_tokens, track_token_in.astype(jnp.float32)], axis=1)
        tokens = jnp.concatenate([out_tokens, sparse.astype(jnp.float32)],
                                 axis=1)

        src = image_embeddings.astype(jnp.float32) + dense.astype(jnp.float32)
        hs, src = TwoWayTransformer(dtype=self.dtype, embedding_dim=C,
                                    name="transformer")(
            src, jnp.broadcast_to(image_pe, (B, E, E, C)), tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + nmt]

        if cfg.with_itm:
            h = Dense(C, dtype=self.dtype, name="itm_fc1")(mask_tokens_out)
            h = jax.nn.relu(h)
            h = Dense(C, dtype=self.dtype, name="itm_fc2")(h)
            track_token_out = mask_tokens_out + jax.nn.relu(h)
        else:
            track_token_out = mask_tokens_out

        src = src.reshape(B, E, E, C)
        up = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2),
                              param_dtype=jnp.float32, dtype=self.dtype,
                              name="upscale_conv1")(src.astype(self.dtype))
        up = nn.gelu(LayerNorm(eps=1e-6, name="upscale_ln")(up),
                     approximate=False)
        up = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2),
                              param_dtype=jnp.float32, dtype=self.dtype,
                              name="upscale_conv2")(up)
        upscaled = nn.gelu(up, approximate=False)

        hyper = jnp.stack([
            MLPBlock(C, C // 8, 3, dtype=self.dtype,
                     name=f"hyper_mlps_{i}")(mask_tokens_out[:, i])
            for i in range(nmt)], axis=1)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper.astype(jnp.float32),
                           upscaled.astype(jnp.float32))
        iou_pred = MLPBlock(256, nmt, 3, dtype=self.dtype,
                            name="iou_head")(iou_token_out)

        sl = slice(1, None) if multimask_output else slice(0, 1)
        return SAM1DecoderOutput(masks[:, sl], iou_pred[:, sl],
                                 track_token_out)


def _sam1_prompt_cfg(cfg: SAM1Config) -> SAM2Config:
    """Adapter: the SAM-1 prompt encoder is structurally the SAM-2 one."""
    return SAM2Config(image_size=cfg.image_size, d_model=cfg.prompt_embed_dim)


class SAM1(nn.Module):
    """SAM-1 composite: encoder + prompt encoder (text hook) + decoder."""
    cfg: SAM1Config
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.image_encoder = SAM1ImageEncoder(self.cfg, dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(_sam1_prompt_cfg(self.cfg))
        self.mask_decoder = SAM1MaskDecoder(self.cfg, dtype=jnp.float32)

    def forward_image(self, images):
        return self.image_encoder(images)

    def decode(self, embeddings, text_embeds, track_token_in=None,
               multimask_output: bool = False) -> SAM1DecoderOutput:
        sparse, dense = self.prompt_encoder(points=None,
                                            text_embeds=text_embeds)
        pe = self.prompt_encoder.get_dense_pe()
        return self.mask_decoder(embeddings, pe, sparse, dense,
                                 multimask_output, track_token_in)

    def __call__(self, images, text_embeds):
        emb = self.forward_image(images)
        return self.decode(emb, text_embeds)

    def track_frames(self, frames, text_embeds):
        """Per-frame decoding with the ITM track-token recurrence
        (reference model/VideoGLaMM.py:444-472 track_token threading):
        frames [T, S, S, 3]; text_embeds [B, N, C] (B objects).

        Returns mask logits [B, T, 4E, 4E]."""
        T = frames.shape[0]
        B = text_embeds.shape[0]
        embs = self.forward_image(frames)                 # [T, E, E, C]

        dec0 = self.decode(jnp.broadcast_to(embs[0][None],
                                            (B,) + embs.shape[1:]),
                           text_embeds, None)
        track0 = dec0.track_token_out

        if T == 1:
            return dec0.masks[:, 0][:, None]

        def body(track, emb_t):
            dec = self.decode(jnp.broadcast_to(emb_t[None],
                                               (B,) + emb_t.shape),
                              text_embeds,
                              track if self.cfg.with_itm else None)
            return dec.track_token_out, dec.masks[:, 0]

        _, rest = nn.scan(
            lambda mdl, carry, xs: body(carry, xs),
            variable_broadcast="params", split_rngs={"params": False})(
            self, track0, embs[1:])
        return jnp.concatenate([dec0.masks[:, 0][:, None],
                                jnp.moveaxis(rest, 0, 1)], axis=1)
