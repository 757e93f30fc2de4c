"""InternVideo2-1B temporal video encoder.

Behavioral contract from the reference PretrainInternVideo2 / the
InternVideo2_Stage2V wrapper (/root/reference/VideoGLaMM/model/videogpt_plus/
model/internvideo/internvideo2.py:388-689, utils.py:146-240):

- 3D patch embed (tubelet 1, 14x14) over 4-frame chunks -> [B, T*256, 1408];
- cls token + joint 3D sin-cos position embedding (stored as a parameter so
  checkpoint import is a straight copy; use_image averages the temporal axis,
  internvideo2.py:600-611);
- 40 pre-RMSNorm blocks with QK-RMSNorm over the flattened head dim and
  fp32 LayerScale (init 1e-5);
- the fusion path runs with x_vis_return_idx=-2 / x_vis_only=True
  (utils.py:230-239): blocks 0..depth-2 execute and the raw tokens
  (cls + patches) are returned — no clip projector, no final norm.

TPU-first redesign: the reference drives flash-attn CUDA kernels and fused
DropoutAddRMSNorm; here attention goes through the shared Pallas flash
attention op and norms through the fused Pallas RMSNorm. The executed blocks
run under `nn.scan` (stacked params): one compiled block body and a stacked
layout that shards cleanly over the mesh.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import InternVideo2Config
from ..ops import dot_product_attention
from .common import (Dense, HeadPaddedQKV, PadConsumingProj, RMSNorm,
                     patchify_conv)


def _rms_norm_padded_flat(x, w, nh: int, hd: int, eps: float):
    """RMSNorm over the REAL flattened dim of a head-padded layout.

    x: [..., nh*128] with zero pad lanes (real head dim hd); w: [nh*hd]
    scale. Zero pads contribute nothing to the sum of squares, so dividing
    by the real dim reproduces ops.rms_norm over the unpadded vector
    exactly; the scale pads with zeros so pad lanes stay zero."""
    xf = x.astype(jnp.float32)
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / (nh * hd)
    wp = jnp.pad(w.astype(jnp.float32).reshape(nh, hd),
                 ((0, 0), (0, 128 - hd))).reshape(nh * 128)
    return (xf * jax.lax.rsqrt(var + eps) * wp).astype(x.dtype)


def sincos_3d_pos_embed(embed_dim: int, grid_hw: int, t_size: int,
                        cls_token: bool = True) -> np.ndarray:
    """Joint 3D sin-cos position embedding, matching the reference
    get_3d_sincos_pos_embed (model/videogpt_plus/model/internvideo/
    pos_embed.py): spatial gets 3/4 of the dim (2D grid), temporal 1/4."""
    assert embed_dim % 4 == 0

    def sincos_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid = np.meshgrid(np.arange(grid_hw, dtype=np.float32),
                       np.arange(grid_hw, dtype=np.float32))  # (w, h) order
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_hw, grid_hw)
    d_spatial = embed_dim // 4 * 3
    emb_h = sincos_1d(d_spatial // 2, grid[0])
    emb_w = sincos_1d(d_spatial // 2, grid[1])
    pos_spatial = np.concatenate([emb_h, emb_w], axis=1)  # [HW, 3d/4]

    pos_t = sincos_1d(embed_dim // 4, np.arange(t_size, dtype=np.float32))
    pos_t = np.repeat(pos_t[:, None, :], grid_hw * grid_hw, axis=1)
    pos_spatial = np.repeat(pos_spatial[None], t_size, axis=0)
    pos = np.concatenate([pos_t, pos_spatial], axis=-1)
    pos = pos.reshape(t_size * grid_hw * grid_hw, embed_dim)
    if cls_token:
        pos = np.concatenate([np.zeros((1, embed_dim)), pos], axis=0)
    return pos.astype(np.float32)


class _PaddedRMSNorm(nn.Module):
    """RMSNorm over the real dims of a head-padded flat layout; param tree
    matches RMSNorm ({scale: [nh*hd]}) so checkpoint import is unchanged."""
    nh: int
    hd: int
    eps: float

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.ones,
                       (self.nh * self.hd,), jnp.float32)
        return _rms_norm_padded_flat(x, w, self.nh, self.hd, self.eps)


class InternVideo2Block(nn.Module):
    """Pre-RMSNorm transformer block with QK-norm + fp32 LayerScale
    (reference internvideo2.py:264-316)."""
    cfg: InternVideo2Config
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        B, N, D = x.shape
        nh = cfg.num_heads
        hd = D // nh

        h = RMSNorm(eps=cfg.rms_eps, name="norm1")(x)
        if 64 <= hd < 128:
            # head-padded attention path (flagship hd=88): the qkv weights
            # pre-pad every head to a full 128-lane tile, the qk-norms run
            # pad-aware on the flat layout, and the attention kernel reads
            # the projection output directly — no 88 -> 128 activation
            # relayouts anywhere (numerically exact: pad lanes are zero).
            from ..ops.attention import attention_packed_qkv_padded
            qkv = HeadPaddedQKV(D, nh, use_bias=cfg.qkv_bias,
                                dtype=self.dtype, name="qkv")(h)
            if cfg.qk_normalization:
                hp = nh * 128
                q = _PaddedRMSNorm(nh, hd, cfg.rms_eps, name="q_norm")(
                    qkv[..., :hp])
                k = _PaddedRMSNorm(nh, hd, cfg.rms_eps, name="k_norm")(
                    qkv[..., hp:2 * hp])
                qkv = jnp.concatenate([q, k, qkv[..., 2 * hp:]], axis=-1)
            o = attention_packed_qkv_padded(qkv, nh, hd)
            o = PadConsumingProj(D, nh, D, dtype=self.dtype,
                                 name="attn_proj")(o)
        else:
            qkv = Dense(3 * D, use_bias=cfg.qkv_bias, dtype=self.dtype,
                        name="qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if cfg.qk_normalization:
                # reference normalizes over the FULL flattened dim, not
                # per-head (internvideo2.py:194-197)
                q = RMSNorm(eps=cfg.rms_eps, name="q_norm")(q)
                k = RMSNorm(eps=cfg.rms_eps, name="k_norm")(k)

            # BSHD kernel path — q/k/v reshapes are free, no transposes
            from ..ops.attention import attention_bshd
            o = attention_bshd(q.reshape(B, N, nh, hd),
                               k.reshape(B, N, nh, hd),
                               v.reshape(B, N, nh, hd))
            o = o.reshape(B, N, D)
            o = Dense(D, dtype=self.dtype, name="attn_proj")(o)
        ls1 = self.param("ls1_gamma", nn.initializers.constant(cfg.init_values),
                         (D,), jnp.float32)
        x = x + (o.astype(jnp.float32) * ls1).astype(x.dtype)

        h = RMSNorm(eps=cfg.rms_eps, name="norm2")(x)
        h = Dense(int(D * cfg.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        # tanh-approx GELU: the deployed reference runs flash-attn FusedMLP
        # (gelu_approx), not torch.nn.GELU (internvideo2.py:286-287)
        h = nn.gelu(h, approximate=True)
        h = Dense(D, dtype=self.dtype, name="mlp_fc2")(h)
        ls2 = self.param("ls2_gamma", nn.initializers.constant(cfg.init_values),
                         (D,), jnp.float32)
        return x + (h.astype(jnp.float32) * ls2).astype(x.dtype)


class InternVideo2Tower(nn.Module):
    """Fusion-path encoder. __call__(frames: [B, T, H, W, 3]) ->
    [B, T*tokens_per_frame, embed_dim] patch tokens (cls dropped, matching
    arch.py:142 `chunk_features[:, 1:]`). T must equal cfg.num_frames for the
    video path; use_image=True runs the single-frame path with the
    temporally-averaged position embedding (internvideo2.py:600-611)."""
    cfg: InternVideo2Config
    x_vis_return_idx: int = -2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, frames, use_image: bool = False):
        cfg = self.cfg
        B, T, H, W, _ = frames.shape
        D = cfg.embed_dim
        L = cfg.tokens_per_frame
        t_grid = cfg.num_frames // cfg.tubelet_size

        patch_kernel = self.param(
            "patch_embedding", nn.initializers.lecun_normal(),
            (cfg.patch_size, cfg.patch_size, 3, D), jnp.float32)
        patch_bias = self.param("patch_bias", nn.initializers.zeros,
                                (D,), jnp.float32)
        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, D), jnp.float32)
        pos_init = sincos_3d_pos_embed(D, cfg.grid, t_grid)
        pos_embed = self.param("pos_embed",
                               lambda key: jnp.asarray(pos_init),
                               )

        # tubelet_size==1 => the 3D patch conv is a per-frame 2D patchify
        x = patchify_conv(frames.reshape(B * T, H, W, 3).astype(self.dtype),
                          patch_kernel, patch_bias, cfg.patch_size)
        x = x.reshape(B, T * L, D)
        cls = jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, D))
        x = jnp.concatenate([cls, x], axis=1)

        if use_image:
            assert T == 1
            img_pos = pos_embed[1:].reshape(t_grid, L, D).mean(axis=0)
            pe = jnp.concatenate([pos_embed[:1], img_pos], axis=0)
        else:
            assert T == cfg.num_frames, (T, cfg.num_frames)
            pe = pos_embed
        x = x + pe.astype(self.dtype)[None]

        n_run = cfg.depth + self.x_vis_return_idx + 1
        assert 0 < n_run <= cfg.depth

        block = InternVideo2Block(cfg, dtype=self.dtype, name="blocks")

        def body(mdl, carry, _):
            return mdl(carry), None

        scan = nn.scan(body, variable_axes={"params": 0},
                       split_rngs={"params": True}, length=n_run)
        x, _ = scan(block, x, None)
        return x[:, 1:]
