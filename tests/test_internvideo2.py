"""InternVideo2 tower: shape contract, sincos pos embed, torch golden parity.

The reference tower (model/videogpt_plus/model/internvideo/internvideo2.py)
cannot be imported without CUDA flash-attn, so the golden model is a minimal
torch mirror of its math (pre-RMSNorm blocks, full-dim QK-RMSNorm, fp32
LayerScale, x_vis_return_idx=-2 early exit) built here from the same
behavioral spec.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoglamm_tpu.config import InternVideo2Config
from videoglamm_tpu.models.internvideo2 import (InternVideo2Tower,
                                                sincos_3d_pos_embed)

CFG = InternVideo2Config.tiny()


def _build_torch_mirror(cfg, depth_total, seed=0):
    import torch

    torch.manual_seed(seed)
    D = cfg.embed_dim

    class RMSNorm(torch.nn.Module):
        def __init__(self, d, eps):
            super().__init__()
            self.weight = torch.nn.Parameter(torch.rand(d) * 0.5 + 0.75)
            self.eps = eps

        def forward(self, x):
            xf = x.float()
            var = xf.pow(2).mean(-1, keepdim=True)
            return (self.weight * (xf * torch.rsqrt(var + self.eps))).to(x.dtype)

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = RMSNorm(D, cfg.rms_eps)
            self.qkv = torch.nn.Linear(D, 3 * D, bias=cfg.qkv_bias)
            self.q_norm = RMSNorm(D, cfg.rms_eps)
            self.k_norm = RMSNorm(D, cfg.rms_eps)
            self.proj = torch.nn.Linear(D, D)
            self.ls1 = torch.nn.Parameter(torch.rand(D) * 0.1)
            self.norm2 = RMSNorm(D, cfg.rms_eps)
            self.fc1 = torch.nn.Linear(D, int(D * cfg.mlp_ratio))
            self.fc2 = torch.nn.Linear(int(D * cfg.mlp_ratio), D)
            self.ls2 = torch.nn.Parameter(torch.rand(D) * 0.1)

        def forward(self, x):
            import torch.nn.functional as F
            B, N, _ = x.shape
            h = self.norm1(x)
            q, k, v = self.qkv(h).chunk(3, dim=-1)
            q, k = self.q_norm(q), self.k_norm(k)
            nh = cfg.num_heads
            hd = D // nh

            def split(t):
                return t.view(B, N, nh, hd).transpose(1, 2)

            attn = (split(q) * hd ** -0.5) @ split(k).transpose(-2, -1)
            o = attn.softmax(-1) @ split(v)
            o = o.transpose(1, 2).reshape(B, N, D)
            x = x + self.proj(o).float() * self.ls1
            h = self.norm2(x)
            x = x + self.fc2(F.gelu(self.fc1(h))).float() * self.ls2
            return x

    class Mirror(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.patch = torch.nn.Conv3d(
                3, D, kernel_size=(1, cfg.patch_size, cfg.patch_size),
                stride=(1, cfg.patch_size, cfg.patch_size))
            self.cls_token = torch.nn.Parameter(torch.randn(1, 1, D) * 0.02)
            n = cfg.num_frames * cfg.tokens_per_frame + 1
            pe = sincos_3d_pos_embed(D, cfg.grid, cfg.num_frames)
            self.pos_embed = torch.nn.Parameter(
                torch.from_numpy(np.asarray(pe))[None])
            self.blocks = torch.nn.ModuleList(
                [Block() for _ in range(depth_total)])

        def forward(self, x, use_image=False):
            # x: [B, C, T, H, W]
            x = self.patch(x)                       # [B, D, T, h, w]
            B, D_, T = x.shape[:3]
            x = x.flatten(3).permute(0, 2, 3, 1).reshape(B, -1, D_)
            x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
            if use_image:
                L = cfg.tokens_per_frame
                img = self.pos_embed[:, 1:].view(
                    1, cfg.num_frames, L, D_).mean(1)
                pe = torch.cat([self.pos_embed[:, :1], img], dim=1)
            else:
                pe = self.pos_embed
            x = x + pe
            for blk in self.blocks[:depth_total - 1]:   # x_vis_return_idx=-2
                x = blk(x)
            return x[:, 1:]

    return Mirror()


def _mirror_state_dict(mirror):
    """torch mirror modules -> reference-checkpoint key layout."""
    sd = {}
    sd["patch_embed.proj.weight"] = mirror.patch.weight
    sd["patch_embed.proj.bias"] = mirror.patch.bias
    sd["cls_token"] = mirror.cls_token
    sd["pos_embed"] = mirror.pos_embed
    for i, blk in enumerate(mirror.blocks):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = blk.norm1.weight
        sd[p + "attn.qkv.weight"] = blk.qkv.weight
        sd[p + "attn.q_norm.weight"] = blk.q_norm.weight
        sd[p + "attn.k_norm.weight"] = blk.k_norm.weight
        sd[p + "attn.proj.weight"] = blk.proj.weight
        sd[p + "attn.proj.bias"] = blk.proj.bias
        sd[p + "ls1.gamma"] = blk.ls1
        sd[p + "norm2.weight"] = blk.norm2.weight
        sd[p + "mlp.fc1.weight"] = blk.fc1.weight
        sd[p + "mlp.fc1.bias"] = blk.fc1.bias
        sd[p + "mlp.fc2.weight"] = blk.fc2.weight
        sd[p + "mlp.fc2.bias"] = blk.fc2.bias
        sd[p + "ls2.gamma"] = blk.ls2
    return sd


def test_shapes():
    model = InternVideo2Tower(CFG, dtype=jnp.float32)
    T = CFG.num_frames
    frames = jnp.zeros((2, T, CFG.image_size, CFG.image_size, 3))
    params = model.init(jax.random.PRNGKey(0), frames)
    out = model.apply(params, frames)
    assert out.shape == (2, T * CFG.tokens_per_frame, CFG.embed_dim)


def test_golden_parity_video_and_image():
    import torch

    mirror = _build_torch_mirror(CFG, CFG.depth)
    sd = _mirror_state_dict(mirror)

    from videoglamm_tpu.io import import_internvideo2
    params = {"params": import_internvideo2(sd, CFG, prefix="")}
    model = InternVideo2Tower(CFG, dtype=jnp.float32)

    T = CFG.num_frames
    rng = np.random.RandomState(0)
    x = rng.randn(2, T, CFG.image_size, CFG.image_size, 3).astype(np.float32)

    with torch.no_grad():
        ref = mirror(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)

    # single-frame (use_image) path: temporally-averaged pos embed
    xi = x[:, :1]
    with torch.no_grad():
        ref_i = mirror(torch.from_numpy(xi).permute(0, 4, 1, 2, 3),
                       use_image=True).numpy()
    got_i = np.asarray(model.apply(params, jnp.asarray(xi), use_image=True))
    np.testing.assert_allclose(got_i, ref_i, atol=2e-4, rtol=2e-4)
