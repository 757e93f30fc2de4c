"""InternVideo2 tower: shape contract, sincos pos embed, golden parity vs
the REAL reference torch module (model/videogpt_plus/model/internvideo/
internvideo2.py) executed on CPU through the flash-attn shims in
ref_internvideo2.py — deployed configuration (use_flash_attn +
use_fused_rmsnorm + use_fused_mlp all True)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoglamm_tpu.config import InternVideo2Config
from videoglamm_tpu.models.internvideo2 import (InternVideo2Tower,
                                                sincos_3d_pos_embed)

from ref_internvideo2 import build_reference_internvideo2

pytestmark = pytest.mark.golden

CFG = InternVideo2Config.tiny()


def test_shapes():
    model = InternVideo2Tower(CFG, dtype=jnp.float32)
    T = CFG.num_frames
    frames = jnp.zeros((2, T, CFG.image_size, CFG.image_size, 3))
    params = model.init(jax.random.PRNGKey(0), frames)
    out = model.apply(params, frames)
    assert out.shape == (2, T * CFG.tokens_per_frame, CFG.embed_dim)


def test_golden_parity_vs_reference_module():
    import torch

    ref = build_reference_internvideo2(CFG, seed=0)
    sd = {k: v for k, v in ref.state_dict().items()}

    from videoglamm_tpu.io import import_internvideo2
    params = {"params": import_internvideo2(sd, CFG, prefix="")}
    model = InternVideo2Tower(CFG, dtype=jnp.float32)

    T = CFG.num_frames
    rng = np.random.RandomState(0)
    x = rng.randn(2, T, CFG.image_size, CFG.image_size, 3).astype(np.float32)

    # reference: [B, C, T, H, W], fusion path = x_vis_return_idx=-2,
    # x_vis_only, cls token dropped (arch.py:142)
    with torch.no_grad():
        xv = ref(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                 use_image=False, x_vis_return_idx=-2, x_vis_only=True)
    ref_out = xv[:, 1:].numpy()

    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=2e-4)

    # single-frame (use_image) path: temporally-averaged pos embed
    xi = x[:, :1]
    with torch.no_grad():
        xv_i = ref(torch.from_numpy(xi).permute(0, 4, 1, 2, 3),
                   use_image=True, x_vis_return_idx=-2, x_vis_only=True)
    ref_i = xv_i[:, 1:].numpy()
    got_i = np.asarray(model.apply(params, jnp.asarray(xi), use_image=True))
    np.testing.assert_allclose(got_i, ref_i, atol=2e-4, rtol=2e-4)


def test_golden_parity_head_padded_path():
    """Flagship-like head dim (88 = 1408/16) exercises the head-padded
    attention path (weight-padded qkv + pad-aware qk-norms +
    attention_packed_qkv_padded + pad-consuming proj) against the REAL
    reference torch module."""
    import torch

    cfg = InternVideo2Config(image_size=28, patch_size=14, embed_dim=176,
                             depth=3, num_heads=2, mlp_ratio=2.0,
                             num_frames=4, attn_pool_num_heads=2,
                             clip_embed_dim=32)
    assert 64 <= cfg.embed_dim // cfg.num_heads < 128  # hd=88: padded path

    ref = build_reference_internvideo2(cfg, seed=1)
    sd = {k: v for k, v in ref.state_dict().items()}

    from videoglamm_tpu.io import import_internvideo2
    params = {"params": import_internvideo2(sd, cfg, prefix="")}
    model = InternVideo2Tower(cfg, dtype=jnp.float32)

    rng = np.random.RandomState(1)
    x = rng.randn(2, cfg.num_frames, cfg.image_size, cfg.image_size,
                  3).astype(np.float32)
    with torch.no_grad():
        xv = ref(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                 use_image=False, x_vis_return_idx=-2, x_vis_only=True)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, xv[:, 1:].numpy(), atol=2e-4, rtol=2e-4)
