"""Golden-parity tests: flax SAM-2 components vs the REFERENCE torch modules
executed as the oracle (random weights imported through io.import_torch)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoglamm_tpu.config import HieraConfig
from videoglamm_tpu.io.import_torch import import_sam2_hiera
from videoglamm_tpu.models.sam2.hiera import Hiera

from ref_sam2 import load_reference_sam2

pytestmark = pytest.mark.golden

TINY = HieraConfig(embed_dim=16, num_heads=1, stages=(1, 2, 2, 1),
                   global_att_blocks=(4,), window_spec=(4, 2, 2, 2))


def _ref_hiera(cfg, seed=0):
    import torch
    load_reference_sam2()
    from model.segment_anything_2.sam2.modeling.backbones.hieradet import \
        Hiera as RefHiera
    torch.manual_seed(seed)
    ref = RefHiera(
        embed_dim=cfg.embed_dim, num_heads=cfg.num_heads, stages=cfg.stages,
        global_att_blocks=cfg.global_att_blocks,
        window_spec=cfg.window_spec,
        window_pos_embed_bkg_spatial_size=cfg.window_pos_embed_bkg_spatial_size)
    # randomize params that init to zeros (pos embeds)
    with torch.no_grad():
        ref.pos_embed.normal_(std=0.5)
        ref.pos_embed_window.normal_(std=0.5)
    return ref


@pytest.mark.parametrize("img", [128, 256])
def test_hiera_golden(img):
    import torch
    cfg = TINY
    ref = _ref_hiera(cfg)
    x = np.random.RandomState(0).randn(2, img, img, 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref_outs = [o.permute(0, 2, 3, 1).numpy() for o in ref_outs]

    model = Hiera(cfg, dtype=jnp.float32)
    params = {"params": import_sam2_hiera(ref.state_dict(), cfg)}
    outs = model.apply(params, jnp.asarray(x))

    assert len(outs) == len(ref_outs)
    for got, want in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3,
                                   rtol=2e-3)


def test_hiera_layout_hoisting_exact():
    """Window-layout hoisting (partition/unpartition lifted out of
    same-window block runs, global blocks running window-major) is a pure
    token reordering. Token-local ops (norm/MLP/residual/projection) are
    bit-identical under reordering, but GLOBAL-attention blocks reduce over
    the token axis (softmax denominator, PV matmul): running them in
    window-major order changes f32 accumulation order, so the two layouts
    agree only to last-ulp f32 noise, not bitwise. The contract is
    therefore a tight tolerance (observed max|delta| ~5e-7 on this config;
    bound set at 1e-5 abs against the ~1e1-scale activations to stay
    deterministic across BLAS backends)."""
    cfg = TINY
    x = jnp.asarray(np.random.RandomState(1).randn(2, 128, 128, 3),
                    jnp.float32)
    params = Hiera(cfg, dtype=jnp.float32).init(jax.random.PRNGKey(0), x)
    outs_h = Hiera(cfg, dtype=jnp.float32, hoist_layout=True).apply(params, x)
    outs_p = Hiera(cfg, dtype=jnp.float32, hoist_layout=False).apply(params, x)
    for h, p in zip(outs_h, outs_p):
        np.testing.assert_allclose(np.asarray(h), np.asarray(p),
                                   atol=1e-5, rtol=1e-5)
