"""Fused decode-step kernels (ops/decode_mlp.py): interpret-mode Pallas vs
the XLA composition they replace, plus block-accumulation consistency.

These kernels are the int8 serving decode path for the LLM layers
(models/phi3.py fused branch); end-to-end behavior is additionally covered
by the int8 generation/mask parity gate (tests/test_int8_parity.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videoglamm_tpu.ops import decode_mlp as dm


def _rand(rng, *shape, scale=1.0, dtype=jnp.bfloat16):
    return jnp.asarray(rng.randn(*shape) * scale, dtype)


@pytest.mark.parametrize("M", [1, 4])
@pytest.mark.parametrize("block_i", [128, 256])
def test_fused_mlp_matches_xla(M, block_i):
    rng = np.random.RandomState(0)
    K, I, D = 256, 512, 256
    x = _rand(rng, M, K, scale=0.5)
    nw = jnp.asarray(rng.rand(K) + 0.5, jnp.float32)
    wgu = jnp.asarray(rng.randint(-127, 128, (K, 2 * I)), jnp.int8)
    sgu = jnp.asarray(rng.rand(2 * I) * 1e-3, jnp.float32)
    wd = jnp.asarray(rng.randint(-127, 128, (I, D)), jnp.int8)
    sd = jnp.asarray(rng.rand(D) * 1e-3, jnp.float32)

    ref = dm._fused_mlp_ref(x, nw, wgu, sgu, wd, sd, 1e-5)
    ker = dm._fused_mlp_pallas(x, nw, wgu, sgu, wd, sd, 1e-5,
                               block_i=block_i, interpret=True)
    ref, ker = ref.astype(jnp.float32), ker.astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref)))
    # bf16-rounding-level agreement (the kernel and the XLA path round the
    # glu intermediate at slightly different points)
    assert float(jnp.max(jnp.abs(ref - ker))) <= 0.02 * scale


def test_fused_norm_matmul_matches_xla():
    rng = np.random.RandomState(1)
    K, N = 256, 768
    x = _rand(rng, 1, K, scale=0.5)
    nw = jnp.asarray(rng.rand(K) + 0.5, jnp.float32)
    w = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    s = jnp.asarray(rng.rand(N) * 1e-3, jnp.float32)
    ref = dm._norm_matmul_ref(x, nw, w, s, 1e-5).astype(jnp.float32)
    ker = dm._norm_matmul_pallas(x, nw, w, s, 1e-5, block_n=256,
                                 interpret=True).astype(jnp.float32)
    # identical op order -> exact
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ker), atol=0)


def test_matmul_residual_matches_xla():
    rng = np.random.RandomState(2)
    K, N = 256, 256
    x = _rand(rng, 1, K, scale=0.5)
    w = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    s = jnp.asarray(rng.rand(N) * 1e-3, jnp.float32)
    res = _rand(rng, 1, N)
    ref = res + (jnp.dot(x, w.astype(x.dtype),
                         preferred_element_type=jnp.float32)
                 * s).astype(x.dtype)
    ker = dm._matmul_residual_pallas(x, w, s, res, interpret=True)
    ref, ker = ref.astype(jnp.float32), ker.astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ref - ker))) <= 0.01 * scale


def test_dispatchers_fall_back_off_tpu():
    """On CPU the public wrappers must take the XLA path (identical to the
    composition) for any shape, including non-128-multiples."""
    rng = np.random.RandomState(3)
    K, I, D = 96, 160, 96          # deliberately not 128-aligned
    x = _rand(rng, 2, K, scale=0.5)
    nw = jnp.asarray(rng.rand(K) + 0.5, jnp.float32)
    wgu = jnp.asarray(rng.randint(-127, 128, (K, 2 * I)), jnp.int8)
    sgu = jnp.asarray(rng.rand(2 * I) * 1e-3, jnp.float32)
    wd = jnp.asarray(rng.randint(-127, 128, (I, D)), jnp.int8)
    sd = jnp.asarray(rng.rand(D) * 1e-3, jnp.float32)
    out = dm.fused_decode_mlp_int8(x, nw, wgu, sgu, wd, sd, eps=1e-5)
    ref = dm._fused_mlp_ref(x, nw, wgu, sgu, wd, sd, 1e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0)

    w = jnp.asarray(rng.randint(-127, 128, (K, 3 * K)), jnp.int8)
    s = jnp.asarray(rng.rand(3 * K) * 1e-3, jnp.float32)
    out = dm.fused_norm_matmul_int8(x, nw, w, s, eps=1e-5)
    ref = dm._norm_matmul_ref(x, nw, w, s, 1e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0)


def test_fused_decode_layer_matches_unfused(monkeypatch):
    """The phi3 decoder layer's fused decode branch must agree with the
    op-by-op branch at the same params (VGT_FUSED_DECODE toggles; on CPU
    both run XLA, so this checks the plumbing — weights accessors,
    residual order, eps — not kernel numerics)."""
    from videoglamm_tpu.config import Phi3Config
    from videoglamm_tpu.models.phi3 import Phi3DecoderLayer, init_kv_cache

    cfg = Phi3Config(hidden_size=64, intermediate_size=128, num_heads=4,
                     num_kv_heads=4, head_dim=16, num_layers=2,
                     vocab_size=128, max_position_embeddings=64)
    layer = Phi3DecoderLayer(cfg, quant_int8=True)
    B, C = 2, 16
    rng = np.random.RandomState(4)
    x = _rand(rng, B, 1, cfg.hidden_size, scale=0.3)
    cache = init_kv_cache(cfg, B, C)
    pos = jnp.full((B, 1), 3, jnp.int32)
    kv_lens = jnp.full((B,), 4, jnp.int32)
    params = layer.init(jax.random.PRNGKey(0), x, pos, cache, kv_lens,
                        layer_idx=jnp.int32(0))
    # randomize the int8 kernels/scales so the check is non-trivial
    params = jax.tree_util.tree_map(
        lambda a: (jnp.asarray(rng.randint(-5, 6, a.shape), a.dtype)
                   if a.dtype == jnp.int8 else
                   jnp.asarray(rng.rand(*a.shape) * 0.05 + 0.01, a.dtype)
                   if a.ndim >= 1 and a.dtype == jnp.float32 else a),
        params)

    monkeypatch.setenv("VGT_FUSED_DECODE", "1")
    y_fused, _ = layer.apply(params, x, pos, cache, kv_lens,
                             layer_idx=jnp.int32(0))
    monkeypatch.setenv("VGT_FUSED_DECODE", "0")
    y_ref, _ = layer.apply(params, x, pos, cache, kv_lens,
                           layer_idx=jnp.int32(0))
    yf = np.asarray(y_fused, np.float32)
    yr = np.asarray(y_ref, np.float32)
    scale = max(np.abs(yr).max(), 1e-6)
    # silu rounds at slightly different points between the two branches
    assert np.abs(yf - yr).max() <= 0.02 * scale
