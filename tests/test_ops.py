"""Numerical tests for core ops: attention, norms, pooling, resize.

Pooling/resize are golden-tested against torch (CPU) for the bit-parity
contract (SURVEY.md §7.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoglamm_tpu.ops import (adaptive_avg_pool2d, dot_product_attention,
                                layer_norm, resize_bilinear, resize_nearest,
                                rms_norm)
from videoglamm_tpu.ops.attention import _attention_xla, _flash_fwd
from videoglamm_tpu.ops.pooling import adaptive_pool_tokens


def test_attention_matches_naive_softmax():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 4, 64, 32), jnp.float32)
    k = jnp.asarray(rng.randn(2, 4, 80, 32), jnp.float32)
    v = jnp.asarray(rng.randn(2, 4, 80, 32), jnp.float32)
    out = dot_product_attention(q, k, v)
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(32)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", probs, v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_attention_causal_and_kvlens():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, 2, 16, 8), jnp.float32)
    k = jnp.asarray(rng.randn(2, 2, 16, 8), jnp.float32)
    v = jnp.asarray(rng.randn(2, 2, 16, 8), jnp.float32)
    out = dot_product_attention(q, k, v, causal=True)
    # row 0 of a causal attention only sees col 0
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), np.asarray(v[0, 0, 0]),
                               atol=1e-6)
    # kv_lens semantics: queries are the last Sq valid keys. With a 16-slot
    # buffer holding 10 valid keys and 2 queries, perturbing slots >= 10
    # changes nothing, and the queries align to absolute positions 8..9.
    kv_lens = jnp.array([16, 10], jnp.int32)
    q2 = q[:, :, :2]
    outl = dot_product_attention(q2, k, v, causal=True, kv_lens=kv_lens)
    k2 = k.at[1, :, 12:].set(99.0)
    v2 = v.at[1, :, 12:].set(99.0)
    outl2 = dot_product_attention(q2, k2, v2, causal=True, kv_lens=kv_lens)
    np.testing.assert_allclose(np.asarray(outl[1]), np.asarray(outl2[1]),
                               atol=1e-6)
    # batch 1 query 0 sits at absolute pos 8 -> attends exactly keys 0..8
    ref = dot_product_attention(q2[1:, :, 0:1], k[1:, :, :9], v[1:, :, :9])
    np.testing.assert_allclose(np.asarray(outl[1, :, 0]),
                               np.asarray(ref[0, :, 0]), atol=1e-5)


def test_flash_kernel_interpret_matches_xla():
    """Run the Pallas kernel in interpret mode on CPU vs the XLA path."""
    from jax.experimental import pallas  # noqa
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 2, 256, 64), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 384, 64), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 384, 64), jnp.float32)
    kv_lens = jnp.array([300], jnp.int32)
    from jax.experimental.pallas import tpu as pltpu
    q_start = kv_lens - q.shape[2]
    with pltpu.force_tpu_interpret_mode():
        out, _ = _flash_fwd(q, k, v, kv_lens, q_start, causal=True,
                            sm_scale=0.125)
    ref = _attention_xla(q, k, v, causal=True, sm_scale=0.125,
                         kv_lens=kv_lens, bias=None)
    # also: prefill alignment (queries start at 0 over a padded buffer)
    q_start0 = jnp.zeros((1,), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out0, _ = _flash_fwd(q, k, v, kv_lens, q_start0, causal=True,
                             sm_scale=0.125)
    ref0 = _attention_xla(q, k, v, causal=True, sm_scale=0.125,
                          kv_lens=kv_lens, bias=None, q_start=q_start0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_decode_attention_quant_interpret_matches_xla():
    """Single-pass int8-KV decode kernel vs the XLA quant-aware path, in
    interpret mode on CPU: MHA and GQA head grouping, ragged cache length
    (C not a block multiple), per-row kv_lens, f32 and bf16 queries."""
    from videoglamm_tpu.models.kvcache import _quantize
    from videoglamm_tpu.ops.attention import decode_attention_quant

    rng = np.random.RandomState(7)
    for (B, Hq, Hkv, C, hd), dtype, tol in [
            ((2, 4, 4, 300, 96), jnp.float32, 2e-5),   # MHA, ragged C
            ((1, 8, 2, 700, 64), jnp.float32, 2e-5),   # GQA G=4, 2 blocks+rag
            ((2, 8, 4, 160, 96), jnp.bfloat16, 2e-2),  # storage dtype, G=2
    ]:
        q = jnp.asarray(rng.randn(B, Hq, 1, hd), dtype)
        kf = jnp.asarray(rng.randn(B, Hkv, C, hd), jnp.float32)
        vf = jnp.asarray(rng.randn(B, Hkv, C, hd), jnp.float32)
        kq, ks = _quantize(kf)
        vq, vs = _quantize(vf)
        # token-major flat cache layout ([B, C, Hkv*hd], models/kvcache.py)
        kflat = jnp.transpose(kq, (0, 2, 1, 3)).reshape(B, C, Hkv * hd)
        vflat = jnp.transpose(vq, (0, 2, 1, 3)).reshape(B, C, Hkv * hd)
        kv_lens = jnp.asarray(
            rng.randint(C // 2, C + 1, size=(B,)), jnp.int32)
        out = decode_attention_quant(q, kflat, vflat, ks, vs, kv_lens,
                                     sm_scale=hd ** -0.5, block_k=128,
                                     interpret=True)
        rep = Hq // Hkv
        ref = _attention_xla(
            q, jnp.repeat(kq, rep, axis=1), jnp.repeat(vq, rep, axis=1),
            causal=False, sm_scale=hd ** -0.5, kv_lens=kv_lens, bias=None,
            k_scale=jnp.repeat(ks, rep, axis=1),
            v_scale=jnp.repeat(vs, rep, axis=1))
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=tol, rtol=tol)


def test_decode_attention_quant_stacked_layer_select():
    """The decoder scan passes the FULL stacked cache ([L, B, C, Hkv*hd])
    plus a traced layer index; the kernel must select that layer's slab via
    its scalar-prefetch index maps (no XLA slice copy). Each layer holds
    different data, so a wrong selection is a loud mismatch."""
    from videoglamm_tpu.models.kvcache import _quantize
    from videoglamm_tpu.ops.attention import decode_attention_quant

    rng = np.random.RandomState(11)
    L, B, Hq, Hkv, C, hd = 3, 2, 8, 4, 300, 96
    q = jnp.asarray(rng.randn(B, Hq, 1, hd), jnp.float32)
    kf = jnp.asarray(rng.randn(L, B, Hkv, C, hd), jnp.float32)
    vf = jnp.asarray(rng.randn(L, B, Hkv, C, hd), jnp.float32)
    kq, ks = _quantize(kf)
    vq, vs = _quantize(vf)
    kflat = jnp.transpose(kq, (0, 1, 3, 2, 4)).reshape(L, B, C, Hkv * hd)
    vflat = jnp.transpose(vq, (0, 1, 3, 2, 4)).reshape(L, B, C, Hkv * hd)
    kv_lens = jnp.asarray(rng.randint(C // 2, C + 1, size=(B,)), jnp.int32)
    rep = Hq // Hkv
    for layer in range(L):
        out = decode_attention_quant(
            q, kflat, vflat, ks, vs, kv_lens, jnp.int32(layer),
            sm_scale=hd ** -0.5, block_k=128, interpret=True)
        ref = _attention_xla(
            q, jnp.repeat(kq[layer], rep, axis=1),
            jnp.repeat(vq[layer], rep, axis=1),
            causal=False, sm_scale=hd ** -0.5, kv_lens=kv_lens, bias=None,
            k_scale=jnp.repeat(ks[layer], rep, axis=1),
            v_scale=jnp.repeat(vs[layer], rep, axis=1))
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-5, rtol=2e-5)


def test_rms_norm():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 32), jnp.float32)
    w = jnp.asarray(rng.randn(32), jnp.float32)
    out = rms_norm(x, w, eps=1e-6)
    xf = np.asarray(x)
    ref = xf / np.sqrt((xf ** 2).mean(-1, keepdims=True) + 1e-6) * np.asarray(w)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_layer_norm_matches_torch():
    import torch
    rng = np.random.RandomState(4)
    x = rng.randn(3, 17).astype(np.float32)
    w = rng.randn(17).astype(np.float32)
    b = rng.randn(17).astype(np.float32)
    out = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-5)
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (17,), torch.from_numpy(w), torch.from_numpy(b),
        eps=1e-5).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (8, 8)),
                                          ((24, 24), (12, 12)),
                                          ((17, 13), (5, 7))])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    import torch
    rng = np.random.RandomState(5)
    x = rng.randn(2, 3, *in_hw).astype(np.float32)  # NCHW for torch
    ref = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x), out_hw).numpy()
    x_jax = jnp.moveaxis(jnp.asarray(x), 1, -1)  # NHWC
    out = adaptive_avg_pool2d(x_jax, out_hw)
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_adaptive_pool_tokens():
    rng = np.random.RandomState(6)
    tokens = jnp.asarray(rng.randn(2, 256, 8), jnp.float32)
    out = adaptive_pool_tokens(tokens, (8, 8))
    assert out.shape == (2, 64, 8)
    # 16x16 -> 8x8 is an exact 2x2 mean
    grid = np.asarray(tokens).reshape(2, 16, 16, 8)
    ref = grid.reshape(2, 8, 2, 8, 2, 8).mean(axis=(2, 4)).reshape(2, 64, 8)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((7, 9), (20, 14)),
                                          ((64, 64), (37, 41)),
                                          ((256, 256), (100, 180))])
def test_resize_bilinear_matches_torch(in_hw, out_hw):
    import torch
    rng = np.random.RandomState(7)
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), out_hw, mode="bilinear",
        align_corners=False).numpy()
    out = resize_bilinear(jnp.asarray(x), out_hw, channels_last=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_resize_nearest_matches_torch():
    import torch
    rng = np.random.RandomState(8)
    x = rng.randn(1, 2, 13, 17).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), (29, 7), mode="nearest").numpy()
    out = resize_nearest(jnp.asarray(x), (29, 7), channels_last=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_attention_grad_flows():
    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(1, 2, 8, 4), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 8, 4), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 8, 4), jnp.float32)
    g = jax.grad(lambda q_: dot_product_attention(q_, k, v, causal=True).sum())(q)
    assert np.isfinite(np.asarray(g)).all()


def test_connected_components_vs_scipy():
    from scipy import ndimage
    from videoglamm_tpu.ops import connected_components
    rng = np.random.RandomState(7)
    masks = np.stack([rng.rand(24, 31) > 0.6 for _ in range(3)])
    labels, areas = connected_components(jnp.asarray(masks))
    labels, areas = np.asarray(labels), np.asarray(areas)
    struct = np.ones((3, 3))
    for b in range(3):
        ref_lab, n = ndimage.label(masks[b], structure=struct)
        # same partition: component count and a consistent bijection
        got = labels[b]
        assert (got > 0).sum() == (ref_lab > 0).sum()
        assert len(np.unique(got[got > 0])) == n
        for lab_id in np.unique(got[got > 0]):
            sel = got == lab_id
            ref_vals = np.unique(ref_lab[sel])
            assert len(ref_vals) == 1            # no split
            assert (ref_lab == ref_vals[0]).sum() == sel.sum()  # no merge
        # areas
        ref_areas = ndimage.sum_labels(masks[b], ref_lab,
                                       np.arange(1, n + 1))
        for lab_id in np.unique(got[got > 0]):
            sel = got == lab_id
            assert areas[b][sel][0] == sel.sum()


def test_small_object_removal_device():
    from videoglamm_tpu.ops import remove_small_objects_device
    m = np.zeros((1, 16, 16), bool)
    m[0, 1:7, 1:7] = True     # 36 px
    m[0, 12, 12] = True       # 1 px sprinkle
    out = np.asarray(remove_small_objects_device(jnp.asarray(m), 5))
    assert out[0, 2, 2] and not out[0, 12, 12]


def test_hole_filling_device():
    from videoglamm_tpu.ops import postprocess_mask_scores
    logits = np.full((1, 16, 16), 5.0, np.float32)   # foreground everywhere
    logits[0, 5, 5] = -5.0                           # 1-px hole
    logits[0, :2] = -5.0                             # big background region
    out = np.asarray(postprocess_mask_scores(jnp.asarray(logits),
                                             max_hole_area=4))
    assert out[0, 5, 5] > 0                          # hole filled
    assert out[0, 0, 0] < 0                          # big region untouched


def test_window_attention_interpret_matches_xla():
    """Single-block batched attention kernel (Hiera windows / InternVideo2 /
    CLIP route) in interpret mode vs the XLA path, incl. the padded-column
    masking (577 -> 640) and the G-grouping remainder (B*H=6 with G|8)."""
    from jax.experimental.pallas import tpu as pltpu
    from videoglamm_tpu.ops.attention import _window_attention

    rng = np.random.RandomState(3)
    for (B, H, S, D) in [(2, 3, 256, 72), (1, 2, 577, 64), (1, 1, 130, 88)]:
        q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
        k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
        v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = _window_attention(q, k, v, D ** -0.5)
        ref = _attention_xla(q, k, v, causal=False, sm_scale=D ** -0.5,
                             kv_lens=None, bias=None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

        # gradients route through the XLA recompute vjp
        def loss_win(q_):
            with pltpu.force_tpu_interpret_mode():
                return _window_attention(q_, k, v, D ** -0.5).sum()

        def loss_ref(q_):
            return _attention_xla(q_, k, v, causal=False, sm_scale=D ** -0.5,
                                  kv_lens=None, bias=None).sum()
        np.testing.assert_allclose(np.asarray(jax.grad(loss_win)(q)),
                                   np.asarray(jax.grad(loss_ref)(q)),
                                   atol=2e-5, rtol=2e-5)


def test_smallwin_attention_interpret_matches_xla():
    """Tiny-window packed-tile kernel (Hiera stage-1/2/4 windows) in
    interpret mode vs the XLA path: 16/64-token windows, several heads at
    unpadded lane offsets (hd=72), window counts that exercise the
    tile-pack (P=8/P=2) and the per-program fold divisor search. Gradients
    route through the XLA recompute vjp."""
    from jax.experimental.pallas import tpu as pltpu
    from videoglamm_tpu.ops.attention import (_smallwin_tpu, _smallwin_xla,
                                              attention_packed_qkv_smallwin)

    rng = np.random.RandomState(5)
    for (NW, S, H, hd) in [(16, 64, 2, 72), (32, 16, 4, 72), (8, 64, 16, 72),
                           (6, 64, 2, 40), (24, 16, 1, 88)]:
        qkv = jnp.asarray(rng.randn(NW, S, 3 * H * hd), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = _smallwin_tpu(qkv, H, hd, hd ** -0.5)
        ref = _smallwin_xla(qkv, H, hd ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    # vjp: XLA recompute
    NW, S, H, hd = 4, 64, 2, 72
    qkv = jnp.asarray(rng.randn(NW, S, 3 * H * hd), jnp.float32)

    def loss_k(q_):
        with pltpu.force_tpu_interpret_mode():
            return _smallwin_tpu(q_, H, hd, hd ** -0.5).sum()

    def loss_ref(q_):
        return _smallwin_xla(q_, H, hd ** -0.5).sum()
    np.testing.assert_allclose(np.asarray(jax.grad(loss_k)(qkv)),
                               np.asarray(jax.grad(loss_ref)(qkv)),
                               atol=2e-5, rtol=2e-5)

    # dispatcher: odd window counts (NW % (128//S) != 0) fall back to XLA
    qkv_odd = jnp.asarray(rng.randn(3, 64, 3 * 2 * 72), jnp.float32)
    out = attention_packed_qkv_smallwin(qkv_odd, 2, 72)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_smallwin_xla(qkv_odd, 2,
                                                        72 ** -0.5)),
                               atol=2e-5, rtol=2e-5)


def test_fused_block_interpret_matches_ref():
    """Whole-block fused Hiera kernel (ops/fused_block.py) in interpret
    mode vs its jnp reference: the three Hiera-L window geometries
    (S=64/16/256 at hd=72) plus a fold-divisor-fallback case (odd NW) and
    an off-size head dim. Gradients route through the XLA recompute vjp."""
    from videoglamm_tpu.ops.fused_block import (_fused_block_fwd,
                                                _fused_block_ref,
                                                fused_window_block)

    rng = np.random.RandomState(7)

    def mk(NW, S, H, hd):
        C = H * hd
        M = 4 * C
        x = jnp.asarray(rng.randn(NW, S, C) * 0.5, jnp.float32)
        p = {k: jnp.asarray(v, jnp.float32) for k, v in dict(
            ln1_scale=rng.randn(C) * 0.1 + 1, ln1_bias=rng.randn(C) * 0.1,
            wqkv=rng.randn(C, 3 * C) / np.sqrt(C),
            bqkv=rng.randn(3 * C) * 0.02,
            wproj=rng.randn(C, C) / np.sqrt(C),
            bproj=rng.randn(C) * 0.02,
            ln2_scale=rng.randn(C) * 0.1 + 1, ln2_bias=rng.randn(C) * 0.1,
            wup=rng.randn(C, M) / np.sqrt(C), bup=rng.randn(M) * 0.02,
            wdown=rng.randn(M, C) / np.sqrt(M),
            bdown=rng.randn(C) * 0.02).items()}
        return x, p

    for (NW, S, H, hd) in [(8, 64, 2, 72), (16, 16, 4, 72),
                           (4, 256, 8, 72), (3, 64, 2, 40)]:
        x, p = mk(NW, S, H, hd)
        out = _fused_block_fwd(x, p, num_heads=H, eps=1e-6, interpret=True)
        ref = _fused_block_ref(x, p, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)

    # gradients: XLA recompute vjp (dispatcher runs the ref on CPU; this
    # checks the custom_vjp plumbing end to end)
    x, p = mk(4, 64, 2, 72)
    g_op = jax.grad(lambda x_: fused_window_block(x_, p, 2).sum())(x)
    g_ref = jax.grad(lambda x_: _fused_block_ref(x_, p, 2, 1e-6).sum())(x)
    np.testing.assert_allclose(np.asarray(g_op), np.asarray(g_ref),
                               atol=3e-5, rtol=3e-5)


def test_patch_embed_im2col_matches_conv():
    """Hiera 7x7/s4/p3 patch embed: the space-to-depth + matmul path must be
    arithmetically identical to the overlapping conv (models/sam2/hiera.py)."""
    from videoglamm_tpu.models.sam2.hiera import _patch_embed_im2col
    rng = np.random.RandomState(11)
    for H, W in [(64, 64), (32, 48)]:
        x = jnp.asarray(rng.randn(2, H, W, 3), jnp.float32)
        w = jnp.asarray(rng.randn(7, 7, 3, 24), jnp.float32)
        b = jnp.asarray(rng.randn(24), jnp.float32)
        got = _patch_embed_im2col(x, w, b)
        ref = jax.lax.conv_general_dilated(
            x, w, (4, 4), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ref = ref + b
        assert got.shape == (2, H // 4, W // 4, 24)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_bshd_kernel_interpret_matches_xla():
    """BSHD single-pass kernel (InternVideo2/CLIP/Hiera forward path) in
    interpret mode vs the XLA einsum, incl. non-128-multiple S (padded-column
    masking), head-grouping remainders (H=3 -> G=1, H=6 -> G=2), and
    head_dim < 128 lane padding."""
    from jax.experimental.pallas import tpu as pltpu
    from videoglamm_tpu.ops.attention import (_attention_bshd_tpu,
                                              _attention_xla_bshd)

    rng = np.random.RandomState(7)
    for (B, H, S, D) in [(2, 3, 256, 72), (1, 6, 577, 64), (1, 2, 130, 88),
                         (1, 4, 1025, 88)]:
        q = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
        k = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
        v = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = _attention_bshd_tpu(q, k, v, D ** -0.5)
        ref = _attention_xla_bshd(q, k, v, D ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"B={B} H={H} S={S} D={D}")


def test_packed_qkv_kernel_interpret_matches_xla():
    """Packed-qkv kernel in interpret mode vs the XLA einsum, incl. the
    win > 0 block-diagonal mask (Hiera folded windows) and head grouping."""
    from jax.experimental.pallas import tpu as pltpu
    from videoglamm_tpu.ops.attention import (_packed_qkv_tpu,
                                              _attention_xla_bshd)

    rng = np.random.RandomState(8)
    for (B, H, S, D, win) in [(2, 2, 256, 72, 0), (1, 4, 577, 64, 0),
                              (1, 2, 512, 88, 128), (2, 3, 256, 64, 64)]:
        qkv = jnp.asarray(rng.randn(B, S, 3 * H * D), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = _packed_qkv_tpu(qkv, H, D ** -0.5, win)
        x = qkv.reshape(B, S, 3, H, D)
        ref = _attention_xla_bshd(x[:, :, 0], x[:, :, 1], x[:, :, 2],
                                  D ** -0.5, win)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"B={B} H={H} S={S} D={D} w={win}")


def test_bshd_dispatch_head_dim_guard():
    """Heads wider than one 128-lane tile must not hit the Pallas kernel —
    the dispatchers fall back to XLA (ADVICE r2: silent truncation risk)."""
    from videoglamm_tpu.ops.attention import (attention_bshd,
                                              attention_packed_qkv,
                                              _attention_xla_bshd)
    rng = np.random.RandomState(9)
    B, H, S, D = 1, 2, 256, 160   # D > 128
    q = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    out = attention_bshd(q, k, v)
    ref = _attention_xla_bshd(q, k, v, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    qkv = jnp.asarray(rng.randn(B, S, 3 * H * D), jnp.float32)
    out = attention_packed_qkv(qkv, H)
    x = qkv.reshape(B, S, 3, H, D)
    ref = _attention_xla_bshd(x[:, :, 0], x[:, :, 1], x[:, :, 2], D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_backward_interpret_matches_xla():
    """Pallas dq/dk/dv (interpret mode) vs jax.vjp through the XLA path,
    causal + kv_lens + prefill q_start, non-128-multiple shapes."""
    from jax.experimental.pallas import tpu as pltpu
    from videoglamm_tpu.ops.attention import flash_attention
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(2, 2, 200, 64), jnp.float32)
    k = jnp.asarray(rng.randn(2, 2, 320, 64), jnp.float32)
    v = jnp.asarray(rng.randn(2, 2, 320, 64), jnp.float32)
    kv_lens = jnp.array([320, 260], jnp.int32)
    g = jnp.asarray(rng.randn(2, 2, 200, 64), jnp.float32)

    for causal, q_start in ((True, jnp.zeros((2,), jnp.int32)),
                            (True, None), (False, None)):
        def loss_flash(q_, k_, v_):
            with pltpu.force_tpu_interpret_mode():
                out = flash_attention(q_, k_, v_, causal=causal,
                                      kv_lens=kv_lens, q_start=q_start,
                                      sm_scale=0.125)
            return (out * g).sum()

        def loss_xla(q_, k_, v_):
            qs = q_start if q_start is not None else kv_lens - q_.shape[2]
            out = _attention_xla(q_, k_, v_, causal=causal, sm_scale=0.125,
                                 kv_lens=kv_lens, bias=None, q_start=qs)
            return (out * g).sum()

        with pltpu.force_tpu_interpret_mode():
            dq, dk, dv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        dq_r, dk_r, dv_r = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for got, want, name in ((dq, dq_r, "dq"), (dk, dk_r, "dk"),
                                (dv, dv_r, "dv")):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4,
                err_msg=f"{name} causal={causal} q_start={q_start}")


def test_int4_quant_roundtrip_and_matmul():
    from jax.experimental.pallas import tpu as pltpu
    from videoglamm_tpu.ops.quant import (_dequant4_weights, dequant4_matmul,
                                          quantize_int4)
    rng = np.random.RandomState(5)
    K, N, G = 256, 192, 128
    w = rng.randn(K, N).astype(np.float32) * 0.1
    packed, scales = quantize_int4(jnp.asarray(w), group=G)
    assert packed.shape == (K // 2, N) and scales.shape == (K // G, N)
    wd = np.asarray(_dequant4_weights(packed, scales, G, jnp.float32))
    # 4-bit symmetric: error bounded by scale/2 per group
    bound = np.repeat(np.asarray(scales), G, axis=0) / 2 + 1e-6
    assert (np.abs(wd - w) <= bound).all()

    x = jnp.asarray(rng.randn(3, K), jnp.float32)
    ref = np.asarray(x) @ wd
    got = np.asarray(dequant4_matmul(x, packed, scales, group=G))
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)

    # pallas matvec path (interpret) == dequantize-then-dot path
    from videoglamm_tpu.ops.quant import _dequant4_matvec_pallas
    with pltpu.force_tpu_interpret_mode():
        got_k = np.asarray(_dequant4_matvec_pallas(x, packed, scales,
                                                   group=G))
    np.testing.assert_allclose(got_k, ref, atol=2e-3, rtol=2e-3)


def test_w8a8_matmul_routing_and_accuracy(monkeypatch):
    """Large-M int8 matmuls route through dynamic per-token W8A8 (s8 x s8 ->
    s32); the activation quantization error must stay within the per-token
    absmax bound, and small-M / opted-out calls must stay bit-identical to
    the fused-dequant path."""
    from videoglamm_tpu.ops.quant import (_w8a8_matmul, dequant_matmul,
                                          quantize_int8)
    rng = np.random.RandomState(7)
    M, K, N = 300, 128, 192
    x = jnp.asarray(rng.randn(M, K), jnp.float32)
    w8, ws = quantize_int8(jnp.asarray(rng.randn(K, N), jnp.float32))

    exact = np.asarray(x) @ (np.asarray(w8, np.float32) * np.asarray(ws))
    got = np.asarray(_w8a8_matmul(x, w8, ws))
    # per-token absmax quantization: |dx| <= amax/254 per element, so the
    # row error is bounded by (amax/254) * sum_k |w_k n|
    amax = np.abs(np.asarray(x)).max(axis=1, keepdims=True)
    wl1 = (np.abs(np.asarray(w8, np.float32)) * np.asarray(ws)).sum(axis=0)
    bound = amax / 254.0 * wl1[None, :] + 1e-4
    assert (np.abs(got - exact) <= bound).all()

    # routing: M >= threshold goes W8A8 (matches the direct call), below it
    # and with VGT_W8A8=0 the fused-dequant result comes back
    monkeypatch.setenv("VGT_W8A8_MIN_M", "256")
    assert np.array_equal(np.asarray(dequant_matmul(x, w8, ws)), got)
    small = np.asarray(dequant_matmul(x[:4], w8, ws))
    np.testing.assert_allclose(small, exact[:4], atol=1e-3, rtol=1e-3)
    monkeypatch.setenv("VGT_W8A8", "0")
    off = np.asarray(dequant_matmul(x, w8, ws))
    assert not np.array_equal(off, got)
    np.testing.assert_allclose(off, exact, atol=1e-3, rtol=1e-3)


def test_packed_padded_kernel_interpret_matches_xla():
    """Head-prepadded packed-qkv kernel (Hiera super-window path) in
    interpret mode vs the XLA einsum over the unpadded heads, incl. win>0
    block-diagonal folding and the real-head-dim sm_scale."""
    from jax.experimental.pallas import tpu as pltpu
    from videoglamm_tpu.ops.attention import (_attention_xla_bshd,
                                              _packed_padded_tpu)

    rng = np.random.RandomState(14)
    for (B, H, S, D, win) in [(4, 2, 512, 72, 64), (2, 4, 512, 72, 16),
                              (1, 2, 256, 88, 0)]:
        qkv = rng.randn(B, S, 3, H, D).astype(np.float32)
        qkv_p = np.zeros((B, S, 3, H, 128), np.float32)
        qkv_p[..., :D] = qkv
        with pltpu.force_tpu_interpret_mode():
            out = _packed_padded_tpu(
                jnp.asarray(qkv_p.reshape(B, S, 3 * H * 128)), H,
                D ** -0.5, win)
        out = np.asarray(out).reshape(B, S, H, 128)
        ref = _attention_xla_bshd(jnp.asarray(qkv[:, :, 0]),
                                  jnp.asarray(qkv[:, :, 1]),
                                  jnp.asarray(qkv[:, :, 2]),
                                  D ** -0.5, win)
        np.testing.assert_allclose(out[..., :D], np.asarray(ref),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"{B},{H},{S},{D},{win}")
        assert np.abs(out[..., D:]).max() == 0.0
