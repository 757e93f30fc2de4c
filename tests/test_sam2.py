"""SAM-2 stack: shapes, prompt plumbing, memory machinery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoglamm_tpu.config import SAM2Config
from videoglamm_tpu.models.sam2.sam2_base import SAM2Base

CFG = SAM2Config.tiny()


@pytest.fixture(scope="module")
def sam2():
    model = SAM2Base(CFG, dtype=jnp.float32)
    imgs = jnp.zeros((1, CFG.image_size, CFG.image_size, 3))
    text = jnp.zeros((1, 1, CFG.d_model))
    params = model.init(jax.random.PRNGKey(0), imgs, text)
    return model, params


def test_forward_image_shapes(sam2):
    model, params = sam2
    imgs = jnp.asarray(np.random.RandomState(0).randn(
        2, CFG.image_size, CFG.image_size, 3), jnp.float32)
    feats, pos = model.apply(params, imgs, method=SAM2Base.forward_image)
    E = CFG.low_res_size
    assert feats[-1].shape == (2, E, E, CFG.d_model)
    assert feats[0].shape == (2, 4 * E, 4 * E, CFG.d_model // 8)
    assert feats[1].shape == (2, 2 * E, 2 * E, CFG.d_model // 4)
    assert pos[-1].shape[-1] == CFG.d_model


def test_text_prompted_decode(sam2):
    model, params = sam2
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(1, CFG.image_size, CFG.image_size, 3),
                       jnp.float32)
    feats, pos = model.apply(params, imgs, method=SAM2Base.forward_image)
    text = jnp.asarray(rng.randn(1, 1, CFG.d_model), jnp.float32)
    heads = model.apply(params, feats[-1], None, None, text,
                        (feats[0], feats[1]), True,
                        method=SAM2Base.forward_sam_heads)
    S = CFG.image_size
    assert heads.high_res_masks.shape == (1, 1, S, S)
    assert heads.low_res_multimasks.shape[1] == 3  # multimask
    assert heads.obj_ptr.shape == (1, CFG.d_model)
    # text prompt must influence the decoder (masks get clamped to
    # NO_OBJ_SCORE under random init, so probe scores/ious instead)
    text2 = text + 10.0
    heads2 = model.apply(params, feats[-1], None, None, text2,
                         (feats[0], feats[1]), True,
                         method=SAM2Base.forward_sam_heads)
    assert not np.allclose(np.asarray(heads.object_score_logits),
                           np.asarray(heads2.object_score_logits))
    assert not np.allclose(np.asarray(heads.ious), np.asarray(heads2.ious))


def test_memory_conditioning(sam2):
    model, params = sam2
    rng = np.random.RandomState(2)
    E = CFG.low_res_size
    B, C, Dm = 1, CFG.d_model, CFG.mem_dim
    feat = jnp.asarray(rng.randn(B, E, E, C), jnp.float32)
    posm = jnp.asarray(rng.randn(B, E, E, C), jnp.float32)
    M = 2 * E * E + 4
    memory = jnp.asarray(rng.randn(B, M, Dm), jnp.float32)
    mem_pos = jnp.asarray(rng.randn(B, M, Dm), jnp.float32)
    kv_mask = jnp.ones((B, M), bool).at[:, E * E:2 * E * E].set(False)

    out = model.apply(params, feat, posm, memory, mem_pos, 4, kv_mask,
                      jnp.ones((B,), bool),
                      method=SAM2Base.condition_features)
    assert out.shape == feat.shape
    # masked-out memory slots must not affect the output
    memory2 = memory.at[:, E * E:2 * E * E].set(123.0)
    out2 = model.apply(params, feat, posm, memory2, mem_pos, 4, kv_mask,
                       jnp.ones((B,), bool),
                       method=SAM2Base.condition_features)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)
    # use_memory=False -> no-mem path independent of memory content
    out3 = model.apply(params, feat, posm, memory, mem_pos, 4, kv_mask,
                       jnp.zeros((B,), bool),
                       method=SAM2Base.condition_features)
    out4 = model.apply(params, feat, posm, memory2 * 0, mem_pos, 4, kv_mask,
                       jnp.zeros((B,), bool),
                       method=SAM2Base.condition_features)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out4), atol=1e-5)


def test_encode_new_memory(sam2):
    model, params = sam2
    rng = np.random.RandomState(3)
    E, S = CFG.low_res_size, CFG.image_size
    feat = jnp.asarray(rng.randn(1, E, E, CFG.d_model), jnp.float32)
    masks = jnp.asarray(rng.randn(1, S, S, 1), jnp.float32)
    mem, pos = model.apply(params, feat, masks, jnp.zeros((1, 1)),
                           method=SAM2Base.encode_new_memory)
    assert mem.shape == (1, E * E, CFG.mem_dim)
    assert pos.shape == (E * E, CFG.mem_dim)
