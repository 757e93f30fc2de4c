"""Phi-3 decoder: shapes, KV-cache consistency, HF golden parity, splicing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoglamm_tpu.config import Phi3Config
from videoglamm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from videoglamm_tpu.models.phi3 import Phi3ForCausalLM, init_kv_cache
from videoglamm_tpu.models.multimodal import splice_visual_prefix

CFG = Phi3Config.tiny()


@pytest.fixture(scope="module")
def model_and_params():
    model = Phi3ForCausalLM(CFG, extra_vocab=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.full((1,), 8, jnp.int32),
                        method=Phi3ForCausalLM.forward_ids)
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    B, S = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, CFG.vocab_size)
    embeds = model.apply(params, ids, method=Phi3ForCausalLM.embed)
    positions = jnp.arange(S)[None].repeat(B, 0)
    lens = jnp.array([S, S - 3])
    logits, hidden, _ = model.apply(params, embeds, positions, lens)
    assert logits.shape == (B, S, CFG.vocab_size + 1)
    assert hidden.shape == (B, S, CFG.hidden_size)


@pytest.mark.slow
def test_kv_cache_decode_matches_full(model_and_params):
    model, params = model_and_params
    B, S = 2, 10
    prefill = 6
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, CFG.vocab_size)
    embeds = model.apply(params, ids, method=Phi3ForCausalLM.embed)
    positions = jnp.arange(S)[None].repeat(B, 0)

    # full forward
    full_logits, _, _ = model.apply(params, embeds, positions,
                                    jnp.full((B,), S, jnp.int32))

    # prefill + decode
    cache = init_kv_cache(CFG, B, max_len=16, dtype=jnp.float32)
    lens = jnp.full((B,), prefill, jnp.int32)
    logits_p, _, cache = model.apply(params, embeds[:, :prefill],
                                     positions[:, :prefill], lens, cache)
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(full_logits[:, :prefill]),
                               atol=2e-4, rtol=2e-4)
    step_logits = []
    for t in range(prefill, S):
        lens = lens + 1
        lg, _, cache = model.apply(params, embeds[:, t:t + 1],
                                   positions[:, t:t + 1], lens, cache)
        step_logits.append(lg[:, 0])
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits,
                               np.asarray(full_logits[:, prefill:]),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_int8_kv_cache_decode_close_to_full(model_and_params):
    """Quantized (int8 per-token/head) KV cache decode tracks the full
    forward within int8 quantization error (models/kvcache.py)."""
    model, params = model_and_params
    B, S = 2, 10
    prefill = 6
    ids = jax.random.randint(jax.random.PRNGKey(5), (B, S), 0, CFG.vocab_size)
    embeds = model.apply(params, ids, method=Phi3ForCausalLM.embed)
    positions = jnp.arange(S)[None].repeat(B, 0)
    full_logits, _, _ = model.apply(params, embeds, positions,
                                    jnp.full((B,), S, jnp.int32))

    cache = init_kv_cache(CFG, B, max_len=16, dtype=jnp.float32,
                          quant_kv=True)
    assert cache["k"].dtype == jnp.int8 and "k_scale" in cache
    lens = jnp.full((B,), prefill, jnp.int32)
    logits_p, _, cache = model.apply(params, embeds[:, :prefill],
                                     positions[:, :prefill], lens, cache)
    step_logits = [np.asarray(logits_p)]
    for t in range(prefill, S):
        lens = lens + 1
        lg, _, cache = model.apply(params, embeds[:, t:t + 1],
                                   positions[:, t:t + 1], lens, cache)
        step_logits.append(np.asarray(lg))
    got = np.concatenate(step_logits, axis=1)
    ref = np.asarray(full_logits)
    # int8 K/V perturbs logits at the ~1% level on random activations
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)
    # argmax (greedy decode) must agree almost everywhere
    assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.9


@pytest.mark.golden
def test_phi3_matches_hf_transformers():
    """Golden parity: random tiny HF Phi3 -> import -> same logits."""
    import torch
    from transformers import Phi3Config as HFPhi3Config
    from transformers import Phi3ForCausalLM as HFPhi3

    from videoglamm_tpu.io import import_phi3

    hf_cfg = HFPhi3Config(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        rope_theta=CFG.rope_theta, rms_norm_eps=CFG.rms_norm_eps,
        tie_word_embeddings=False, attn_implementation="eager",
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(0)
    hf = HFPhi3(hf_cfg).eval().float()

    B, S = 2, 9
    ids_np = np.random.RandomState(3).randint(0, CFG.vocab_size, (B, S))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids_np)).logits.numpy()

    params = {"params": import_phi3(hf.state_dict(), CFG, extra_vocab=0)}
    model = Phi3ForCausalLM(CFG, extra_vocab=0, dtype=jnp.float32)
    ids = jnp.asarray(ids_np)
    embeds = model.apply(params, ids, method=Phi3ForCausalLM.embed)
    positions = jnp.arange(S)[None].repeat(B, 0)
    logits, _, _ = model.apply(params, embeds, positions,
                               jnp.full((B,), S, jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-3)


def test_splice_visual_prefix():
    B, S, V, D = 2, 6, 3, 4
    ids = np.array([[5, 6, IMAGE_TOKEN_INDEX, 7, 8, 0],
                    [IMAGE_TOKEN_INDEX, 9, 10, 0, 0, 0]], np.int32)
    # embeddings = token id broadcast, visual = 100+k
    text_embeds = jnp.asarray(np.repeat(ids[..., None], D, -1), jnp.float32)
    visual = jnp.asarray(
        100 + np.arange(B * V).reshape(B, V, 1).repeat(D, -1), jnp.float32)
    labels = jnp.asarray(ids + 1000)
    lens = jnp.array([5, 3])

    out = splice_visual_prefix(text_embeds, jnp.asarray(ids), visual, lens,
                               labels)
    assert out.embeds.shape == (B, S - 1 + V, D)
    row0 = np.asarray(out.embeds[0, :, 0])
    np.testing.assert_array_equal(row0[:2], [5, 6])
    np.testing.assert_array_equal(row0[2:5], [100, 101, 102])
    np.testing.assert_array_equal(row0[5:7], [7, 8])
    row1 = np.asarray(out.embeds[1, :, 0])
    np.testing.assert_array_equal(row1[:3], [103, 104, 105])
    np.testing.assert_array_equal(row1[3:5], [9, 10])
    # labels: visual run ignored, rest shifted
    lab0 = np.asarray(out.labels[0])
    assert (lab0[2:5] == IGNORE_INDEX).all()
    assert lab0[0] == 1005 and lab0[5] == 1007
    # lengths: 5-1+3=7 and 3-1+3=5
    np.testing.assert_array_equal(np.asarray(out.attn_lens), [7, 5])
    # padding labels ignored
    assert (np.asarray(out.labels[1])[5:] == IGNORE_INDEX).all()


def test_clip_tower_shapes():
    from videoglamm_tpu.config import CLIPVisionConfig
    from videoglamm_tpu.models.clip_vit import CLIPVisionTower
    cfg = CLIPVisionConfig.tiny()
    model = CLIPVisionTower(cfg, dtype=jnp.float32)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats.shape == (2, cfg.num_patches, cfg.hidden_size)


@pytest.mark.golden
def test_clip_tower_matches_hf():
    """Golden parity for the CLIP tower against HF CLIPVisionModel."""
    import torch
    from transformers import CLIPVisionConfig as HFCLIPCfg
    from transformers import CLIPVisionModel as HFCLIP

    from videoglamm_tpu.config import CLIPVisionConfig
    from videoglamm_tpu.io.import_torch import import_clip_vision
    from videoglamm_tpu.models.clip_vit import CLIPVisionTower

    cfg = CLIPVisionConfig.tiny()
    hf_cfg = HFCLIPCfg(hidden_size=cfg.hidden_size,
                       intermediate_size=cfg.intermediate_size,
                       num_hidden_layers=cfg.num_layers,
                       num_attention_heads=cfg.num_heads,
                       image_size=cfg.image_size, patch_size=cfg.patch_size,
                       hidden_act="quick_gelu",
                       layer_norm_eps=cfg.layer_norm_eps,
                       attn_implementation="eager")
    torch.manual_seed(1)
    hf = HFCLIP(hf_cfg).eval().float()

    x_np = np.random.RandomState(4).randn(
        2, 3, cfg.image_size, cfg.image_size).astype(np.float32)
    with torch.no_grad():
        hs = hf(torch.from_numpy(x_np), output_hidden_states=True).hidden_states
    ref = hs[cfg.select_layer].numpy()[:, 1:]  # patch features

    params = {"params": import_clip_vision(hf.state_dict(), cfg)}
    model = CLIPVisionTower(cfg, dtype=jnp.float32)
    out = model.apply(params, jnp.asarray(x_np).transpose(0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-3)


@pytest.mark.golden
def test_llama_matches_hf_transformers():
    """Golden parity: tiny HF Llama (with llama3 rope scaling) -> import ->
    same logits."""
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM as HFLlama

    from videoglamm_tpu.config import LlamaConfig
    from videoglamm_tpu.io.import_torch import import_llama
    from videoglamm_tpu.models.llama import LlamaForCausalLM

    cfg = LlamaConfig.tiny()
    hf_cfg = HFLlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192},
        attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = HFLlama(hf_cfg).eval()

    model = LlamaForCausalLM(cfg, dtype=jnp.float32)
    params = {"params": import_llama(hf.state_dict(), cfg)}

    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 9))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    positions = jnp.arange(9)[None].repeat(2, 0)
    logits, _, _ = model.apply(
        params, jnp.asarray(ids), positions, jnp.full((2,), 9, jnp.int32),
        method=LlamaForCausalLM.forward_ids)
    np.testing.assert_allclose(np.asarray(logits), want, atol=3e-4,
                               rtol=3e-4)


def test_int8_quantized_decode_close_to_f32():
    """Weight-only int8 Phi-3: same structure, outputs within quantization
    tolerance of the float model; KV-cached decode path works."""
    from videoglamm_tpu.io.import_torch import quantize_phi3_params
    from videoglamm_tpu.models.phi3 import init_kv_cache

    model = Phi3ForCausalLM(CFG, extra_vocab=1, dtype=jnp.float32)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    pos0 = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(5), ids0, pos0,
                        jnp.full((1,), 8, jnp.int32),
                        method=Phi3ForCausalLM.forward_ids)
    qparams = {"params": quantize_phi3_params(params["params"])}
    qmodel = Phi3ForCausalLM(CFG, extra_vocab=1, dtype=jnp.float32,
                             quant_int8=True)

    B, S = 2, 10
    ids = jax.random.randint(jax.random.PRNGKey(6), (B, S), 0,
                             CFG.vocab_size)
    positions = jnp.arange(S)[None].repeat(B, 0)
    lens = jnp.full((B,), S, jnp.int32)
    ref, ref_h, _ = model.apply(params, ids, positions, lens,
                                method=Phi3ForCausalLM.forward_ids)
    got, got_h, _ = qmodel.apply(qparams, ids, positions, lens,
                                 method=Phi3ForCausalLM.forward_ids)
    # hidden states close in relative terms (int8 weight error ~0.4%)
    ref_h = np.asarray(ref_h)
    err = np.abs(np.asarray(got_h) - ref_h).mean() / (np.abs(ref_h).mean()
                                                      + 1e-8)
    assert err < 0.05, err
    # argmax token agreement on most positions
    agree = (np.asarray(ref.argmax(-1)) == np.asarray(got.argmax(-1))).mean()
    assert agree > 0.7, agree

    # cached decode runs
    cache = init_kv_cache(CFG, B, 16, dtype=jnp.float32)
    lg, _, cache = qmodel.apply(qparams, qmodel.apply(
        qparams, ids[:, :4], method=Phi3ForCausalLM.embed),
        positions[:, :4], jnp.full((B,), 4, jnp.int32), cache)
    assert np.isfinite(np.asarray(lg)).all()
