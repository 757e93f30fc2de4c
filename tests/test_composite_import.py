"""Composite checkpoint import: reference HF-export key layout -> flax tree
that the VideoGLaMM model accepts, with numeric parity on the adapter heads
and end-to-end execution through the inference pipeline. Also round-trips
through Orbax."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoglamm_tpu.config import VideoGLaMMConfig
from videoglamm_tpu.io import (compose_videoglamm_params, import_videoglamm,
                               load_params, save_params)
from videoglamm_tpu.models import VideoGLaMM

from ref_sam2 import build_reference_sam2
from test_videoglamm import CFG, make_batch
from test_sam2_full_golden import CFG as SAM_TINY


def _build_reference_layout_state_dict(cfg):
    """Assemble a torch state dict with the reference VideoGLaMM HF-export
    key names from independently-initialized torch modules."""
    import torch
    from transformers import Phi3Config as HFPhi3Config
    from transformers import Phi3ForCausalLM as HFPhi3

    torch.manual_seed(0)
    lcfg = cfg.llm
    hf = HFPhi3(HFPhi3Config(
        vocab_size=lcfg.vocab_size + 1,  # [SEG] row already resized-in
        hidden_size=lcfg.hidden_size,
        intermediate_size=lcfg.intermediate_size,
        num_hidden_layers=lcfg.num_layers,
        num_attention_heads=lcfg.num_heads,
        num_key_value_heads=lcfg.num_kv_heads,
        max_position_embeddings=lcfg.max_position_embeddings,
        rms_norm_eps=lcfg.rms_norm_eps,
        rope_theta=lcfg.rope_theta, pad_token_id=0))
    sd = {k: v for k, v in hf.state_dict().items()}

    H = lcfg.hidden_size
    mm = torch.nn.Sequential(torch.nn.Linear(cfg.internvideo.embed_dim, H),
                             torch.nn.GELU(), torch.nn.Linear(H, H))
    imm = torch.nn.Sequential(torch.nn.Linear(cfg.clip.hidden_size, H),
                              torch.nn.GELU(), torch.nn.Linear(H, H))
    fcs = torch.nn.Sequential(torch.nn.Linear(H, H), torch.nn.ReLU(),
                              torch.nn.Linear(H, cfg.out_dim),
                              torch.nn.Dropout(0.0))
    for name, mod in (("model.mm_projector", mm),
                      ("model.image_mm_projector", imm),
                      ("model.text_hidden_fcs.0", fcs)):
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v

    sam = build_reference_sam2(cfg.sam2)
    for k, v in sam.state_dict().items():
        sd[f"model.visual_model.{k}"] = v
    return sd, fcs


# tiny composite whose SAM piece matches the reference-buildable tiny SAM2
COMP = VideoGLaMMConfig.tiny(num_frames=4)
COMP = COMP.__class__(**{**COMP.__dict__, "sam2": SAM_TINY})


@pytest.mark.slow
def test_composite_import_and_run():
    import torch
    sd, fcs = _build_reference_layout_state_dict(COMP)
    params = import_videoglamm(sd, COMP)

    # tower params still come from their own checkpoints -> random init here,
    # then overwrite the imported pieces
    model = VideoGLaMM(COMP, dtype=jnp.float32)
    batch = make_batch(np.random.RandomState(0))
    init = model.init(jax.random.PRNGKey(0), **batch)["params"]
    for k, v in params.items():
        assert k in init, k
        init[k] = v

    out = model.apply({"params": init}, **batch)
    assert np.isfinite(float(out.loss))

    # text_hidden_fcs numeric parity vs the torch Sequential
    x = np.random.RandomState(1).randn(3, COMP.llm.hidden_size).astype(
        np.float32)
    with torch.no_grad():
        want = fcs(torch.from_numpy(x)).numpy()
    got = model.apply(
        {"params": init}, jnp.asarray(x),
        method=lambda mdl, a: mdl.text_hidden_fcs(a))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_orbax_roundtrip(tmp_path):
    sd, _ = _build_reference_layout_state_dict(COMP)
    params = import_videoglamm(sd, COMP)
    d = str(tmp_path / "ckpt")
    save_params(d, params)
    restored = load_params(d, params)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_merge_matches_peft_math():
    import torch
    from videoglamm_tpu.io.import_torch import merge_lora_state_dict

    torch.manual_seed(0)
    base = {"model.layers.0.self_attn.qkv_proj.weight": torch.randn(12, 8)}
    r, alpha = 2, 16
    A = torch.randn(r, 8)
    B = torch.randn(12, r)
    lora = {
        "base_model.model.model.layers.0.self_attn.qkv_proj.lora_A.weight": A,
        "base_model.model.model.layers.0.self_attn.qkv_proj.lora_B.weight": B,
    }
    merged = merge_lora_state_dict(base, lora, r=r, alpha=alpha)
    want = base["model.layers.0.self_attn.qkv_proj.weight"] \
        + (B @ A) * (alpha / r)
    assert torch.allclose(
        merged["model.layers.0.self_attn.qkv_proj.weight"], want)


def test_convert_checkpoint_cli(tmp_path, monkeypatch):
    """End-to-end convert CLI on a tiny reference-layout export: torch dir ->
    orbax params -> loadable tree."""
    import torch
    import videoglamm_tpu.cli.convert_checkpoint as mod
    from videoglamm_tpu.config import VideoGLaMMConfig
    from videoglamm_tpu.io import load_params

    sd, _ = _build_reference_layout_state_dict(COMP)
    exp = tmp_path / "hf_export"
    exp.mkdir()
    torch.save(sd, exp / "pytorch_model.bin")

    import videoglamm_tpu.config as config_mod
    monkeypatch.setattr(config_mod.VideoGLaMMConfig, "flagship",
                        staticmethod(lambda: COMP))
    out = str(tmp_path / "params")
    mod.main(["--hf_export", str(exp), "--out", out])
    restored = load_params(out)
    assert "llm" in restored and "sam" in restored
    assert "text_hidden_fcs" in restored
