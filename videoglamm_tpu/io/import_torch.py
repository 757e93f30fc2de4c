"""PyTorch -> flax checkpoint importers.

The reference composes pretrained weights from three formats (SURVEY §5.4):
HF base weights + non_lora_trainables.bin + PEFT LoRA merge
(/root/reference/VideoGLaMM/train_ds_with_videogptplus.py:146-210) and SAM
checkpoints with a .gamma->.weight rename
(model/segment_anything_2/sam2/build_sam.py:93-116). These importers map each
torch state_dict into the corresponding flax param tree (layer-stacked for
scanned modules). torch is only required at import time (CPU build is fine);
everything downstream is pure JAX.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp


def t2j(tensor) -> jnp.ndarray:
    """torch tensor (any dtype/device) -> f32 jax array."""
    if hasattr(tensor, "detach"):
        tensor = tensor.detach().to("cpu").float().numpy()
    return jnp.asarray(np.asarray(tensor, dtype=np.float32))


def _stack_layers(sd: Mapping, fmt: str, n: int, transpose: bool = False):
    ws = [t2j(sd[fmt.format(i=i)]) for i in range(n)]
    w = jnp.stack(ws)
    if transpose:
        w = jnp.swapaxes(w, -1, -2)
    return w


def _linear(sd, prefix):
    out = {"kernel": jnp.swapaxes(t2j(sd[prefix + ".weight"]), -1, -2)}
    if prefix + ".bias" in sd:
        out["bias"] = t2j(sd[prefix + ".bias"])
    return out


def import_phi3(state_dict: Mapping, cfg, extra_vocab: int = 0):
    """HF Phi3ForCausalLM state_dict -> Phi3ForCausalLM flax params.

    extra_vocab > 0 appends mean-initialized embedding/lm_head rows for added
    tokens ([SEG]) — matching resize_token_embeddings + finetuning behavior."""
    sd = state_dict
    L = cfg.num_layers

    emb = t2j(sd["model.embed_tokens.weight"])
    head = jnp.swapaxes(t2j(sd["lm_head.weight"]), 0, 1)
    if extra_vocab:
        emb_pad = jnp.tile(emb.mean(0, keepdims=True), (extra_vocab, 1))
        emb = jnp.concatenate([emb, emb_pad], axis=0)
        head_pad = jnp.tile(head.mean(1, keepdims=True), (1, extra_vocab))
        head = jnp.concatenate([head, head_pad], axis=1)

    layers = {
        "input_layernorm": {"scale": _stack_layers(
            sd, "model.layers.{i}.input_layernorm.weight", L)},
        "post_attention_layernorm": {"scale": _stack_layers(
            sd, "model.layers.{i}.post_attention_layernorm.weight", L)},
        "qkv_proj": {"kernel": _stack_layers(
            sd, "model.layers.{i}.self_attn.qkv_proj.weight", L, True)},
        "o_proj": {"kernel": _stack_layers(
            sd, "model.layers.{i}.self_attn.o_proj.weight", L, True)},
        "gate_up_proj": {"kernel": _stack_layers(
            sd, "model.layers.{i}.mlp.gate_up_proj.weight", L, True)},
        "down_proj": {"kernel": _stack_layers(
            sd, "model.layers.{i}.mlp.down_proj.weight", L, True)},
    }
    return {
        "embed_tokens": {"embedding": emb},
        "model": {
            "layers": layers,
            "norm": {"scale": t2j(sd["model.norm.weight"])},
        },
        "lm_head": {"kernel": head},
    }


def import_clip_vision(state_dict: Mapping, cfg, prefix: str = "vision_model."):
    """HF CLIPVisionModel state_dict -> CLIPVisionTower flax params.

    Only the layers actually executed (up to the select layer) are imported."""
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state_dict.items()}
    n_run = cfg.num_layers + cfg.select_layer + 1 \
        if cfg.select_layer < 0 else cfg.select_layer

    # torch conv kernel [D, 3, p, p] -> [p, p, 3, D]
    pk = t2j(sd["embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
    params = {
        "patch_embedding": pk,
        "class_embedding": t2j(sd["embeddings.class_embedding"]).reshape(-1),
        "position_embedding": t2j(sd["embeddings.position_embedding.weight"]),
        "pre_layrnorm": {
            "scale": t2j(sd["pre_layrnorm.weight"]),
            "bias": t2j(sd["pre_layrnorm.bias"]),
        },
    }
    for i in range(n_run):
        p = f"encoder.layers.{i}."
        params[f"layers_{i}"] = {
            "layer_norm1": {"scale": t2j(sd[p + "layer_norm1.weight"]),
                            "bias": t2j(sd[p + "layer_norm1.bias"])},
            "layer_norm2": {"scale": t2j(sd[p + "layer_norm2.weight"]),
                            "bias": t2j(sd[p + "layer_norm2.bias"])},
            "self_attn": {
                "q_proj": _linear(sd, p + "self_attn.q_proj"),
                "k_proj": _linear(sd, p + "self_attn.k_proj"),
                "v_proj": _linear(sd, p + "self_attn.v_proj"),
                "out_proj": _linear(sd, p + "self_attn.out_proj"),
            },
            "mlp_fc1": _linear(sd, p + "mlp.fc1"),
            "mlp_fc2": _linear(sd, p + "mlp.fc2"),
        }
    return params
