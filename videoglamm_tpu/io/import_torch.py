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
    # pad up to vocab+extra rows (exports that already resized for [SEG]
    # carry the rows; fresh base checkpoints need mean-init padding,
    # reference train_ds_with_videogptplus.py:297-300)
    target = cfg.vocab_size + extra_vocab
    if emb.shape[0] < target:
        n = target - emb.shape[0]
        emb = jnp.concatenate(
            [emb, jnp.tile(emb.mean(0, keepdims=True), (n, 1))], axis=0)
        head = jnp.concatenate(
            [head, jnp.tile(head.mean(1, keepdims=True), (1, n))], axis=1)

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


def import_internvideo2(state_dict: Mapping, cfg,
                        prefix: str = "vision_encoder.",
                        x_vis_return_idx: int = -2):
    """InternVideo2 torch checkpoint -> InternVideo2Tower flax params.

    Accepts the InternVideo2_Stage2V layout (keys under `vision_encoder.`,
    reference model/videogpt_plus/model/internvideo/utils.py:146-240) or a
    bare PretrainInternVideo2 state_dict. Only the blocks the fusion path
    executes (0..depth+x_vis_return_idx) are imported, stacked for nn.scan."""
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state_dict.items()}
    n_run = cfg.depth + x_vis_return_idx + 1

    # torch Conv3d kernel [D, 3, tub, p, p] -> [p, p, 3, D] (tubelet 1)
    pk = t2j(sd["patch_embed.proj.weight"])
    assert pk.shape[2] == 1, "tubelet_size != 1 not supported"
    pk = pk[:, :, 0].transpose(2, 3, 1, 0)

    blocks = {
        "norm1": {"scale": _stack_layers(sd, "blocks.{i}.norm1.weight", n_run)},
        "norm2": {"scale": _stack_layers(sd, "blocks.{i}.norm2.weight", n_run)},
        "qkv": {"kernel": _stack_layers(
            sd, "blocks.{i}.attn.qkv.weight", n_run, True)},
        "attn_proj": {
            "kernel": _stack_layers(sd, "blocks.{i}.attn.proj.weight",
                                    n_run, True),
            "bias": _stack_layers(sd, "blocks.{i}.attn.proj.bias", n_run),
        },
        "mlp_fc1": {
            "kernel": _stack_layers(sd, "blocks.{i}.mlp.fc1.weight",
                                    n_run, True),
            "bias": _stack_layers(sd, "blocks.{i}.mlp.fc1.bias", n_run),
        },
        "mlp_fc2": {
            "kernel": _stack_layers(sd, "blocks.{i}.mlp.fc2.weight",
                                    n_run, True),
            "bias": _stack_layers(sd, "blocks.{i}.mlp.fc2.bias", n_run),
        },
        "ls1_gamma": _stack_layers(sd, "blocks.{i}.ls1.gamma", n_run),
        "ls2_gamma": _stack_layers(sd, "blocks.{i}.ls2.gamma", n_run),
    }
    if cfg.qk_normalization:
        blocks["q_norm"] = {"scale": _stack_layers(
            sd, "blocks.{i}.attn.q_norm.weight", n_run)}
        blocks["k_norm"] = {"scale": _stack_layers(
            sd, "blocks.{i}.attn.k_norm.weight", n_run)}
    if "blocks.0.attn.qkv.bias" in sd:
        blocks["qkv"]["bias"] = _stack_layers(
            sd, "blocks.{i}.attn.qkv.bias", n_run)

    return {
        "patch_embedding": pk,
        "patch_bias": t2j(sd["patch_embed.proj.bias"]),
        "cls_token": t2j(sd["cls_token"]).reshape(1, 1, -1),
        "pos_embed": t2j(sd["pos_embed"]).reshape(-1, cfg.embed_dim),
        "blocks": blocks,
    }


def import_sam2_hiera(state_dict: Mapping, cfg, prefix: str = ""):
    """SAM-2 Hiera trunk torch state dict -> flax Hiera params.

    Handles the reference's `.gamma`->`.weight` renamed checkpoints
    (model/segment_anything_2/sam2/build_sam.py:93-116) transparently — keys
    here are already post-rename torch module names."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    depth = sum(cfg.stages)

    def ln(p):
        return {"scale": t2j(sd[p + ".weight"]), "bias": t2j(sd[p + ".bias"])}

    params = {
        "patch_embed": {
            "kernel": t2j(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": t2j(sd["patch_embed.proj.bias"]),
        },
        "pos_embed": t2j(sd["pos_embed"])[0].transpose(1, 2, 0),
        "pos_embed_window": t2j(sd["pos_embed_window"])[0].transpose(1, 2, 0),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        blk = {
            "norm1": ln(p + "norm1"),
            "norm2": ln(p + "norm2"),
            "attn": {
                "qkv": _linear(sd, p + "attn.qkv"),
                "proj": _linear(sd, p + "attn.proj"),
            },
            "mlp": {
                "fc1": _linear(sd, p + "mlp.layers.0"),
                "fc2": _linear(sd, p + "mlp.layers.1"),
            },
        }
        if p + "proj.weight" in sd:
            blk["proj"] = _linear(sd, p + "proj")
        params[f"blocks_{i}"] = blk
    return params


def _conv(sd, prefix):
    """torch Conv2d -> flax Conv params."""
    out = {"kernel": t2j(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = t2j(sd[prefix + ".bias"])
    return out


def _conv1x1(sd, prefix):
    """torch 1x1 Conv2d -> Dense params."""
    w = t2j(sd[prefix + ".weight"])
    out = {"kernel": w[:, :, 0, 0].transpose(1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = t2j(sd[prefix + ".bias"])
    return out


def _convT(sd, prefix):
    """torch ConvTranspose2d (in,out,kh,kw) -> flax ConvTranspose params.
    flax's conv_transpose convolves with the kernel as-is (no flip), while
    torch's transposed conv scatters with it — spatially flip to match."""
    w = t2j(sd[prefix + ".weight"]).transpose(2, 3, 0, 1)
    out = {"kernel": w[::-1, ::-1]}
    if prefix + ".bias" in sd:
        out["bias"] = t2j(sd[prefix + ".bias"])
    return out


def _ln(sd, prefix):
    return {"scale": t2j(sd[prefix + ".weight"]),
            "bias": t2j(sd[prefix + ".bias"])}


def _sam_attn(sd, prefix):
    return {name: _linear(sd, f"{prefix}.{name}")
            for name in ("q_proj", "k_proj", "v_proj", "out_proj")}


def _mlp_block(sd, prefix, n):
    return {f"layers_{j}": _linear(sd, f"{prefix}.layers.{j}")
            for j in range(n)}


def import_sam2(state_dict: Mapping, cfg, prefix: str = "") -> dict:
    """Full reference SAM-2 torch checkpoint -> flax SAM2Base params.

    Accepts checkpoints after the fork's `.gamma`->`.weight` rename
    (model/segment_anything_2/sam2/build_sam.py:93-116). `prefix` strips an
    outer scope (e.g. "visual_model." inside a VideoGLaMM export)."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}

    # --- image encoder ---
    n_levels = len(cfg.hiera.stages)
    neck = {f"convs_{j}": _conv1x1(sd, f"image_encoder.neck.convs.{j}.conv")
            for j in range(n_levels)}
    image_encoder = {
        "trunk": import_sam2_hiera(sd, cfg.hiera, prefix="image_encoder.trunk."),
        "neck": neck,
    }

    # --- prompt encoder ---
    pe = "sam_prompt_encoder."
    prompt_encoder = {
        "pe_gauss": t2j(sd[pe + "pe_layer.positional_encoding_gaussian_matrix"]),
        "point_embeddings": jnp.concatenate(
            [t2j(sd[pe + f"point_embeddings.{i}.weight"]) for i in range(4)]),
        "not_a_point_embed": t2j(sd[pe + "not_a_point_embed.weight"])[0],
        "no_mask_embed": t2j(sd[pe + "no_mask_embed.weight"])[0],
        "mask_conv1": _conv(sd, pe + "mask_downscaling.0"),
        "mask_ln1": _ln(sd, pe + "mask_downscaling.1"),
        "mask_conv2": _conv(sd, pe + "mask_downscaling.3"),
        "mask_ln2": _ln(sd, pe + "mask_downscaling.4"),
        "mask_conv3": _conv(sd, pe + "mask_downscaling.6"),
    }

    # --- mask decoder ---
    md = "sam_mask_decoder."
    tw_layers = {}
    i = 0
    while f"{md}transformer.layers.{i}.norm1.weight" in sd:
        p = f"{md}transformer.layers.{i}."
        tw_layers[f"layers_{i}"] = {
            "self_attn": _sam_attn(sd, p + "self_attn"),
            "cross_attn_token_to_image": _sam_attn(
                sd, p + "cross_attn_token_to_image"),
            "cross_attn_image_to_token": _sam_attn(
                sd, p + "cross_attn_image_to_token"),
            "mlp": {"fc1": _linear(sd, p + "mlp.layers.0"),
                    "fc2": _linear(sd, p + "mlp.layers.1")},
            "norm1": _ln(sd, p + "norm1"),
            "norm2": _ln(sd, p + "norm2"),
            "norm3": _ln(sd, p + "norm3"),
            "norm4": _ln(sd, p + "norm4"),
        }
        i += 1
    transformer = dict(tw_layers)
    transformer["final_attn_token_to_image"] = _sam_attn(
        sd, md + "transformer.final_attn_token_to_image")
    transformer["norm_final_attn"] = _ln(sd, md + "transformer.norm_final_attn")

    nmt = t2j(sd[md + "mask_tokens.weight"]).shape[0]
    mask_decoder = {
        "obj_score_token": t2j(sd[md + "obj_score_token.weight"]),
        "iou_token": t2j(sd[md + "iou_token.weight"]),
        "mask_tokens": t2j(sd[md + "mask_tokens.weight"]),
        "transformer": transformer,
        "upscale_conv1": _convT(sd, md + "output_upscaling.0"),
        "upscale_ln": _ln(sd, md + "output_upscaling.1"),
        "upscale_conv2": _convT(sd, md + "output_upscaling.3"),
        "iou_head": _mlp_block(sd, md + "iou_prediction_head", 3),
        "obj_score_head": _mlp_block(sd, md + "pred_obj_score_head", 3),
    }
    for i in range(nmt):
        mask_decoder[f"hyper_mlps_{i}"] = _mlp_block(
            sd, md + f"output_hypernetworks_mlps.{i}", 3)

    # --- memory encoder ---
    me = "memory_encoder."
    memory_encoder = {
        "mask_down_out": _conv(sd, me + "mask_downsampler.encoder.12"),
        "pix_feat_proj": _conv1x1(sd, me + "pix_feat_proj"),
        "out_proj": _conv1x1(sd, me + "out_proj"),
    }
    for i in range(4):
        memory_encoder[f"mask_down_{i}"] = _conv(
            sd, me + f"mask_downsampler.encoder.{3 * i}")
        memory_encoder[f"mask_down_ln_{i}"] = _ln(
            sd, me + f"mask_downsampler.encoder.{3 * i + 1}")
    for i in range(2):
        p = me + f"fuser.layers.{i}."
        memory_encoder[f"fuser_{i}"] = {
            "dwconv": _conv(sd, p + "dwconv"),
            "norm": _ln(sd, p + "norm"),
            "pwconv1": _linear(sd, p + "pwconv1"),
            "pwconv2": _linear(sd, p + "pwconv2"),
            # fork renames CXBlock.gamma -> .weight (build_sam.py:100)
            "gamma": t2j(sd[p + "weight"] if p + "weight" in sd
                         else sd[p + "gamma"]),
        }

    # --- memory attention ---
    ma_layers = {}
    for i in range(cfg.memory_attention_layers):
        p = f"memory_attention.layers.{i}."
        ma_layers[f"layers_{i}"] = {
            "self_attn": _sam_attn(sd, p + "self_attn"),
            "cross_attn_image": _sam_attn(sd, p + "cross_attn_image"),
            "linear1": _linear(sd, p + "linear1"),
            "linear2": _linear(sd, p + "linear2"),
            "norm1": _ln(sd, p + "norm1"),
            "norm2": _ln(sd, p + "norm2"),
            "norm3": _ln(sd, p + "norm3"),
        }
    memory_attention = dict(ma_layers)
    memory_attention["norm"] = _ln(sd, "memory_attention.norm")

    return {
        "image_encoder": image_encoder,
        "sam_prompt_encoder": prompt_encoder,
        "sam_mask_decoder": mask_decoder,
        "conv_s0": _conv1x1(sd, md + "conv_s0"),
        "conv_s1": _conv1x1(sd, md + "conv_s1"),
        "memory_encoder": memory_encoder,
        "memory_attention": memory_attention,
        "no_mem_embed": t2j(sd["no_mem_embed"]),
        "no_mem_pos_enc": t2j(sd["no_mem_pos_enc"]),
        "maskmem_tpos_enc": t2j(sd["maskmem_tpos_enc"]).reshape(
            cfg.num_maskmem, 1, cfg.mem_dim),
        "no_obj_ptr": t2j(sd["no_obj_ptr"])[0],
        "obj_ptr_proj": _mlp_block(sd, "obj_ptr_proj", 3),
        "mask_downsample": _conv(sd, "mask_downsample"),
    }


def import_projector(sd: Mapping, prefix: str, projector_type: str) -> dict:
    """torch Sequential projector -> VisionProjector params (reference
    build_vision_projector, multimodal_projector/builder.py:5-55)."""
    if projector_type == "linear":
        return {"fc0": _linear(sd, prefix)}
    if projector_type == "mlp2x_gelu":
        return {"fc0": _linear(sd, prefix + ".0"),
                "fc1": _linear(sd, prefix + ".2")}
    raise ValueError(projector_type)


def import_text_hidden_fcs(sd: Mapping,
                           prefix: str = "model.text_hidden_fcs.0") -> dict:
    """reference text_hidden_fcs Sequential(Linear, ReLU, Linear, Dropout)
    (model/VideoGLaMM.py:133-145) -> TextHiddenFCs params."""
    return {"fc0": _linear(sd, prefix + ".0"),
            "fc1": _linear(sd, prefix + ".2")}


def import_videoglamm(state_dict: Mapping, cfg) -> dict:
    """Reference VideoGLaMM HF export -> composite flax param tree (towers
    excluded — load those via import_clip_vision / import_internvideo2).

    The export layout (train_ds_with_videogptplus.py:319-343 save path):
      model.embed_tokens / model.layers.* / model.norm / lm_head  -> Phi-3
      model.mm_projector.* / model.image_mm_projector.*           -> V->L
      model.text_hidden_fcs.0.*                                   -> L->V
      model.visual_model.*                                        -> SAM-2
    """
    sd = dict(state_dict)
    params = {
        "llm": import_phi3(sd, cfg.llm, extra_vocab=1),
        "mm_projector": import_projector(
            sd, "model.mm_projector", cfg.mm_projector_type),
        "image_mm_projector": import_projector(
            sd, "model.image_mm_projector", cfg.mm_projector_type),
        "text_hidden_fcs": import_text_hidden_fcs(sd),
        "sam": import_sam2(sd, cfg.sam2, prefix="model.visual_model."),
    }
    return params


def _sam1_prompt_encoder(sd, pe="prompt_encoder."):
    return {
        "pe_gauss": t2j(sd[pe + "pe_layer.positional_encoding_gaussian_matrix"]),
        "point_embeddings": jnp.concatenate(
            [t2j(sd[pe + f"point_embeddings.{i}.weight"]) for i in range(4)]),
        "not_a_point_embed": t2j(sd[pe + "not_a_point_embed.weight"])[0],
        "no_mask_embed": t2j(sd[pe + "no_mask_embed.weight"])[0],
        "mask_conv1": _conv(sd, pe + "mask_downscaling.0"),
        "mask_ln1": _ln(sd, pe + "mask_downscaling.1"),
        "mask_conv2": _conv(sd, pe + "mask_downscaling.3"),
        "mask_ln2": _ln(sd, pe + "mask_downscaling.4"),
        "mask_conv3": _conv(sd, pe + "mask_downscaling.6"),
    }


def import_sam1(state_dict: Mapping, cfg, prefix: str = "") -> dict:
    """Reference SAM-1 (segment_anything fork, incl. the ITM variant) torch
    state dict -> flax SAM1 params (models/sam1.py)."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}

    # --- image encoder ---
    g = cfg.image_size // 16
    enc = {
        "patch_embedding": t2j(sd["image_encoder.patch_embed.proj.weight"]
                               ).transpose(2, 3, 1, 0),
        "patch_bias": t2j(sd["image_encoder.patch_embed.proj.bias"]),
        "pos_embed": t2j(sd["image_encoder.pos_embed"])[0],
        "neck_conv1": _conv1x1(sd, "image_encoder.neck.0"),
        "neck_ln1": _ln(sd, "image_encoder.neck.1"),
        "neck_conv2": _conv(sd, "image_encoder.neck.2"),
        "neck_ln2": _ln(sd, "image_encoder.neck.3"),
    }
    for i in range(cfg.encoder_depth):
        p = f"image_encoder.blocks.{i}."
        enc[f"blocks_{i}"] = {
            "norm1": _ln(sd, p + "norm1"),
            "norm2": _ln(sd, p + "norm2"),
            "attn": {
                "qkv": _linear(sd, p + "attn.qkv"),
                "proj": _linear(sd, p + "attn.proj"),
                "rel_pos_h": t2j(sd[p + "attn.rel_pos_h"]),
                "rel_pos_w": t2j(sd[p + "attn.rel_pos_w"]),
            },
            "mlp": {"fc1": _linear(sd, p + "mlp.lin1"),
                    "fc2": _linear(sd, p + "mlp.lin2")},
        }

    # --- mask decoder ---
    md = "mask_decoder."
    tw = {}
    i = 0
    while f"{md}transformer.layers.{i}.norm1.weight" in sd:
        p = f"{md}transformer.layers.{i}."
        tw[f"layers_{i}"] = {
            "self_attn": _sam_attn(sd, p + "self_attn"),
            "cross_attn_token_to_image": _sam_attn(
                sd, p + "cross_attn_token_to_image"),
            "cross_attn_image_to_token": _sam_attn(
                sd, p + "cross_attn_image_to_token"),
            "mlp": {"fc1": _linear(sd, p + "mlp.lin1"),
                    "fc2": _linear(sd, p + "mlp.lin2")},
            "norm1": _ln(sd, p + "norm1"),
            "norm2": _ln(sd, p + "norm2"),
            "norm3": _ln(sd, p + "norm3"),
            "norm4": _ln(sd, p + "norm4"),
        }
        i += 1
    tw["final_attn_token_to_image"] = _sam_attn(
        sd, md + "transformer.final_attn_token_to_image")
    tw["norm_final_attn"] = _ln(sd, md + "transformer.norm_final_attn")

    nmt = t2j(sd[md + "mask_tokens.weight"]).shape[0]
    dec = {
        "iou_token": t2j(sd[md + "iou_token.weight"]),
        "mask_tokens": t2j(sd[md + "mask_tokens.weight"]),
        "transformer": tw,
        "upscale_conv1": _convT(sd, md + "output_upscaling.0"),
        "upscale_ln": _ln(sd, md + "output_upscaling.1"),
        "upscale_conv2": _convT(sd, md + "output_upscaling.3"),
        "iou_head": _mlp_block(sd, md + "iou_prediction_head", 3),
    }
    for i in range(nmt):
        dec[f"hyper_mlps_{i}"] = _mlp_block(
            sd, md + f"output_hypernetworks_mlps.{i}", 3)
    if md + "itm_head.mlp1.0.weight" in sd:
        dec["itm_fc1"] = _linear(sd, md + "itm_head.mlp1.0")
        dec["itm_fc2"] = _linear(sd, md + "itm_head.mlp2.0")

    return {
        "image_encoder": enc,
        "prompt_encoder": _sam1_prompt_encoder(sd),
        "mask_decoder": dec,
    }


def compose_videoglamm_params(hf_state_dict: Mapping, cfg,
                              internvideo_state_dict: Mapping = None,
                              clip_state_dict: Mapping = None) -> dict:
    """Full composite param tree from the three reference checkpoint sources
    (HF export + InternVideo2 ckpt + CLIP vision ckpt), mirroring the
    reference's composed load (chat.py:280-325)."""
    params = import_videoglamm(hf_state_dict, cfg)
    if internvideo_state_dict is not None:
        params["vision_tower"] = import_internvideo2(
            internvideo_state_dict, cfg.internvideo)
    if clip_state_dict is not None:
        params["image_vision_tower"] = import_clip_vision(
            clip_state_dict, cfg.clip)
    return params


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


def import_llama(state_dict: Mapping, cfg, extra_vocab: int = 0):
    """HF LlamaForCausalLM state_dict -> LlamaForCausalLM flax params."""
    sd = state_dict
    L = cfg.num_layers
    emb = t2j(sd["model.embed_tokens.weight"])
    head_key = "lm_head.weight" if "lm_head.weight" in sd \
        else "model.embed_tokens.weight"   # tied fallback
    head = jnp.swapaxes(t2j(sd[head_key]), 0, 1)
    target = cfg.vocab_size + extra_vocab
    if emb.shape[0] < target:
        n = target - emb.shape[0]
        emb = jnp.concatenate(
            [emb, jnp.tile(emb.mean(0, keepdims=True), (n, 1))], axis=0)
        head = jnp.concatenate(
            [head, jnp.tile(head.mean(1, keepdims=True), (1, n))], axis=1)

    layers = {
        "input_layernorm": {"scale": _stack_layers(
            sd, "model.layers.{i}.input_layernorm.weight", L)},
        "post_attention_layernorm": {"scale": _stack_layers(
            sd, "model.layers.{i}.post_attention_layernorm.weight", L)},
    }
    for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
        layers[name] = {"kernel": _stack_layers(
            sd, "model.layers.{i}.self_attn." + name + ".weight", L, True)}
    for name in ("gate_proj", "up_proj", "down_proj"):
        layers[name] = {"kernel": _stack_layers(
            sd, "model.layers.{i}.mlp." + name + ".weight", L, True)}
    return {
        "embed_tokens": {"embedding": emb},
        "layers": layers,
        "norm": {"scale": t2j(sd["model.norm.weight"])},
        "lm_head": {"kernel": head},
    }


def merge_lora_state_dict(state_dict: Mapping, lora_state_dict: Mapping,
                          r: int, alpha: int = 16) -> dict:
    """Merge a PEFT LoRA adapter into base torch weights BEFORE import
    (the reference's third checkpoint format: base + non_lora_trainables.bin
    + PEFT adapter merged via merge_and_unload,
    train_ds_with_videogptplus.py:146-210,319-343).

    PEFT keys look like `base_model.model.<path>.lora_A.weight` /
    `...lora_B.weight`; the merged delta is B @ A * (alpha / r)."""
    import torch
    sd = dict(state_dict)
    scale = alpha / r
    for k, a in lora_state_dict.items():
        if "lora_A" not in k:
            continue
        b_key = k.replace("lora_A", "lora_B")
        base_key = (k.replace("base_model.model.", "")
                     .replace(".lora_A.weight", ".weight")
                     .replace(".lora_A.default.weight", ".weight"))
        if base_key not in sd:
            continue
        b = lora_state_dict[b_key]
        delta = (b.float() @ a.float()) * scale
        sd[base_key] = sd[base_key].float() + delta
    return sd


def quantize_phi3_params(params: Mapping) -> dict:
    """f32/bf16 Phi-3 param tree -> weight-only int8 serving tree
    (kernel int8 + per-channel scale on the stacked projections and the
    lm_head; embeddings/norms stay float). Consumed by
    Phi3ForCausalLM(quant_int8=True)."""
    import jax
    from ..ops.quant import quantize_int8

    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    layers = out["model"]["layers"]
    for name in ("qkv_proj", "o_proj", "gate_up_proj", "down_proj"):
        w = layers[name]["kernel"]                      # [L, in, out]
        q, s = jax.vmap(quantize_int8)(w)
        layers[name] = {"kernel": q, "scale": s}
    q, s = quantize_int8(out["lm_head"]["kernel"])
    out["lm_head"] = {"kernel": q, "scale": s}
    return out


def quantize_phi3_params_int4(params: Mapping, group: int = 128) -> dict:
    """f32/bf16 Phi-3 param tree -> weight-only int4 serving tree (packed
    nibble kernel + per-(group, channel) scales on the stacked projections
    and the lm_head). Consumed by Phi3ForCausalLM(quant_int4=True)."""
    import jax
    from ..ops.quant import quantize_int4

    out = jax.tree_util.tree_map(lambda x: x, params)
    layers = out["model"]["layers"]
    for name in ("qkv_proj", "o_proj", "gate_up_proj", "down_proj"):
        w = layers[name]["kernel"]                      # [L, in, out]
        g = min(group, w.shape[1])
        q, s = jax.vmap(lambda x: quantize_int4(x, group=g))(w)
        layers[name] = {"kernel": q, "scale": s}
    w = out["lm_head"]["kernel"]
    q, s = quantize_int4(w, group=min(group, w.shape[0]))
    out["lm_head"] = {"kernel": q, "scale": s}
    return out


def quantize_videoglamm_llm(params: Mapping, mode: str = "int8") -> dict:
    """Composite param tree -> same tree with the LLM in int8/int4 serving
    form (consumed by VideoGLaMM(quant_llm_int8=True) /
    VideoGLaMM(quant_llm_int4=True))."""
    out = dict(params)
    quant = (quantize_phi3_params_int4 if mode == "int4"
             else quantize_phi3_params)
    out["llm"] = quant(params["llm"])
    return out
