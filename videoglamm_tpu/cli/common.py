"""Shared CLI plumbing: model/checkpoint/tokenizer loading, vision
preprocessing to model inputs, mask postprocessing to original resolution.

Replaces the per-script boilerplate of the reference entry points
(/root/reference/VideoGLaMM/chat.py:101-360, eval_gcg_infer.py:31-123).
"""
from __future__ import annotations

import argparse
import os
from typing import List, Optional, Tuple

import numpy as np

from ..config import VideoGLaMMConfig
from ..constants import SEG_TOKEN


def add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--checkpoint", required=True,
                   help="orbax params dir, or a reference HF-export dir")
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer dir (defaults to --checkpoint)")
    p.add_argument("--internvideo_ckpt", default=None,
                   help="InternVideo2 torch checkpoint (HF-export loads only)")
    p.add_argument("--clip_ckpt", default=None,
                   help="CLIP vision torch checkpoint dir")
    p.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--max_new_tokens", type=int, default=512)
    p.add_argument("--draft_k", type=int, default=0,
                   help="n-gram speculative decoding depth (>=2 enables; "
                        "greedy outputs are identical, repetitive grounded "
                        "captions decode faster)")
    p.add_argument("--use_sam2_video_branch", action="store_true")
    p.add_argument("--quant", default="none", choices=["none", "int8", "int4"],
                   help="weight-only quantized LLM serving (int8 is parity-"
                        "gated, tests/test_int8_parity.py; default bf16/f32 "
                        "for bit-faithful eval)")
    p.add_argument("--kv_cache", default="bf16", choices=["bf16", "int8"],
                   help="KV-cache storage (int8 halves decode cache traffic "
                        "and residency; parity-gated)")
    return p


def load_tokenizer(path: str):
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(path, use_fast=False)
    if SEG_TOKEN not in tok.get_vocab():
        tok.add_tokens(SEG_TOKEN)
    return tok


def load_model(args, cfg: Optional[VideoGLaMMConfig] = None):
    """Returns (model, params). Accepts an orbax params directory or a
    reference torch HF-export directory (pytorch_model*.bin)."""
    import jax.numpy as jnp
    from ..models import VideoGLaMM

    cfg = cfg or VideoGLaMMConfig.flagship()
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    quant = getattr(args, "quant", "none")
    model = VideoGLaMM(cfg, dtype=dtype,
                       quant_llm_int8=quant == "int8",
                       quant_llm_int4=quant == "int4",
                       quant_kv_int8=getattr(args, "kv_cache",
                                             "bf16") == "int8")

    ckpt = args.checkpoint
    if os.path.exists(os.path.join(ckpt, "_METADATA")) or any(
            f.endswith(".zarray") or f == "manifest.ocdbt"
            for f in os.listdir(ckpt)) or os.path.isdir(
            os.path.join(ckpt, "ocdbt.process_0")):
        from ..io import load_params
        params = {"params": load_params(ckpt)}
    else:
        import torch
        from ..io import compose_videoglamm_params
        sd = {}
        for f in sorted(os.listdir(ckpt)):
            if f.startswith("pytorch_model") and f.endswith(".bin"):
                sd.update(torch.load(os.path.join(ckpt, f),
                                     map_location="cpu"))
        iv_sd = None
        if args.internvideo_ckpt:
            raw = torch.load(args.internvideo_ckpt, map_location="cpu")
            iv_sd = raw.get("model", raw.get("module", raw))
        clip_sd = None
        if args.clip_ckpt:
            clip_sd = torch.load(args.clip_ckpt, map_location="cpu")
        params = {"params": compose_videoglamm_params(sd, cfg, iv_sd,
                                                      clip_sd)}
    if quant in ("int8", "int4"):
        from ..io.import_torch import quantize_videoglamm_llm
        params = {"params": quantize_videoglamm_llm(params["params"],
                                                    mode=quant)}
    return model, params


def prepare_vision_inputs(frames: List[np.ndarray], cfg: VideoGLaMMConfig,
                          num_sam_frames: Optional[int] = None,
                          sam_frames: Optional[List[np.ndarray]] = None,
                          device: bool = True):
    """Raw RGB frames -> (frames, context_images, frames_sam, orig_hw)
    batched [1, ...] model inputs (reference preprocess_vision,
    chat.py:402-470). `sam_frames` decouples the pixel-decoder frames from
    the encoder frames (eval propagates masks over ALL frames while the LLM
    prefix sees NUM_FRAMES sampled ones — reference eval_mevis.py).

    device=True (default): resize/normalize runs fused ON-DEVICE
    (ops/preprocess.py) — the host ships one uint8 tensor per clip instead
    of three float streams; device=False keeps the PIL host path (the
    reference-parity fallback, within ~1/255/std of the device path)."""
    import jax.numpy as jnp
    from ..data.preprocess import (preprocess_clip, preprocess_internvideo,
                                   preprocess_sam2, sample_frame_indices)

    orig_hw = np.asarray(frames[0]).shape[:2]
    if sam_frames is None:
        sam_frames = frames
        if num_sam_frames is not None and num_sam_frames != len(frames):
            idx = sample_frame_indices(len(frames), num_sam_frames)
            sam_frames = [frames[i] for i in idx]

    uniform = all(np.asarray(f).shape == (orig_hw + (3,))
                  and np.asarray(f).dtype == np.uint8 for f in frames)
    if device and uniform:
        from ..ops.preprocess import (preprocess_clip_stream,
                                      preprocess_iv_stream,
                                      preprocess_sam_stream)
        x = jnp.asarray(np.stack([np.asarray(f) for f in frames]))
        enc = preprocess_iv_stream(x, cfg.internvideo.image_size)
        ctx = preprocess_clip_stream(x, cfg.clip.image_size)
        xs = jnp.asarray(np.stack([np.asarray(f) for f in sam_frames]))
        sam = preprocess_sam_stream(xs, cfg.sam2.image_size)
        return enc[None], ctx[None], sam[None], tuple(orig_hw)

    enc = preprocess_internvideo(frames, cfg.internvideo.image_size)
    ctx = preprocess_clip(frames, cfg.clip.image_size)
    sam = preprocess_sam2(sam_frames, cfg.sam2.image_size)
    return (jnp.asarray(enc)[None], jnp.asarray(ctx)[None],
            jnp.asarray(sam)[None], tuple(orig_hw))


def tokenize_prompt(prompt: str, tokenizer, max_len: int = 512):
    import jax.numpy as jnp
    from ..data.conversation import tokenizer_image_token
    ids = tokenizer_image_token(prompt, tokenizer)[:max_len]
    n = len(ids)
    out = np.zeros((1, max_len), np.int32)
    out[0, :n] = ids
    return jnp.asarray(out), jnp.asarray([n], np.int32)


from ..evals.postprocess import masks_to_original_size  # noqa: F401


def decode_generation(tokens: np.ndarray, tokenizer) -> str:
    ids = [int(t) for t in np.asarray(tokens).reshape(-1) if t > 0]
    text = tokenizer.decode(ids, skip_special_tokens=False)
    return text.replace("\n", "").replace("  ", " ").strip()
