"""Convert reference PyTorch checkpoints into a single Orbax params tree.

Covers the reference's checkpoint composition (SURVEY §5.4 /
train_ds_with_videogptplus.py:146-210, chat.py:280-325):
  HF export dir (merged model)  --hf_export DIR
  (optional) PEFT LoRA adapter  --lora_adapter FILE --lora_r R
  InternVideo2 tower ckpt       --internvideo_ckpt FILE
  CLIP vision tower ckpt        --clip_ckpt FILE_OR_HF_DIR
  -> --out ORBAX_DIR  (load with io.load_params / cli --checkpoint)

Usage:
  python -m videoglamm_tpu.cli.convert_checkpoint --hf_export EXP \
      --internvideo_ckpt iv2.pt --clip_ckpt clip.bin --out ./params
"""
from __future__ import annotations

import argparse
import os


def load_torch_dir(path: str) -> dict:
    import torch
    sd = {}
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if (f.startswith("pytorch_model") and f.endswith(".bin")) \
                    or f.endswith(".pt") or f == "non_lora_trainables.bin":
                sd.update(torch.load(os.path.join(path, f),
                                     map_location="cpu",
                                     weights_only=False))
        if not sd:
            try:
                from safetensors.torch import load_file
                for f in sorted(os.listdir(path)):
                    if f.endswith(".safetensors"):
                        sd.update(load_file(os.path.join(path, f)))
            except ImportError:
                pass
    else:
        raw = torch.load(path, map_location="cpu", weights_only=False)
        sd = raw.get("model", raw.get("module", raw)) \
            if isinstance(raw, dict) else raw
    return sd


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--hf_export", required=True,
                   help="reference VideoGLaMM HF-export dir")
    p.add_argument("--lora_adapter", default=None,
                   help="optional un-merged PEFT adapter state dict")
    p.add_argument("--lora_r", type=int, default=8)
    p.add_argument("--lora_alpha", type=int, default=16)
    p.add_argument("--internvideo_ckpt", default=None)
    p.add_argument("--clip_ckpt", default=None)
    p.add_argument("--int8_llm", action="store_true",
                   help="also emit the weight-only int8 serving tree")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from ..config import VideoGLaMMConfig
    from ..io import (compose_videoglamm_params, merge_lora_state_dict,
                      quantize_videoglamm_llm, save_params)

    cfg = VideoGLaMMConfig.flagship()
    sd = load_torch_dir(args.hf_export)
    print(f"loaded {len(sd)} tensors from {args.hf_export}")

    if args.lora_adapter:
        import torch
        lora_sd = torch.load(args.lora_adapter, map_location="cpu",
                             weights_only=False)
        sd = merge_lora_state_dict(sd, lora_sd, r=args.lora_r,
                                   alpha=args.lora_alpha)
        print(f"merged LoRA adapter ({len(lora_sd)} tensors)")

    iv_sd = load_torch_dir(args.internvideo_ckpt) \
        if args.internvideo_ckpt else None
    clip_sd = None
    if args.clip_ckpt:
        if os.path.isdir(args.clip_ckpt) and os.path.exists(
                os.path.join(args.clip_ckpt, "config.json")):
            from transformers import CLIPVisionModel
            clip_sd = CLIPVisionModel.from_pretrained(
                args.clip_ckpt).state_dict()
        else:
            clip_sd = load_torch_dir(args.clip_ckpt)

    params = compose_videoglamm_params(sd, cfg, iv_sd, clip_sd)
    if args.int8_llm:
        params = quantize_videoglamm_llm(params)
    save_params(args.out, params)
    print(f"saved orbax params -> {args.out}")


if __name__ == "__main__":
    main()
