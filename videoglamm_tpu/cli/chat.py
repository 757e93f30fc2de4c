"""Interactive grounded video/image chat.

Reference entry point: /root/reference/VideoGLaMM/chat.py:26-597. Loads a
video (native FFmpeg decoder or frame directory) or an image, runs the
grounded-inference pipeline, prints the caption, and writes per-[SEG] mask
overlays.

Usage:
  python -m videoglamm_tpu.cli.chat --checkpoint CKPT --tokenizer TOK \
      --media path/to/video.mp4 --prompt "Segment the dog." \
      --out_dir ./chat_out [--use_sam2_video_branch]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import VideoGLaMMConfig
from ..constants import NUM_FRAMES
from ..data.conversation import ConvGenerator
from ..evals.postprocess import clean_caption, extract_phrases
from .common import (add_model_args, decode_generation, load_model,
                     load_tokenizer, masks_to_original_size,
                     prepare_vision_inputs, tokenize_prompt)

PALETTE = [(255, 80, 80), (80, 200, 120), (90, 140, 255), (250, 200, 60)]


def overlay_masks(frame: np.ndarray, masks: np.ndarray) -> np.ndarray:
    """frame [H,W,3] uint8; masks [n_obj, H, W] bool -> overlay image."""
    out = frame.astype(np.float32)
    for i, m in enumerate(masks):
        color = np.asarray(PALETTE[i % len(PALETTE)], np.float32)
        out[m] = 0.5 * out[m] + 0.5 * color
    return out.astype(np.uint8)


def run_once(pipe, conv_gen, tokenizer, frames, prompt_text, media,
             use_video_branch, max_text_len=512):
    prompt = conv_gen.apply_for_chat(prompt_text, media=media)
    input_ids, lens = tokenize_prompt(prompt, tokenizer, max_text_len)
    f, c, s, orig_hw = prepare_vision_inputs(frames, pipe.model.cfg)
    res = pipe(f, c, s, input_ids, lens, use_video_branch=use_video_branch)
    text = decode_generation(res.tokens[0], tokenizer)
    masks = masks_to_original_size(np.asarray(res.pred_masks[0]), orig_hw)
    valid = np.asarray(res.seg_valid[0])
    return text, masks[valid], res


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--media", required=True,
                   help="video file, frame directory, or image")
    p.add_argument("--prompt", default=None,
                   help="one-shot prompt (omit for interactive loop)")
    p.add_argument("--out_dir", default="./chat_out")
    args = p.parse_args(argv)

    from ..data.video_reader import load_video_frames
    from ..inference import GroundedInference

    tokenizer = load_tokenizer(args.tokenizer or args.checkpoint)
    model, params = load_model(args)
    from ..inference.generate import terminators_for
    eos_id = terminators_for(model.cfg.llm_type, tokenizer)
    pipe = GroundedInference(model, params,
                             max_new_tokens=args.max_new_tokens,
                             eos_id=eos_id,
                             draft_k=args.draft_k)
    conv_gen = ConvGenerator(model.cfg.llm_type)

    is_image = args.media.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
    if is_image:
        from PIL import Image
        img = np.asarray(Image.open(args.media).convert("RGB"))
        frames = [img] * NUM_FRAMES
        media = "image"
    else:
        frames = load_video_frames(args.media, NUM_FRAMES)
        media = "video"

    os.makedirs(args.out_dir, exist_ok=True)

    def serve(prompt_text, turn):
        text, masks, _ = run_once(pipe, conv_gen, tokenizer, frames,
                                  prompt_text, media,
                                  args.use_sam2_video_branch,
                                  max_text_len=args.max_new_tokens)
        print(f"\n{clean_caption(text)}")
        phrases = extract_phrases(text)
        if phrases:
            print("grounded phrases:", phrases)
        from PIL import Image
        T = masks.shape[1] if masks.ndim == 3 else 0
        for t in range(min(len(frames), masks.shape[1])):
            ov = overlay_masks(frames[t], masks[:, t])
            Image.fromarray(ov).save(
                os.path.join(args.out_dir, f"turn{turn}_frame{t:03d}.png"))
        print(f"overlays -> {args.out_dir}")

    if args.prompt is not None:
        serve(args.prompt, 0)
        return
    turn = 0
    while True:
        try:
            prompt_text = input("\nUSER: ").strip()
        except EOFError:
            break
        if not prompt_text or prompt_text in {"exit", "quit"}:
            break
        serve(prompt_text, turn)
        turn += 1


if __name__ == "__main__":
    main()
