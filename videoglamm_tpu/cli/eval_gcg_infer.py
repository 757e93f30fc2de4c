"""GCG (Grounded Conversation Generation) inference over a validation set.

Reference entry point: /root/reference/VideoGLaMM/eval_gcg_infer.py:55-227.
For every video: fixed GCG question -> caption with <p>...</p> + [SEG] ->
per-object mask tubes; saves `res.json` + GT/pred mask PNGs per video in the
reference layout (consumed by eval_gcg_metrics).

Dataset layout expected (one dir per video):
  <data_root>/<video_id>/frames/*.jpg     video frames
  <data_root>/<video_id>/gt.json          {"caption": ..., "phrases": [...]}
  <data_root>/<video_id>/gt_masks/<obj>/<frame>.png   binary GT masks
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..constants import NUM_FRAMES
from ..data.conversation import ConvGenerator
from ..inference.generate import terminators_for
from ..evals.postprocess import clean_caption, extract_phrases, \
    remove_small_blobs
from .common import (add_model_args, decode_generation, load_model,
                     load_tokenizer, masks_to_original_size,
                     prepare_vision_inputs, tokenize_prompt)

GCG_PROMPT = ("Could you please give me a detailed description of the "
              "video? Please respond with interleaved segmentation masks "
              "for the corresponding parts of the answer.")


def list_videos(data_root):
    return sorted(d for d in os.listdir(data_root)
                  if os.path.isdir(os.path.join(data_root, d)))


def run_video(pipe, conv_gen, tokenizer, frames, max_new, use_video_branch):
    prompt = conv_gen.apply_for_chat(GCG_PROMPT, media="video")
    input_ids, lens = tokenize_prompt(prompt, tokenizer, max_new)
    f, c, s, orig_hw = prepare_vision_inputs(frames, pipe.model.cfg)
    res = pipe(f, c, s, input_ids, lens, use_video_branch=use_video_branch)
    text = decode_generation(res.tokens[0], tokenizer)
    masks = masks_to_original_size(np.asarray(res.pred_masks[0]), orig_hw)
    valid = np.asarray(res.seg_valid[0])
    return text, masks[valid]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--data_root", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--min_blob", type=int, default=20)
    args = p.parse_args(argv)

    from PIL import Image
    from ..data.video_reader import load_frame_dir
    from ..inference import GroundedInference

    tokenizer = load_tokenizer(args.tokenizer or args.checkpoint)
    model, params = load_model(args)
    pipe = GroundedInference(model, params,
                             max_new_tokens=args.max_new_tokens,
                             eos_id=terminators_for(model.cfg.llm_type, tokenizer),
                             draft_k=args.draft_k)
    conv_gen = ConvGenerator(model.cfg.llm_type)

    for vid in list_videos(args.data_root):
        out_dir = os.path.join(args.save_dir, vid)
        if os.path.exists(os.path.join(out_dir, "res.json")):
            continue   # resumable (reference eval_gcg_infer.py:119-123)
        try:
            vdir = os.path.join(args.data_root, vid)
            frames = load_frame_dir(os.path.join(vdir, "frames"))
            from ..data.preprocess import sample_frame_indices
            idx = sample_frame_indices(len(frames), NUM_FRAMES)
            frames = [frames[i] for i in idx]

            text, masks = run_video(pipe, conv_gen, tokenizer, frames,
                                    args.max_new_tokens,
                                    args.use_sam2_video_branch)
            masks = np.stack([remove_small_blobs(m, args.min_blob)
                              for m in masks]) if len(masks) else masks

            os.makedirs(out_dir, exist_ok=True)
            gt_path = os.path.join(vdir, "gt.json")
            gt = json.load(open(gt_path)) if os.path.exists(gt_path) else {}
            res = {
                "gt_text": gt.get("caption", ""),
                "gt_phrases": gt.get("phrases", []),
                "pred_text": text,
                "pred_text_cleaned": clean_caption(text),
                "pred_phrases": extract_phrases(text),
            }
            json.dump(res, open(os.path.join(out_dir, "res.json"), "w"))
            for obj, tube in enumerate(masks):
                odir = os.path.join(out_dir, "pred_masks", str(obj))
                os.makedirs(odir, exist_ok=True)
                for t, m in enumerate(tube):
                    Image.fromarray((m * 255).astype(np.uint8)).save(
                        os.path.join(odir, f"{t:05d}.png"))
            print(f"[ok] {vid}: {len(masks)} objects")
        except Exception as e:   # per-sample fault tolerance
            print(f"[skip] {vid}: {e}")   # (reference :224-227)


if __name__ == "__main__":
    main()
