"""Referring video segmentation inference (MeViS / Ref-YouTubeVOS /
Ref-DAVIS-17).

Reference entry points: /root/reference/VideoGLaMM/eval_mevis.py:35-209 and
eval_referdavis_infer.py. For each (video, referring expression): prompt the
model to segment the expression, save per-frame PNG masks in the benchmark
layout (MeViS/YTVOS: zip for the server; DAVIS: consumed by
eval_referdavis_metrics).

Expected meta JSON (MeViS-style):
  <data_root>/meta_expressions.json:
    {"videos": {vid: {"expressions": {eid: {"exp": str}},
                      "frames": [frame_name, ...]}}}
  frames at <data_root>/JPEGImages/<vid>/<frame>.jpg
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..constants import NUM_FRAMES
from ..data.conversation import ConvGenerator
from ..inference.generate import terminators_for
from .common import (add_model_args, decode_generation, load_model,
                     load_tokenizer, masks_to_original_size,
                     prepare_vision_inputs, tokenize_prompt)

REFER_PROMPT = "Please segment the {exp} in this video."


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--data_root", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--meta", default="meta_expressions.json")
    p.add_argument("--max_sam_frames", type=int, default=64,
                   help="masks are produced for ALL video frames up to this "
                        "cap (the LLM prefix still sees NUM_FRAMES samples)")
    args = p.parse_args(argv)

    from PIL import Image
    from ..data.preprocess import sample_frame_indices
    from ..data.video_reader import load_frame_dir
    from ..inference import GroundedInference

    tokenizer = load_tokenizer(args.tokenizer or args.checkpoint)
    model, params = load_model(args)
    pipe = GroundedInference(model, params,
                             max_new_tokens=args.max_new_tokens,
                             eos_id=terminators_for(model.cfg.llm_type, tokenizer),
                             draft_k=args.draft_k)
    conv_gen = ConvGenerator(model.cfg.llm_type)

    meta = json.load(open(os.path.join(args.data_root, args.meta)))["videos"]
    for vid, vinfo in sorted(meta.items()):
        fdir = os.path.join(args.data_root, "JPEGImages", vid)
        frame_names = vinfo.get("frames") or sorted(
            os.path.splitext(f)[0] for f in os.listdir(fdir))
        all_frames = load_frame_dir(fdir)
        idx = sample_frame_indices(len(all_frames), NUM_FRAMES)
        frames = [all_frames[i] for i in idx]
        # pixel-decoder frames: the whole video (capped), not the samples
        if len(all_frames) > args.max_sam_frames:
            sam_idx = sample_frame_indices(len(all_frames),
                                           args.max_sam_frames)
        else:
            sam_idx = list(range(len(all_frames)))
        sam_frames = [all_frames[i] for i in sam_idx]

        for eid, einfo in sorted(vinfo["expressions"].items()):
            out_dir = os.path.join(args.save_dir, vid, eid)
            if os.path.isdir(out_dir) and len(os.listdir(out_dir)):
                continue
            try:
                prompt = conv_gen.apply_for_chat(
                    REFER_PROMPT.format(exp=einfo["exp"]), media="video")
                input_ids, lens = tokenize_prompt(prompt, tokenizer,
                                                  args.max_new_tokens)
                f, c, s, orig_hw = prepare_vision_inputs(
                    frames, pipe.model.cfg, sam_frames=sam_frames)
                res = pipe(f, c, s, input_ids, lens,
                           use_video_branch=args.use_sam2_video_branch)
                masks = masks_to_original_size(
                    np.asarray(res.pred_masks[0]), orig_hw)
                valid = np.asarray(res.seg_valid[0])
                # first [SEG] answers the referring expression
                tube = masks[valid][0] if valid.any() else np.zeros(
                    (len(sam_frames),) + tuple(orig_hw), bool)
                os.makedirs(out_dir, exist_ok=True)
                # one PNG per listed frame (official MeViS/YTVOS/DAVIS
                # protocol): frames beyond the compute cap reuse the
                # nearest computed mask
                sam_arr = np.asarray(sam_idx)
                for fi, name in enumerate(frame_names):
                    t = int(np.abs(sam_arr - fi).argmin())
                    Image.fromarray((tube[t] * 255).astype(np.uint8)).save(
                        os.path.join(out_dir, f"{name}.png"))
                print(f"[ok] {vid}/{eid}")
            except Exception as e:
                print(f"[skip] {vid}/{eid}: {e}")


if __name__ == "__main__":
    main()
