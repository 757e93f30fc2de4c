"""ActivityNet-Entities grounding inference (long-video).

Reference entry point: /root/reference/VideoGLaMM/eval_anet_entities_infer.py
(309 LoC): per (video, noun-phrase annotation) the model grounds the phrase;
long clips are handled by segment-window frame sampling around each
annotated timestamp; outputs per-phrase mask PNGs + boxes JSON.

Two input modes:
- --annotations JSON: [{"vid", "frames_dir", "phrase", "segment":
  [s_frac, e_frac]}] (pre-extracted frame dirs), or entries with
  {"video": path, "timestamps": [s_sec, e_sec]} (raw videos, fps-scaled
  windows like the reference's load_frames).
- --official_reference + --official_split (+ --videos_root): the official
  anet_entities_cleaned_class_thresh50_trainval.json / split-ids files,
  converted in-process by data/anet_entities.py (reference parsing at
  eval_anet_entities_infer.py:86-146).
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..constants import NUM_FRAMES
from ..data.conversation import ConvGenerator
from ..inference.generate import terminators_for
from ..evals.metrics import masks_to_boxes
from .common import (add_model_args, load_model, load_tokenizer,
                     masks_to_original_size, prepare_vision_inputs,
                     tokenize_prompt)


def window_indices(n_frames: int, segment, num: int) -> np.ndarray:
    """Sample frames inside the annotated segment window (reference
    long-clip sampling, eval_anet_entities_infer.py)."""
    s = int(segment[0] * (n_frames - 1))
    e = max(int(segment[1] * (n_frames - 1)), s + 1)
    return np.linspace(s, e, num).astype(int)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--annotations", default=None)
    p.add_argument("--official_reference", default=None,
                   help="anet_entities_cleaned_class_thresh50_trainval.json")
    p.add_argument("--official_split", default=None,
                   help="split_ids_anet_entities.json")
    p.add_argument("--split", default="validation")
    p.add_argument("--videos_root", default=None,
                   help="activitynet videos root (searched with the "
                        "reference's subdir/extension order)")
    p.add_argument("--save_dir", required=True)
    args = p.parse_args(argv)
    assert args.annotations or (args.official_reference
                                and args.official_split), \
        "pass --annotations or the official-format file pair"

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

    if args.annotations:
        anns = json.load(open(args.annotations))
    else:
        from ..data.anet_entities import convert_official_annotations
        anns = convert_official_annotations(
            args.official_reference, args.official_split,
            videos_root=args.videos_root, split=args.split,
            skip_missing_videos=True)
        print(f"[convert] {len(anns)} grounded phrases from the official "
              f"{args.split} split")
    results = []
    for i, ann in enumerate(anns):
        try:
            if ann.get("video"):
                from ..data.anet_entities import segment_frame_indices
                from ..data.video_reader import VideoReader
                vr = VideoReader(ann["video"])
                idx = segment_frame_indices(len(vr), vr.fps or 25.0,
                                            ann["timestamps"], NUM_FRAMES)
                sampled = list(vr.get_batch([int(k) for k in idx]))
                vr.close()
            else:
                frames = load_frame_dir(ann["frames_dir"])
                idx = window_indices(len(frames),
                                     ann.get("segment", [0.0, 1.0]),
                                     NUM_FRAMES)
                sampled = [frames[k] for k in idx]
            prompt = conv_gen.apply_for_chat(
                f"Please segment {ann['phrase']} in this video.",
                media="video")
            input_ids, lens = tokenize_prompt(prompt, tokenizer,
                                              args.max_new_tokens)
            f, c, s, orig_hw = prepare_vision_inputs(sampled, pipe.model.cfg)
            res = pipe(f, c, s, input_ids, lens,
                       use_video_branch=args.use_sam2_video_branch)
            masks = masks_to_original_size(np.asarray(res.pred_masks[0]),
                                           orig_hw)
            valid = np.asarray(res.seg_valid[0])
            tube = masks[valid][0] if valid.any() else np.zeros(
                (len(sampled),) + tuple(orig_hw), bool)

            out_dir = os.path.join(args.save_dir, f"{i:06d}")
            os.makedirs(out_dir, exist_ok=True)
            boxes = {}
            for t, fi in enumerate(idx):
                Image.fromarray((tube[t] * 255).astype(np.uint8)).save(
                    os.path.join(out_dir, f"{int(fi):05d}.png"))
                if tube[t].any():
                    boxes[int(fi)] = masks_to_boxes(
                        tube[t][None])[0].tolist()
            results.append({
                "index": i, "phrase": ann["phrase"], "boxes": boxes,
                **{k: ann[k] for k in ("vid", "seg", "gt_box", "gt_frame")
                   if k in ann}})
            print(f"[ok] {i}")
        except Exception as e:
            print(f"[skip] {i}: {e}")
    json.dump(results, open(os.path.join(args.save_dir, "results.json"),
                            "w"))


if __name__ == "__main__":
    main()
