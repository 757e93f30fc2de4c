"""Spatio-temporal video grounding evaluation (VidSTG / HCSTVG).

Reference entry point: /root/reference/VideoGLaMM/eval_grounding.py
(:20-72 metric defs, :280-360 accumulation). Per question: the model segments
the referred subject; predicted masks become boxes (masks_to_boxes); metrics
are tIoU (temporal) and vIoU / vIoU@{0.3,0.5} plus gt_vIoU (spatial IoU over
the GT span only), averaged per question type.

Input: an annotations JSON
  [{"vid": ..., "qtype": "declarative"|"interrogative", "question": str,
    "frames_dir": path, "gt_sted": [t0, t1),
    "gt_boxes": {frame_idx: [x0, y0, x1, y1]}}, ...]
"""
from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

import numpy as np

from ..constants import NUM_FRAMES
from ..data.conversation import ConvGenerator
from ..inference.generate import terminators_for
from ..evals.metrics import masks_to_boxes, np_box_iou, temporal_iou
from .common import (add_model_args, load_model, load_tokenizer,
                     masks_to_original_size, prepare_vision_inputs,
                     tokenize_prompt)

IOU_THRESHOLDS = (0.3, 0.5)


def eval_question(pred_boxes, pred_sted, gt_boxes, gt_sted, frame_ids):
    out = {}
    tiou, union_f, inter_f = temporal_iou(gt_sted, pred_sted, frame_ids)
    out["tiou"] = tiou
    viou = 0.0
    for f in inter_f:
        if f in pred_boxes and f in gt_boxes:
            viou += float(np_box_iou(np.asarray(pred_boxes[f])[None],
                                     np.asarray(gt_boxes[f])[None])[0, 0])
    viou = viou / max(len(union_f), 1)
    out["viou"] = viou
    for th in IOU_THRESHOLDS:
        out[f"viou@{th}"] = float(viou >= th)
    # gt_vIoU: spatial IoU over GT-span frames only
    gt_frames = [f for f in frame_ids if gt_sted[0] <= f < gt_sted[1]]
    gv = 0.0
    for f in gt_frames:
        if f in pred_boxes and f in gt_boxes:
            gv += float(np_box_iou(np.asarray(pred_boxes[f])[None],
                                   np.asarray(gt_boxes[f])[None])[0, 0])
    gv = gv / max(len(gt_frames), 1)
    out["gt_viou"] = gv
    for th in IOU_THRESHOLDS:
        out[f"gt_viou@{th}"] = float(gv >= th)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--annotations", required=True)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

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

    anns = json.load(open(args.annotations))
    results = {}
    for i, ann in enumerate(anns):
        try:
            frames = load_frame_dir(ann["frames_dir"])
            idx = sample_frame_indices(len(frames), NUM_FRAMES)
            sampled = [frames[k] for k in idx]
            prompt = conv_gen.apply_for_chat(
                f"Please segment the subject of: {ann['question']}",
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

            pred_boxes, present = {}, []
            for t, fi in enumerate(idx):
                if tube[t].any():
                    pred_boxes[int(fi)] = masks_to_boxes(
                        tube[t][None])[0].tolist()
                    present.append(int(fi))
            pred_sted = ((min(present), max(present) + 1)
                         if present else (0, 0))
            gt_boxes = {int(k): v for k, v in ann["gt_boxes"].items()}
            m = eval_question(pred_boxes, pred_sted, gt_boxes,
                              tuple(ann["gt_sted"]), [int(k) for k in idx])
            m["qtype"] = ann.get("qtype", "all")
            results[str(i)] = m
        except Exception as e:
            print(f"[skip] {i}: {e}")

    # summarize per qtype (reference summarize_metrics, :22-53)
    agg = defaultdict(lambda: defaultdict(float))
    counts = defaultdict(int)
    for r in results.values():
        q = r["qtype"]
        counts[q] += 1
        for k, v in r.items():
            if k != "qtype":
                agg[q][k] += v
    summary = {q: {k: v / counts[q] for k, v in m.items()}
               for q, m in agg.items()}
    print(json.dumps(summary, indent=2))
    if args.out:
        json.dump({"summary": summary, "per_question": results},
                  open(args.out, "w"), indent=2)
    return summary


if __name__ == "__main__":
    main()
