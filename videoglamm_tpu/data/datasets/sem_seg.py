"""Semantic segmentation dataset (ADE20K / COCO-Stuff style).

Behavioral contract from the reference SemSegDataset
(/root/reference/VideoGLaMM/utils/sem_seg_dataset.py:121-300): per-pixel
class-label PNGs; a few classes present in the image are sampled, each
becoming one segment-question conversation with a binary mask.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional

import numpy as np

from .templates import ANSWER_LIST, IMAGE_QUESTION_LIST


class SemSegDataset:
    def __init__(self, image_root: str, label_root: str,
                 class_names: List[str], num_classes_per_sample: int = 3,
                 label_offset: int = 0, ignore_label: int = 255,
                 seed: int = 0):
        """class_names[i] names label value i + label_offset (ADE20K uses
        offset 1: label 0 = unlabeled)."""
        self.images = sorted(glob.glob(os.path.join(image_root, "*.jpg")))
        self.label_root = label_root
        self.class_names = class_names
        self.n_per_sample = num_classes_per_sample
        self.label_offset = label_offset
        self.ignore_label = ignore_label
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx) -> Dict:
        from PIL import Image
        img_path = self.images[idx]
        img = np.asarray(Image.open(img_path).convert("RGB"))
        stem = os.path.splitext(os.path.basename(img_path))[0]
        label = np.asarray(Image.open(
            os.path.join(self.label_root, stem + ".png")))

        present = [int(v) for v in np.unique(label)
                   if int(v) != self.ignore_label
                   and 0 <= int(v) - self.label_offset < len(self.class_names)]
        if not present:
            present = [self.label_offset]
        chosen = self.rng.choice(
            present, min(self.n_per_sample, len(present)), replace=False)

        sources, masks = [], []
        for v in chosen:
            name = self.class_names[v - self.label_offset]
            q = self.rng.choice(IMAGE_QUESTION_LIST).format(
                class_name=name.lower())
            a = self.rng.choice(ANSWER_LIST)
            sources.append([{"from": "human", "value": q},
                            {"from": "gpt", "value": a}])
            masks.append((label == v).astype(np.float32)[None, None])
        return dict(frames=[img], sources=sources, masks=masks)


def load_ade20k_classes(path: Optional[str] = None) -> List[str]:
    """Load the ADE20K class list (the reference vendors ade20k_classes.json;
    point this at the same file)."""
    if path is None:
        raise ValueError("provide the ade20k_classes.json path")
    return json.load(open(path))
