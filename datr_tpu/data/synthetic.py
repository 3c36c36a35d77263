"""Synthetic COCO-style datasets: colored rectangles on noise backgrounds.

The test/bench stand-in for Cityscapes/Foggy (the reference's --debug smoke
runs need real data; we can generate ours). Learnable: each class has a fixed
color, so a few steps of training must drive the loss down, and eval AP on
train images of an overfit model approaches 1."""

from __future__ import annotations

import random
from typing import Optional

import numpy as np
from PIL import Image, ImageDraw

CLASS_COLORS = [
    (220, 40, 40), (40, 220, 40), (40, 40, 220), (220, 220, 40),
    (220, 40, 220), (40, 220, 220), (240, 140, 20), (140, 20, 240),
]


class SyntheticDetectionDataset:
    """API-compatible with CocoDetectionDataset (load(i) -> (img, target))."""

    def __init__(self, n_images=16, hw=(240, 320), num_classes=4,
                 max_objects=4, seed=0, fog: float = 0.0):
        self.n = n_images
        self.hw = hw
        self.num_classes = num_classes
        self.max_objects = max_objects
        self.seed = seed
        self.fog = fog
        # mimic a CocoIndex for category discovery
        self.categories = list(range(1, num_classes + 1))

    def __len__(self):
        return self.n

    def load(self, i: int):
        rng = random.Random(self.seed * 100003 + i)
        h, w = self.hw
        npr = np.random.default_rng(self.seed * 7 + i)
        bg = npr.integers(80, 120, (h, w, 3), dtype=np.uint8)
        img = Image.fromarray(bg, "RGB")
        draw = ImageDraw.Draw(img)
        n_obj = rng.randint(1, self.max_objects)
        boxes, labels = [], []
        for _ in range(n_obj):
            bw = rng.randint(w // 10, w // 3)
            bh = rng.randint(h // 10, h // 3)
            x0 = rng.randint(0, w - bw - 1)
            y0 = rng.randint(0, h - bh - 1)
            cls = rng.randint(1, self.num_classes)
            draw.rectangle(
                [x0, y0, x0 + bw, y0 + bh], fill=CLASS_COLORS[cls - 1]
            )
            boxes.append([x0, y0, x0 + bw, y0 + bh])
            labels.append(cls)
        if self.fog > 0:  # "target domain": washed-out low-contrast variant
            arr = np.asarray(img, np.float32)
            arr = arr * (1 - self.fog) + 255.0 * self.fog
            img = Image.fromarray(arr.astype(np.uint8), "RGB")
        target = {
            "boxes": np.asarray(boxes, np.float32),
            "labels": np.asarray(labels, np.int64),
            "image_id": i,
            "orig_size": np.array([h, w], np.int64),
            "size": np.array([h, w], np.int64),
        }
        return img, target


def synthetic_da_pair(n_images=16, hw=(240, 320), num_classes=4, seed=0):
    from .coco import DAPairedDataset

    src = SyntheticDetectionDataset(n_images, hw, num_classes, seed=seed)
    tgt = SyntheticDetectionDataset(n_images, hw, num_classes, seed=seed + 1,
                                    fog=0.35)
    return DAPairedDataset(src, tgt, strong_aug=True)
