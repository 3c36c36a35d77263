"""Detection visualizers.

Capability match for the reference's util/visualizer.py (COCOVisualizer :58),
util/vis_utils.py, and the pseudo-label debug renderer
(self_training_utils.py:show_pesudo_label_with_gt :196-214). PIL-based — no
matplotlib dependency in the hot path.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

from .boxes import box_cxcywh_to_xyxy

PALETTE = [
    (255, 99, 71), (65, 105, 225), (60, 179, 113), (238, 130, 238),
    (255, 165, 0), (106, 90, 205), (64, 224, 208), (218, 165, 32),
    (199, 21, 133), (0, 191, 255), (154, 205, 50), (255, 20, 147),
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def denormalize_image(arr: np.ndarray) -> Image.Image:
    """[H, W, 3] normalized float -> PIL (inverse of the data pipeline)."""
    img = (arr * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    return Image.fromarray(np.clip(img, 0, 255).astype(np.uint8), "RGB")


def draw_boxes(
    img: Image.Image,
    boxes_xyxy: np.ndarray,
    labels: Optional[np.ndarray] = None,
    scores: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
    width: int = 2,
) -> Image.Image:
    out = img.copy()
    d = ImageDraw.Draw(out)
    for i, b in enumerate(np.asarray(boxes_xyxy)):
        lab = int(labels[i]) if labels is not None else 0
        color = PALETTE[lab % len(PALETTE)]
        d.rectangle([float(b[0]), float(b[1]), float(b[2]), float(b[3])],
                    outline=color, width=width)
        txt = []
        if class_names and 0 <= lab < len(class_names):
            txt.append(class_names[lab])
        elif labels is not None:
            txt.append(str(lab))
        if scores is not None:
            txt.append(f"{float(scores[i]):.2f}")
        if txt:
            d.text((float(b[0]) + 2, max(0.0, float(b[1]) - 12)),
                   ":".join(txt), fill=color)
    return out


def draw_masks(
    img: Image.Image,
    masks: np.ndarray,  # [N, H, W] binary (image-sized)
    labels: Optional[np.ndarray] = None,
    alpha: float = 0.45,
) -> Image.Image:
    """Alpha-blend instance masks in per-class palette colors (capability of
    the reference COCOVisualizer's mask rendering, util/visualizer.py:58 —
    there via matplotlib polygons)."""
    base = np.asarray(img.copy(), np.float32)
    for i, m in enumerate(np.asarray(masks)):
        if m.shape != base.shape[:2]:
            raise ValueError(f"mask {i} shape {m.shape} != image "
                             f"{base.shape[:2]}")
        lab = int(labels[i]) if labels is not None else i
        color = np.array(PALETTE[lab % len(PALETTE)], np.float32)
        sel = np.asarray(m, bool)
        base[sel] = (1 - alpha) * base[sel] + alpha * color
    return Image.fromarray(np.clip(base, 0, 255).astype(np.uint8), "RGB")


def save_pseudo_label_debug(
    image_norm: np.ndarray,  # [H, W, 3] normalized (target-domain weak view)
    pseudo: Dict[str, np.ndarray],  # boxes (cxcywh, real-size-normalized),
    # labels, valid
    gt: Optional[Dict[str, np.ndarray]],
    real_hw,
    out_path: str,
):
    """Side-by-side pseudo-labels vs GT (self_training_utils.py:196-214)."""
    img = denormalize_image(image_norm)
    h, w = int(real_hw[0]), int(real_hw[1])
    scale = np.array([w, h, w, h], np.float32)

    pv = np.asarray(pseudo["valid"], bool)
    p_boxes = box_cxcywh_to_xyxy(np.asarray(pseudo["boxes"][pv])) * scale
    left = draw_boxes(img, p_boxes, np.asarray(pseudo["labels"])[pv])

    if gt is not None:
        gv = np.asarray(gt["valid"], bool)
        g_boxes = box_cxcywh_to_xyxy(np.asarray(gt["boxes"])[gv]) * scale
        right = draw_boxes(img, g_boxes, np.asarray(gt["labels"])[gv])
        canvas = Image.new("RGB", (img.width * 2 + 8, img.height),
                           (255, 255, 255))
        canvas.paste(left, (0, 0))
        canvas.paste(right, (img.width + 8, 0))
    else:
        canvas = left
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    canvas.save(out_path)
    return canvas
