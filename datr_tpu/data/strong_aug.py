"""Strong photometric augmentation for the target domain (teacher-student).

Capability match for make_coco_strong_transforms (datasets/DAcoco.py:348-361):
RandomApply(ColorJitter(.4, .4, .4, .1), p=.8) + RandomGrayscale(.2) +
RandomApply(GaussianBlur(sigma in [.1, 2]), p=.5). Photometric only — applied
to the PIL image before the shared geometric pipeline, so teacher (weak) and
student (strong) views stay geometrically aligned.
"""

from __future__ import annotations

import random

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter


def _adjust_contrast(arr, f):
    mean = arr.mean(axis=(0, 1), keepdims=True)
    return (arr - mean) * f + mean


def _adjust_hue(img: Image.Image, shift: float) -> Image.Image:
    """shift in [-0.5, 0.5] turns of the hue wheel — the torchvision PIL
    backend's adjust_hue: HSV roundtrip with uint8-wraparound on the H
    channel (what the reference's ColorJitter(…, hue=0.1) executes for PIL
    inputs, DAcoco.py:352)."""
    if img.mode in ("L", "1", "I", "F"):
        return img
    h, s, v = img.convert("HSV").split()
    np_h = np.asarray(h, np.uint8)
    # uint8 wraparound IS the mod-256 hue roll
    np_h = np_h + np.uint8(int(shift * 255) % 256)
    h = Image.fromarray(np_h, "L")
    return Image.merge("HSV", (h, s, v)).convert("RGB")


def color_jitter(
    img: Image.Image, rng: random.Random,
    brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1,
) -> Image.Image:
    """torchvision ColorJitter semantics on the PIL C paths (ImageEnhance
    Brightness/Contrast/Color + HSV hue), applied in a random order —
    matches the reference's transforms.ColorJitter(0.4, 0.4, 0.4, 0.1)
    (DAcoco.py:352) and runs ~50x faster than a float-numpy formulation at
    Cityscapes resolution (tools/loader_bench.py)."""
    # draw order mirrors torchvision ColorJitter.get_params exactly —
    # application permutation first, then the four factors in fixed
    # (brightness, contrast, saturation, hue) order — so the same uniform
    # stream produces the same augmentation as the reference pipeline
    # (tests/test_aug_torch_parity.py scripts both sides from one tape)
    order = [0, 1, 2, 3]
    rng.shuffle(order)
    f_b = (rng.uniform(max(0, 1 - brightness), 1 + brightness)
           if brightness > 0 else 1.0)
    f_c = (rng.uniform(max(0, 1 - contrast), 1 + contrast)
           if contrast > 0 else 1.0)
    f_s = (rng.uniform(max(0, 1 - saturation), 1 + saturation)
           if saturation > 0 else 1.0)
    s_h = rng.uniform(-hue, hue) if hue > 0 else 0.0
    ops = [
        lambda im: ImageEnhance.Brightness(im).enhance(f_b)
        if brightness > 0 else im,
        lambda im: ImageEnhance.Contrast(im).enhance(f_c)
        if contrast > 0 else im,
        lambda im: ImageEnhance.Color(im).enhance(f_s)
        if saturation > 0 else im,
        lambda im: _adjust_hue(im, s_h) if hue > 0 else im,
    ]
    for i in order:
        img = ops[i](img)
    return img


def to_grayscale(img: Image.Image) -> Image.Image:
    return img.convert("L").convert("RGB")


def gaussian_blur(img: Image.Image, sigma: float) -> Image.Image:
    return img.filter(ImageFilter.GaussianBlur(radius=sigma))


def strong_augment(img: Image.Image, rng: random.Random) -> Image.Image:
    """The full strong-aug chain (DAcoco.py:348-361)."""
    if rng.random() < 0.8:
        img = color_jitter(img, rng)
    if rng.random() < 0.2:
        img = to_grayscale(img)
    if rng.random() < 0.5:
        img = gaussian_blur(img, rng.uniform(0.1, 2.0))
    return img


# --- sltransform-style extras (datasets/sltransform.py, used by the
# single-domain strong_aug path, DAcoco.py:529-548) -------------------------
def adjust_contrast(img: Image.Image, factor: float) -> Image.Image:
    arr = np.asarray(img, np.float32) / 255.0
    arr = np.clip(_adjust_contrast(arr, factor), 0, 1)
    return Image.fromarray((arr * 255 + 0.5).astype(np.uint8))


def adjust_brightness(img: Image.Image, factor: float) -> Image.Image:
    arr = np.asarray(img, np.float32) / 255.0
    arr = np.clip(arr * factor, 0, 1)
    return Image.fromarray((arr * 255 + 0.5).astype(np.uint8))


def lighting_noise(img: Image.Image, rng: random.Random) -> Image.Image:
    """Random channel permutation (sltransform.py:52 LightingNoise)."""
    perms = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1),
             (2, 1, 0)]
    p = perms[rng.randrange(len(perms))]
    arr = np.asarray(img)
    return Image.fromarray(arr[..., list(p)])


def random_select_multi(ops, rng: random.Random):
    """Pick one op from a list (sltransform.py:202 RandomSelectMulti)."""
    return ops[rng.randrange(len(ops))]


def rotate_with_boxes(img: Image.Image, boxes_xyxy: np.ndarray,
                      angle: float):
    """Expand-rotate the image and map boxes to the enclosing axis-aligned
    boxes of their rotated corners (sltransform.py:158 Rotate + its :60-105
    rotate helper semantics: rotation about the image center,
    counter-clockwise for positive angle, expanded canvas)."""
    import math

    w, h = img.size
    out = img.rotate(angle, expand=True)
    nw, nh = out.size
    if len(boxes_xyxy) == 0:
        return out, boxes_xyxy
    a = math.radians(angle)
    ca, sa = math.cos(a), math.sin(a)
    cx, cy = w / 2.0, h / 2.0
    b = np.asarray(boxes_xyxy, np.float32)
    corners = np.stack(
        [
            b[:, [0, 1]], b[:, [2, 1]], b[:, [0, 3]], b[:, [2, 3]],
        ],
        axis=1,
    )  # [N, 4, 2]
    x = corners[..., 0] - cx
    y = corners[..., 1] - cy
    # image coords (y down): counter-clockwise rotation
    rx = ca * x + sa * y + nw / 2.0
    ry = -sa * x + ca * y + nh / 2.0
    nb = np.stack(
        [rx.min(1), ry.min(1), rx.max(1), ry.max(1)], axis=1
    )
    nb[:, 0::2] = nb[:, 0::2].clip(0, nw)
    nb[:, 1::2] = nb[:, 1::2].clip(0, nh)
    return out, nb.astype(np.float32)


def iou_random_crop(img: Image.Image, boxes_xyxy: np.ndarray,
                    labels: np.ndarray, rng: random.Random):
    """SSD-style IoU-constrained random crop (datasets/random_crop.py:50-134
    semantics): sample a min-IoU mode from {0.1, 0.3, 0.5, 0.9, None}; try
    up to 50 crops of 0.3-1.0x size with aspect in [0.5, 2] whose max IoU
    against the GT clears the mode; keep boxes whose center is inside,
    clamped and shifted to crop coords."""
    w, h = img.size
    mode = rng.choice([0.1, 0.3, 0.5, 0.9, None])
    b = np.asarray(boxes_xyxy, np.float32)
    if mode is None or len(b) == 0:
        return img, b, labels
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    for _ in range(50):
        nh = rng.uniform(0.3 * h, h)
        nw = rng.uniform(0.3 * w, w)
        if nh / nw < 0.5 or nh / nw > 2.0:
            continue
        left = int(rng.uniform(0, w - nw))
        top = int(rng.uniform(0, h - nh))
        right = int(left + nw)
        bottom = int(top + nh)
        ix = np.clip(
            np.minimum(b[:, 2], right) - np.maximum(b[:, 0], left), 0, None
        )
        iy = np.clip(
            np.minimum(b[:, 3], bottom) - np.maximum(b[:, 1], top), 0, None
        )
        inter = ix * iy
        crop_area = (right - left) * (bottom - top)
        iou = inter / np.maximum(area + crop_area - inter, 1e-9)
        if iou.max() < mode:
            continue
        ctr_x = (b[:, 0] + b[:, 2]) / 2.0
        ctr_y = (b[:, 1] + b[:, 3]) / 2.0
        keep = ((ctr_x > left) & (ctr_x < right)
                & (ctr_y > top) & (ctr_y < bottom))
        if not keep.any():
            continue
        nb = b[keep].copy()
        nb[:, 0::2] = nb[:, 0::2].clip(left, right) - left
        nb[:, 1::2] = nb[:, 1::2].clip(top, bottom) - top
        return (
            img.crop((left, top, right, bottom)),
            nb.astype(np.float32),
            np.asarray(labels)[keep],
        )
    return img, b, labels


class Albumentations:
    """Optional albumentations hook (sltransform.py:216-246): the reference
    composes Blur/MedianBlur/ToGray/CLAHE/RandomBrightnessContrast/
    RandomGamma/ImageCompression at low probabilities with pascal_voc bbox
    passthrough. The library is optional — construction raises ImportError
    when absent (same behavior as the reference's inline `import
    albumentations`); callers gate on availability."""

    def __init__(self):
        import albumentations as A  # optional dependency

        self.transform = A.Compose(
            [
                A.Blur(p=0.01),
                A.MedianBlur(p=0.01),
                A.ToGray(p=0.01),
                A.CLAHE(p=0.01),
                A.RandomBrightnessContrast(p=0.005),
                A.RandomGamma(p=0.005),
                A.ImageCompression(quality_lower=75, p=0.005),
            ],
            bbox_params=A.BboxParams(format="pascal_voc",
                                     label_fields=["class_labels"]),
        )

    def __call__(self, img: Image.Image, boxes_xyxy, labels,
                 rng: random.Random, p: float = 1.0):
        if rng.random() >= p:
            return img, boxes_xyxy, labels
        res = self.transform(image=np.array(img), bboxes=boxes_xyxy,
                             class_labels=labels)
        return (
            Image.fromarray(res["image"]),
            np.asarray(res["bboxes"], np.float32).reshape(-1, 4),
            np.asarray(res["class_labels"]),
        )
