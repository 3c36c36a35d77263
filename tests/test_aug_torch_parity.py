"""Pixel/box live-parity for the paired augmentation pipeline (VERDICT r3 #4).

Drives the reference's UNMODIFIED datasets/da_transforms.py Compose (the
weak geometric triple: RandomHorizontalFlip + RandomSelect(multi-scale
resize | resize->RandomSizeCrop->resize) + ToTensor + Normalize, the 'train'
pipeline of DAcoco.py:553-562) and the LIVE strong-aug pipeline
(DAcoco.py:348-361 make_coco_strong_transforms incl. its GaussianBlur class)
with every random draw scripted from a shared tape, and diffs pixels and
normalized cxcywh targets against data/transforms.py / data/strong_aug.py on
the same tape.

The torchvision functions da_transforms calls (F.resize/crop/hflip/
to_tensor/normalize, ColorJitter, RandomGrayscale) come from the test stub
(reference_stubs._make_tv_transforms) which implements torchvision's exact
PIL-backend semantics — for PIL inputs torchvision itself delegates to PIL
(Image.resize(BILINEAR), Image.crop, ImageEnhance, HSV-roundtrip hue), so
the stub is a faithful oracle, analogous to the grid_sample MSDA stub.

Parity bars: PIL stages pixel-EXACT (both sides end in the same PIL C
kernels — any divergence means different geometry/parameters); normalized
tensors/boxes to f32 epsilon.
"""

import os
import sys

import numpy as np
import pytest
import torch
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_stubs  # noqa: E402

reference_stubs.install()

pytestmark = pytest.mark.parity  # heavy live-torch fixtures

import datasets.DAcoco as DAcoco_ref  # noqa: E402
import datasets.da_transforms as T_ref  # noqa: E402
import torchvision.transforms as tvt_stub  # noqa: E402

from datr_tpu.data.strong_aug import strong_augment  # noqa: E402
from datr_tpu.data.transforms import (  # noqa: E402
    IMAGENET_MEAN,
    IMAGENET_STD,
    DATrainTransform,
    EvalTransform,
    finalize_example,
)


class Tape:
    """Deterministic uniform stream shared between the reference pipeline
    (monkeypatched into its `random` modules) and ours (passed as the rng).
    Every primitive is derived from the same fraction sequence, so both
    sides see identical draws IFF they request them in the same order with
    the same bounds — a draw-order or bound mismatch shifts the tape and
    shows up as a pixel diff."""

    def __init__(self, fracs):
        self.f = list(fracs)
        self.used = 0

    def _pop(self):
        self.used += 1
        return self.f.pop(0)

    def random(self):
        return self._pop()

    def uniform(self, a, b):
        return a + (b - a) * self._pop()

    def randint(self, a, b):
        assert b >= a, (a, b)
        return a + min(int(self._pop() * (b - a + 1)), b - a)

    def randrange(self, n):
        return min(int(self._pop() * n), n - 1)

    def choice(self, seq):
        return seq[min(int(self._pop() * len(seq)), len(seq) - 1)]

    def shuffle(self, x):
        # Fisher–Yates identical on both sides
        for i in reversed(range(1, len(x))):
            j = min(int(self._pop() * (i + 1)), i)
            x[i], x[j] = x[j], x[i]

    def copy(self):
        return Tape(list(self.f))


SCALES = [72, 80, 96]
MAX_SIZE = 120
SCALES2_RESIZE = [64, 72]
SCALES2_CROP = (48, 72)
MEAN = [0.485, 0.456, 0.406]
STD = [0.229, 0.224, 0.225]


def _structured_image(rng, h, w):
    """Gradient + rectangles + noise: sensitive to any geometric shift."""
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (255 * x / w),
            (255 * y / h),
            (128 + 100 * np.sin(x / 7.0) * np.cos(y / 5.0)),
        ],
        -1,
    )
    for _ in range(6):
        y0, x0 = rng.integers(0, h - 8), rng.integers(0, w - 8)
        hh, ww = rng.integers(4, h // 3), rng.integers(4, w // 3)
        img[y0 : y0 + hh, x0 : x0 + ww] = rng.integers(0, 255, 3)
    img += rng.normal(0, 8, img.shape)
    return Image.fromarray(np.clip(img, 0, 255).astype(np.uint8), "RGB")


def _make_target(rng, w, h, n=6, with_masks=False):
    x0 = rng.uniform(0, w * 0.7, n)
    y0 = rng.uniform(0, h * 0.7, n)
    bw = rng.uniform(4, w * 0.3, n)
    bh = rng.uniform(4, h * 0.3, n)
    boxes = np.stack(
        [x0, y0, np.minimum(x0 + bw, w), np.minimum(y0 + bh, h)], -1
    ).astype(np.float32)
    labels = rng.integers(0, 9, n).astype(np.int64)
    t = {
        "boxes": boxes,
        "labels": labels,
        "area": ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
        .astype(np.float32),
        "iscrowd": np.zeros(n, np.int64),
        "image_id": 7,
        "orig_size": np.array([h, w], np.int64),
        "size": np.array([h, w], np.int64),
    }
    if with_masks:
        masks = np.zeros((n, h, w), np.uint8)
        for i, b in enumerate(boxes):
            masks[i, int(b[1]) : int(b[3]), int(b[0]) : int(b[2])] = 1
        t["masks"] = masks
    return t


def _ref_weak_pipeline():
    """The reference 'train' DA pipeline, composed exactly as
    make_coco_transforms builds it (DAcoco.py:553-562) from the live
    da_transforms classes."""
    normalize = T_ref.Compose([T_ref.ToTensor(), T_ref.Normalize(MEAN, STD)])
    return T_ref.Compose(
        [
            T_ref.RandomHorizontalFlip(),
            T_ref.RandomSelect(
                T_ref.RandomResize(SCALES, max_size=MAX_SIZE),
                T_ref.Compose(
                    [
                        T_ref.RandomResize(SCALES2_RESIZE),
                        T_ref.RandomSizeCrop(*SCALES2_CROP),
                        T_ref.RandomResize(SCALES, max_size=MAX_SIZE),
                    ]
                ),
            ),
            normalize,
        ]
    )


def _ref_target(t, with_masks=False):
    out = {
        "boxes": torch.as_tensor(t["boxes"].copy()),
        "labels": torch.as_tensor(t["labels"].copy()),
        "area": torch.as_tensor(t["area"].copy()),
        "iscrowd": torch.as_tensor(t["iscrowd"].copy()),
        "image_id": torch.tensor([t["image_id"]]),
        "orig_size": torch.as_tensor(t["orig_size"].copy()),
        "size": torch.as_tensor(t["size"].copy()),
    }
    if with_masks and "masks" in t:
        out["masks"] = torch.as_tensor(t["masks"].copy()).bool()
    return out


def _run_both(tape, img, target, with_masks=False, monkeypatch=None):
    """Run reference triple pipeline and ours from copies of one tape."""
    ref_tape, our_tape = tape.copy(), tape.copy()
    monkeypatch.setattr(T_ref, "random", ref_tape)
    monkeypatch.setattr(tvt_stub, "_random", ref_tape)
    img_r, strong_r, tgt_r = _ref_weak_pipeline()(
        img.copy(), img.copy(), _ref_target(target, with_masks)
    )

    ours = DATrainTransform(SCALES, MAX_SIZE, SCALES2_RESIZE, SCALES2_CROP)
    tgt_o = {
        "boxes": target["boxes"].copy(),
        "labels": target["labels"].copy(),
        "image_id": target["image_id"],
        "orig_size": target["orig_size"].copy(),
    }
    if with_masks:
        tgt_o["masks"] = target["masks"].copy()
    img_o, strong_o, tgt_o = ours(img.copy(), img.copy(), tgt_o, our_tape)
    assert ref_tape.used == our_tape.used, "draw count mismatch"
    return (img_r, strong_r, tgt_r), (img_o, strong_o, tgt_o)


def _check_pixels_and_boxes(ref, ours, canvas=(128, 128), max_boxes=16):
    img_r, strong_r, tgt_r = ref
    img_o, strong_o, tgt_o = ours
    h, w = int(tgt_r["size"][0]), int(tgt_r["size"][1])
    assert img_o.size == (w, h), (img_o.size, (w, h))

    # finalize (normalize + static pad) vs the reference's normalized tensor
    fin = finalize_example(img_o, tgt_o, canvas, max_boxes=max_boxes)
    ref_chw = img_r.numpy()  # [3, h, w] normalized
    got = fin["image"][:h, :w].transpose(2, 0, 1)
    np.testing.assert_allclose(got, ref_chw, atol=2e-6, rtol=0)
    # padding region is exactly zero
    assert np.abs(fin["image"][h:]).sum() == 0
    assert np.abs(fin["image"][:, w:]).sum() == 0
    # strong view gets the identical geometry
    fin_s = finalize_example(strong_o, None, canvas, max_boxes=max_boxes)
    np.testing.assert_allclose(
        fin_s["image"][:h, :w].transpose(2, 0, 1), strong_r.numpy(),
        atol=2e-6, rtol=0)

    # boxes: reference emits normalized cxcywh after Normalize
    n = len(tgt_r["labels"])
    np.testing.assert_array_equal(fin["valid"][:n], True)
    np.testing.assert_array_equal(fin["valid"][n:], False)
    np.testing.assert_array_equal(fin["labels"][:n], tgt_r["labels"].numpy())
    np.testing.assert_allclose(fin["boxes"][:n], tgt_r["boxes"].numpy(),
                               atol=1e-6, rtol=1e-5)
    return tgt_r, tgt_o


def test_weak_triple_resize_branch_parity(monkeypatch):
    """Branch 1 (hflip + multi-scale resize with max_size cap): pixels of
    both views and normalized boxes match the live reference exactly."""
    rng = np.random.default_rng(0)
    img = _structured_image(rng, 100, 140)
    target = _make_target(rng, 140, 100, with_masks=True)
    # draws: hflip=0.2 (<0.5: flip), select=0.3 (<0.5: branch 1),
    # choice(scales) -> index 2 (96)
    tape = Tape([0.2, 0.3, 0.9])
    ref, ours = _run_both(tape, img, target, with_masks=True,
                          monkeypatch=monkeypatch)
    tgt_r, tgt_o = _check_pixels_and_boxes(ref, ours)
    # masks geometry (reference: nearest interpolate, da_transforms:143-146)
    np.testing.assert_array_equal(
        tgt_o["masks"].astype(bool), tgt_r["masks"].numpy())


def test_weak_triple_crop_branch_parity(monkeypatch):
    """Branch 2 (resize -> RandomSizeCrop -> resize): the crop drops boxes
    on both sides identically and the surviving pixels/boxes/masks match."""
    rng = np.random.default_rng(1)
    img = _structured_image(rng, 110, 90)
    target = _make_target(rng, 90, 110, n=8, with_masks=True)
    # draws: hflip=0.8 (no flip), select=0.7 (branch 2), choice(s2r)=idx 1,
    # randint w frac, randint h frac, crop top frac, crop left frac,
    # choice(scales)=idx 0
    tape = Tape([0.8, 0.7, 0.6, 0.35, 0.55, 0.4, 0.75, 0.1])
    ref, ours = _run_both(tape, img, target, with_masks=True,
                          monkeypatch=monkeypatch)
    tgt_r, tgt_o = _check_pixels_and_boxes(ref, ours)
    # the crop's keep-filter must agree (possibly fewer than 8 boxes left)
    assert len(tgt_r["labels"]) == len(tgt_o["labels"])
    np.testing.assert_array_equal(
        tgt_o["masks"].astype(bool), tgt_r["masks"].numpy())


def test_weak_triple_many_random_tapes(monkeypatch):
    """Fuzz both branches with random tapes: every draw pattern must agree
    pixel-exactly (catches draw-order and bound mismatches)."""
    rng = np.random.default_rng(2)
    for trial in range(8):
        img = _structured_image(
            rng, int(rng.integers(80, 130)), int(rng.integers(80, 150)))
        w, h = img.size
        target = _make_target(rng, w, h, n=5)
        tape = Tape(list(rng.uniform(0.01, 0.99, 10)))
        ref, ours = _run_both(tape, img, target, monkeypatch=monkeypatch)
        _check_pixels_and_boxes(ref, ours)


def test_eval_resize_c2f_scales_parity(monkeypatch):
    """The C2F eval transform (1.5x scales capped at 2048: RandomResize(
    [1200], max_size=2048) on a Cityscapes-aspect image — reference
    config coco_transformer_C2F.py:2-8) resizes to the same canvas with
    identical pixels and normalized boxes."""
    rng = np.random.default_rng(3)
    img = _structured_image(rng, 256, 512)  # 1:2 Cityscapes aspect
    # use the real C2F numbers: shorter side 1200, cap 2048 -> 1024x2048
    target = _make_target(rng, 512, 256, n=4)
    ref_tape = Tape([0.0])
    monkeypatch.setattr(T_ref, "random", ref_tape)
    normalize = T_ref.Compose([T_ref.ToTensor(), T_ref.Normalize(MEAN, STD)])
    pipeline = T_ref.Compose(
        [T_ref.RandomResize([1200], max_size=2048), normalize])
    img_r, _, tgt_r = pipeline(img.copy(), None, _ref_target(target))

    ev = EvalTransform(1200, 2048)
    tgt_o = {"boxes": target["boxes"].copy(),
             "labels": target["labels"].copy()}
    img_o, tgt_o = ev(img.copy(), tgt_o)
    h, w = int(tgt_r["size"][0]), int(tgt_r["size"][1])
    assert img_o.size == (w, h)
    fin = finalize_example(img_o, tgt_o, (h, w), max_boxes=8)
    np.testing.assert_allclose(
        fin["image"].transpose(2, 0, 1), img_r.numpy(), atol=2e-6, rtol=0)
    n = len(tgt_r["labels"])
    np.testing.assert_allclose(fin["boxes"][:n], tgt_r["boxes"].numpy(),
                               atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize(
    "tape_vals",
    [
        # apply_jitter, shuffle x3, b, c, s, h, gray, apply_blur, sigma
        [0.1, 0.3, 0.6, 0.2, 0.7, 0.4, 0.9, 0.5, 0.9, 0.2, 0.6],
        # jitter skipped (>=0.8), grayscale on, blur skipped
        [0.95, 0.05, 0.9],
        # everything on, different permutation
        [0.0, 0.9, 0.1, 0.5, 0.25, 0.85, 0.15, 0.65, 0.1, 0.0, 0.35],
    ],
)
def test_strong_aug_pipeline_parity(monkeypatch, tape_vals):
    """The LIVE make_coco_strong_transforms chain (DAcoco.py:348-361:
    RandomApply(ColorJitter(.4,.4,.4,.1), .8) + RandomGrayscale(.2) +
    RandomApply(GaussianBlur([.1,2]), .5)) equals strong_augment
    pixel-exactly on a shared tape."""
    rng = np.random.default_rng(4)
    img = _structured_image(rng, 96, 128)
    tape = Tape(tape_vals)
    ref_tape, our_tape = tape.copy(), tape.copy()
    monkeypatch.setattr(tvt_stub, "_random", ref_tape)
    monkeypatch.setattr(DAcoco_ref, "random", ref_tape)
    ref_chain = DAcoco_ref.make_coco_strong_transforms("train")
    out_r = ref_chain(img.copy())
    out_o = strong_augment(img.copy(), our_tape)
    assert ref_tape.used == our_tape.used, "draw count mismatch"
    np.testing.assert_array_equal(np.asarray(out_o), np.asarray(out_r))
    # and 'val' returns None on the reference (strong aug is train-only)
    assert DAcoco_ref.make_coco_strong_transforms("val") is None
