"""COCO-format detection datasets + source/target DA pairing.

Capability match for datasets/DAcoco.py (CocoDetection :365-398, DADataset
:647-670, per-direction builders :672-880) and datasets/coco.py single-domain
builders. The COCO JSON is parsed directly (no pycocotools dependency — this
environment doesn't ship it); annotations are filtered like
ConvertCocoPolysToMask (DAcoco.py:418-480): drop iscrowd, clamp boxes, drop
degenerate ones. Labels use the raw category_id, as the reference does.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from .strong_aug import strong_augment


def open_rgb(path: str) -> Image.Image:
    """Open an image as RGB, decoding JPEGs through the native libjpeg
    kernel when available (bit-identical to PIL — both run libjpeg-turbo's
    baseline islow IDCT, tests/test_native_image_ops.py — but the ctypes
    call releases the GIL, so loader threads decode in parallel instead of
    serializing against the training loop)."""
    if path.lower().endswith((".jpg", ".jpeg")):
        from .. import native

        with open(path, "rb") as f:
            arr = native.decode_jpeg_rgb(f.read())
        if arr is not None:
            return Image.fromarray(arr)
    return Image.open(path).convert("RGB")


def decode_segmentation(seg, h: int, w: int) -> np.ndarray:
    """COCO 'segmentation' field -> binary mask [h, w] uint8.

    Handles polygon lists (rasterized with PIL — same fill convention as
    pycocotools' polygon rasterizer up to boundary-pixel rounding), and
    uncompressed / compressed RLE dicts (column-major runs starting with
    zeros, maskApi.c rleDecode — utils/rle.py). Reference:
    ConvertCocoPolysToMask's convert_coco_poly_to_mask (frPyObjects +
    decode), datasets/coco.py."""
    if isinstance(seg, dict):  # RLE
        from ..utils.rle import counts_from_string, decode_counts

        counts = seg["counts"]
        if isinstance(counts, (str, bytes)):
            counts = counts_from_string(counts)
        rh, rw = seg.get("size", (h, w))
        if (int(rh), int(rw)) != (h, w):
            # a foreign-size RLE would train the mask head on spatially
            # misaligned GT (or crash np.stack against polygon masks at the
            # image size) — fail loudly; the reference crashes here too
            raise ValueError(
                f"RLE size {(rh, rw)} != image size {(h, w)} — "
                "re-encode the annotation at the image resolution"
            )
        return decode_counts(counts, rh, rw).astype(np.uint8)
    from PIL import ImageDraw

    out = Image.new("L", (w, h), 0)
    drw = ImageDraw.Draw(out)
    for poly in seg:
        if len(poly) >= 6:
            drw.polygon([float(v) for v in poly], fill=1)
    return np.asarray(out, np.uint8)


class CocoIndex:
    """Minimal in-memory COCO index (replaces pycocotools.coco.COCO)."""

    def __init__(self, ann_file: str):
        with open(ann_file) as f:
            data = json.load(f)
        self.images = {im["id"]: im for im in data["images"]}
        self.image_ids = [im["id"] for im in data["images"]]
        self.cats = {c["id"]: c for c in data.get("categories", [])}
        self.anns_by_image: Dict[int, List[dict]] = {
            i: [] for i in self.image_ids
        }
        for a in data.get("annotations", []):
            if a["image_id"] in self.anns_by_image:
                self.anns_by_image[a["image_id"]].append(a)


class CocoDetectionDataset:
    """Single-domain detection dataset yielding (PIL image, target dict)."""

    def __init__(self, img_dir: str, ann_file: str,
                 return_masks: bool = False):
        self.img_dir = img_dir
        self.index = CocoIndex(ann_file)
        # reference ConvertCocoPolysToMask(return_masks=args.masks),
        # datasets/coco.py — targets gain 'masks' [N, h, w] uint8 aligned
        # with boxes/labels, feeding the segmentation losses
        self.return_masks = return_masks

    def __len__(self):
        return len(self.index.image_ids)

    def category_ids(self):
        """Sorted GT category ids (uniform across dataset classes — main.py
        builds the evaluator's category list from this)."""
        return sorted(self.index.cats)

    def load(self, i: int):
        image_id = self.index.image_ids[i]
        info = self.index.images[image_id]
        path = os.path.join(self.img_dir, info["file_name"])
        img = open_rgb(path)
        w, h = img.size

        boxes, labels, masks = [], [], []
        for a in self.index.anns_by_image[image_id]:
            if a.get("iscrowd", 0):
                continue
            x, y, bw, bh = a["bbox"]  # xywh
            x0 = max(0.0, min(x, w))
            y0 = max(0.0, min(y, h))
            x1 = max(0.0, min(x + bw, w))
            y1 = max(0.0, min(y + bh, h))
            if x1 <= x0 or y1 <= y0:
                continue
            boxes.append([x0, y0, x1, y1])
            labels.append(a["category_id"])
            if self.return_masks:
                masks.append(decode_segmentation(
                    a.get("segmentation", []), h, w))
        target = {
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int64),
            "image_id": image_id,
            "orig_size": np.array([h, w], np.int64),
            "size": np.array([h, w], np.int64),
        }
        if self.return_masks:
            target["masks"] = (np.stack(masks) if masks
                               else np.zeros((0, h, w), np.uint8))
        return img, target

    def eval_annotations(self, image_id: int, with_masks: bool = False):
        """Raw GT for COCO evaluation: unlike the training targets, crowd
        annotations are KEPT (they become ignore regions in the evaluator)
        and the annotation 'area' field is used when present — matching how
        the reference evaluates against the original COCO API GT
        (datasets/coco_eval.py:22-56) rather than the filtered train
        targets. with_masks=True (the segm-AP eval path asks for it
        explicitly) adds GT mask RLEs — decoupled from return_masks so a
        val dataset never pays per-image mask decode in its load() path."""
        boxes, labels, iscrowd, areas, masks = [], [], [], [], []
        for a in self.index.anns_by_image[image_id]:
            x, y, bw, bh = a["bbox"]
            boxes.append([x, y, x + bw, y + bh])
            labels.append(a["category_id"])
            iscrowd.append(bool(a.get("iscrowd", 0)))
            areas.append(float(a.get("area", bw * bh)))
            if with_masks:
                masks.append(a.get("segmentation", []))
        out = {
            "boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
            "labels": np.asarray(labels, np.int64),
            "iscrowd": np.asarray(iscrowd, bool),
            "areas": np.asarray(areas, np.float64),
        }
        if with_masks:
            # GT RLEs for segm-AP evaluation (pycocotools loads these via
            # annToRLE; crowd anns are usually compressed-RLE dicts)
            from ..utils.rle import counts_from_string, encode_mask

            info = self.index.images[image_id]
            h, w = int(info["height"]), int(info["width"])
            rles = []
            for seg in masks:
                if isinstance(seg, dict):
                    c = seg["counts"]
                    rles.append(np.asarray(
                        counts_from_string(c)
                        if isinstance(c, (str, bytes)) else c, np.int64))
                else:
                    rles.append(encode_mask(decode_segmentation(seg, h, w)))
            out["masks"] = rles
            out["mask_size"] = (h, w)
        return out


class ConcatDetectionDataset:
    """Concatenation of COCO-format shards presented as one dataset
    (capability of the reference's `build_o365_combine` dispatch branch,
    datasets/__init__.py:29-31 — the module it imports is absent upstream,
    so the semantics are reconstructed from the name: several annotation
    shards over one or more image roots served as a single index)."""

    def __init__(self, parts: List[CocoDetectionDataset]):
        assert parts, "ConcatDetectionDataset needs at least one shard"
        self.parts = parts
        self._cum = np.cumsum([len(p) for p in parts])

    def __len__(self):
        return int(self._cum[-1])

    def category_ids(self):
        ids = set()
        for p in self.parts:
            ids.update(p.category_ids())
        return sorted(ids)

    def _locate(self, i: int):
        p = int(np.searchsorted(self._cum, i, side="right"))
        prev = 0 if p == 0 else int(self._cum[p - 1])
        return self.parts[p], i - prev

    def load(self, i: int):
        part, j = self._locate(i)
        return part.load(j)

    def eval_annotations(self, image_id: int, with_masks: bool = False):
        for p in self.parts:
            if image_id in p.index.anns_by_image:
                return p.eval_annotations(image_id, with_masks=with_masks)
        raise KeyError(image_id)


class DAPairedDataset:
    """Zip of source + target datasets with modulo indexing, len = max
    (DADataset, DAcoco.py:647-670). Returns (src_img, src_strong, src_tgt,
    tgt_img, tgt_strong, tgt_tgt)."""

    def __init__(self, source: CocoDetectionDataset,
                 target: CocoDetectionDataset, strong_aug: bool = True):
        self.source = source
        self.target = target
        self.strong_aug = strong_aug

    def __len__(self):
        return max(len(self.source), len(self.target))

    def load(self, i: int, rng: random.Random, strong: bool = True):
        s_img, s_tgt = self.source.load(i % len(self.source))
        t_img, t_tgt = self.target.load(i % len(self.target))
        # Strong view: photometric only, TARGET domain only. The reference
        # builds the source dataset with strong_transforms=None
        # (DAcoco.py:703) and collates the strong batch as
        # source_weak + target_strong (util/misc.py:297); the source half of
        # the student's strong input IS the weak source image.
        # `strong=False` skips the work for burn-in epochs, which never
        # consume the strong views (engine.train_one_epoch drops them).
        do_strong = self.strong_aug and strong
        s_strong = s_img
        t_strong = strong_augment(t_img, rng) if do_strong else t_img
        return s_img, s_strong, s_tgt, t_img, t_strong, t_tgt


# -----------------------------------------------------------------------
# dataset registry — mirrors datasets/__init__.py:21-45 dispatch and the
# per-direction builders (paths are configured, not hardcoded-blank).
# -----------------------------------------------------------------------
def build_coco_classic(image_set: str, root: str,
                       return_masks: bool = False):
    """Classic COCO-2017 directory layout (reference datasets/coco.py:611-641
    PATHS): <root>/{train2017,val2017} + annotations/instances_*.json."""
    split = "train2017" if image_set == "train" else "val2017"
    return CocoDetectionDataset(
        os.path.join(root, split),
        os.path.join(root, "annotations", f"instances_{split}.json"),
        return_masks=return_masks,
    )


def build_coco_panoptic(image_set: str, root: str,
                        return_masks: bool = False):
    """COCO-panoptic layout (reference datasets/coco_panoptic.py:81-104):
    <root>/{train2017,val2017} + <root>/panoptic/{panoptic_<split>/,
    annotations/panoptic_<split>.json}."""
    from .panoptic import CocoPanopticDataset

    split = "train2017" if image_set == "train" else "val2017"
    pan = os.path.join(root, "panoptic")
    return CocoPanopticDataset(
        os.path.join(root, split),
        os.path.join(pan, f"panoptic_{split}"),
        os.path.join(pan, "annotations", f"panoptic_{split}.json"),
        return_masks=return_masks,
    )


def build_o365_combine(image_set: str, root: str,
                       return_masks: bool = False):
    """Objects365-style sharded layout: <root>/<split>/images plus EITHER a
    single annotations.json or several annotations*.json shards combined
    into one dataset (reference dispatch name 'o365',
    datasets/__init__.py:29-31; its o365.py module is absent upstream — the
    shard-combine semantics its `build_o365_combine` name promises are
    provided here)."""
    import glob

    split = "train" if image_set == "train" else "val"
    d = os.path.join(root, split)
    shards = sorted(glob.glob(os.path.join(d, "annotations*.json")))
    if not shards:
        raise FileNotFoundError(
            f"no annotations*.json under {d} (o365 layout)"
        )
    parts = [
        CocoDetectionDataset(os.path.join(d, "images"), s,
                             return_masks=return_masks) for s in shards
    ]
    if len(parts) == 1:
        return parts[0]
    return ConcatDetectionDataset(parts)


def build_dataset(
    image_set: str,
    dataset_file: str,
    data_root: str,
    strong_aug: bool = True,
    return_masks: bool = False,
):
    """image_set: 'train' (paired DA) or 'val' (target-domain eval).

    Named-dataset dispatch mirroring datasets/__init__.py:21-45 — the
    reference hardcodes machine-specific PATHS per name (DAcoco.py:672-880,
    coco.py:643-731); here every name maps onto a documented layout under
    data_root:

      'coco'          classic COCO-2017 tree (build_coco_classic)
      'coco_panoptic' panoptic tree (build_coco_panoptic)
      'o365'          sharded-annotations tree (build_o365_combine)
      any other name  <data_root>/<name>/ with either
                        source/{images,annotations.json}     (paired DA;
                        target/{images,annotations.json}      covers
                        val/{images,annotations.json}         city2foggy,
                                                              sim2city,
                                                              city2bdd100k,
                                                              xview2dota)
                      or train/{images,annotations.json} (+ val/) for
                      single-domain training (reference 'city' path).
    """
    if dataset_file == "coco":
        return build_coco_classic(image_set, os.path.join(data_root, "coco"),
                                  return_masks=return_masks)
    if dataset_file == "coco_panoptic":
        return build_coco_panoptic(image_set,
                                   os.path.join(data_root, "coco"),
                                   return_masks=return_masks)
    if dataset_file == "o365":
        return build_o365_combine(image_set,
                                  os.path.join(data_root, "o365"),
                                  return_masks=return_masks)
    d = os.path.join(data_root, dataset_file)
    single_domain = (
        not os.path.isdir(os.path.join(d, "source"))
        and os.path.isdir(os.path.join(d, "train"))
    )
    if image_set == "train":
        if single_domain:
            # plain COCO layout <dataset>/train — single-domain training
            # (reference dispatch 'coco'/'city', datasets/coco.py:611-731 +
            # datasets/__init__.py:21-45)
            return CocoDetectionDataset(
                os.path.join(d, "train/images"),
                os.path.join(d, "train/annotations.json"),
                return_masks=return_masks,
            )
        if return_masks:
            # the reference's DA pipeline has no mask supervision either
            # (DAcoco.py never wires return_masks); fail loudly instead of
            # training a mask head with zero gradient
            raise ValueError(
                "masks=True requires a single-domain dataset layout "
                "(train/ + val/): the paired DA pipeline carries no "
                "instance masks"
            )
        src = CocoDetectionDataset(
            os.path.join(d, "source/images"),
            os.path.join(d, "source/annotations.json"),
        )
        tgt = CocoDetectionDataset(
            os.path.join(d, "target/images"),
            os.path.join(d, "target/annotations.json"),
        )
        return DAPairedDataset(src, tgt, strong_aug)
    if image_set == "val":
        return CocoDetectionDataset(
            os.path.join(d, "val/images"),
            os.path.join(d, "val/annotations.json"),
            return_masks=return_masks,
        )
    raise ValueError(image_set)
