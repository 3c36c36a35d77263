"""Host data-pipeline throughput benchmark (no device work).

The TPU relay makes the device the slow side only if the host loader can
outrun it: training at batch 2 consumes ~2.6 img/s (0.77 s/step), eval at
~13 img/s (bench.py). The reference gets host overlap from DataLoader
workers (main.py:177-186); here the threaded prefetch in data/loader.py
must hide JPEG decode + weak/strong augmentation + static-canvas padding.

This tool measures, on Cityscapes-scale JPEGs (1024x2048) written to a
temp dir so real disk decode is included:
  - da_train_strong:  make_da_loader with strong views (self-training epochs)
  - da_train_weak:    make_da_loader compute_strong=False (burn-in epochs)
  - eval:             EvalLoader at the C2F eval resolution

Usage: python tools/loader_bench.py [--images 32] [--threads 4]
Prints one JSON line per mode: {"mode", "img_per_s", "ms_per_batch"}.

NOTE on this container: `nproc` == 1, so thread counts >1 only add
contention here and absolute throughputs are NOT representative of a real
TPU-VM host (~100 cores). The transferable numbers are the single-thread
per-item costs (measured 2026-08-18: ~123 ms/paired-item weak,
~318 ms/paired-item strong at Cityscapes resolution) — a real host with W
workers sustains ~W/0.318 img-pairs/s strong, so 8 workers already outrun
the 0.77 s/step device side.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datr_tpu.data.coco import CocoDetectionDataset, DAPairedDataset  # noqa: E402
from datr_tpu.data.loader import make_da_loader, make_eval_loader  # noqa: E402
from datr_tpu.data.synthetic import SyntheticDetectionDataset  # noqa: E402
from datr_tpu.data.transforms import DATrainTransform, EvalTransform  # noqa: E402

# flagship C2F geometry (configs/DA/Cityscapes2FoggyCityscapes/*):
# train scales x1.5 capped 2048, canvas 800x1344 fits the eval resize
SCALES = [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800]
MAX_SIZE = 1333
CANVAS = (800, 1344)


def _write_coco_tree(root: str, n: int, hw=(1024, 2048), fog=0.0, seed=0):
    """Materialize synthetic Cityscapes-sized JPEGs + annotations.json so
    the benchmark pays real disk decode like training does."""
    gen = SyntheticDetectionDataset(n, hw, num_classes=8, seed=seed, fog=fog)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, anns = [], []
    aid = 0
    for i in range(n):
        img, tgt = gen.load(i)
        name = f"{i:06d}.jpg"
        img.save(os.path.join(img_dir, name), quality=90)
        images.append({"id": i, "file_name": name,
                       "width": hw[1], "height": hw[0]})
        for b, lbl in zip(tgt["boxes"], tgt["labels"]):
            x0, y0, x1, y1 = [float(v) for v in b]
            anns.append({"id": aid, "image_id": i, "category_id": int(lbl),
                         "bbox": [x0, y0, x1 - x0, y1 - y0],
                         "area": (x1 - x0) * (y1 - y0), "iscrowd": 0})
            aid += 1
    ann_file = os.path.join(root, "annotations.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": c, "name": str(c)}
                                  for c in range(1, 9)]}, f)
    return CocoDetectionDataset(img_dir, ann_file)


def _drain(it, n_batches: int, batch_imgs: int):
    t0 = time.perf_counter()
    n = 0
    for b in it:
        n += 1
        if n >= n_batches:
            break
    dt = time.perf_counter() - t0
    return {"img_per_s": round(n * batch_imgs / dt, 2),
            "ms_per_batch": round(1e3 * dt / n, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2,
                    help="images per domain per batch (reference bs)")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        src = _write_coco_tree(os.path.join(td, "src"), args.images, seed=0)
        tgt = _write_coco_tree(os.path.join(td, "tgt"), args.images,
                               fog=0.35, seed=1)
        da = DAPairedDataset(src, tgt)
        train_tf = DATrainTransform(SCALES, MAX_SIZE, [400, 500, 600],
                                    [384, 600])
        eval_tf = EvalTransform(max(SCALES), MAX_SIZE)
        n_batches = max(2, args.images // args.batch - 1)

        for mode, strong in (("da_train_strong", True),
                             ("da_train_weak", False)):
            it = make_da_loader(da, args.batch, CANVAS, train_tf,
                                num_threads=args.threads,
                                compute_strong=strong)
            # per batch the DA loader emits batch src + batch tgt images
            r = _drain(it, n_batches, 2 * args.batch)
            print(json.dumps({"mode": mode, "threads": args.threads, **r}))

        ev = make_eval_loader(tgt, args.batch, CANVAS, eval_tf)
        r = _drain(iter(ev), n_batches, args.batch)
        print(json.dumps({"mode": "eval", "threads": args.threads, **r}))


if __name__ == "__main__":
    main()
