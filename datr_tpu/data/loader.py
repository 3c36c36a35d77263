"""Batch assembly: paired DA batches and eval batches with static shapes.

Replaces util/misc.py collate_fn_da (:291-300) + DataLoader workers: the
paired batch layout is [source images ; target images] along the batch axis
(the reference concatenates source+target into one NestedTensor), every image
padded to one static canvas, targets padded to max_boxes. Background threads
prefetch batches so host augmentation overlaps device compute.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Dict, Iterator

import numpy as np

from .transforms import DATrainTransform, EvalTransform, finalize_example


def _stack(dicts, key):
    return np.stack([d[key] for d in dicts])


def make_da_loader(
    dataset,
    batch_size: int,  # images per domain per batch (reference bs=2 total)
    canvas_hw,
    transform: DATrainTransform,
    max_boxes: int = 100,
    seed: int = 0,
    shuffle: bool = True,
    num_threads: int = 4,
    epoch: int = 0,
    process_index: int = 0,
    process_count: int = 1,
    compute_strong: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yields batches:
      images        [2b, H, W, 3] — first b source (weak), then b target (weak)
      images_strong [2b, H, W, 3] — [source weak ; target strong], same
                    geometry (util/misc.py:297 — source has no strong aug)
      pad_mask      [2b, H, W]
      boxes/labels/valid  [b, max_boxes, ...]  (source GT)
      real_sizes    [b, 2] — target-half unpadded (h, w), for pseudo labels

    compute_strong=False (burn-in epochs, which drop the strong views)
    skips the photometric aug + extra finalize work and aliases
    images_strong to the weak batch.
    """
    num_threads = max(1, num_threads)  # 0/negative would stall q.get()
    n = len(dataset)
    order = list(range(n))
    rng = random.Random(seed + epoch)
    if shuffle:
        rng.shuffle(order)

    def load_one(idx, seed_i):
        r = random.Random(seed_i)
        s_img, s_strong, s_tgt, t_img, t_strong, t_tgt = dataset.load(
            idx, r, strong=compute_strong
        )
        # Source strong view == source weak view (util/misc.py:297 collates
        # source_imgs + target_imgs_strong_aug): never re-run geometry or
        # canvas padding for the source twin.
        s_img, _, s_tgt = transform(s_img, None, s_tgt, r)
        if not compute_strong:
            t_strong = None  # skip strong-view geometry too
        # the same transform instance re-rolls geometry for the target pair
        t_img, t_strong, t_tgt = transform(t_img, t_strong, t_tgt, r)
        s = finalize_example(s_img, s_tgt, canvas_hw, max_boxes)
        t = finalize_example(t_img, t_tgt, canvas_hw, max_boxes)
        if not compute_strong:
            return s, s, t, t
        ts = finalize_example(t_strong, None, canvas_hw, max_boxes)
        return s, s, t, ts

    def assemble(items):
        s, ss, t, ts = zip(*items)
        images = np.concatenate([_stack(s, "image"), _stack(t, "image")])
        if compute_strong:
            images_strong = np.concatenate(
                [_stack(ss, "image"), _stack(ts, "image")]
            )
        else:
            images_strong = images  # alias: burn-in steps drop this key
        return {
            "images": images,
            "images_strong": images_strong,
            "pad_mask": np.concatenate(
                [_stack(s, "pad_mask"), _stack(t, "pad_mask")]
            ),
            "boxes": _stack(s, "boxes"),
            "labels": _stack(s, "labels"),
            "valid": _stack(s, "valid"),
            "real_sizes": _stack(t, "real_size"),
        }

    batches = [
        order[i : i + batch_size]
        for i in range(0, n - batch_size + 1, batch_size)
    ]
    # multi-host: each process takes a strided shard of batches
    # (DistributedSampler equivalent, main.py:177-186)
    if process_count > 1:
        batches = batches[process_index::process_count]

    q: queue.Queue = queue.Queue(maxsize=max(2, num_threads))
    stop = object()

    def worker(batch_indices_chunk, base_seed):
        for bi, idxs in batch_indices_chunk:
            items = [load_one(idx, base_seed + bi * 1000 + j)
                     for j, idx in enumerate(idxs)]
            q.put((bi, assemble(items)))

    enumerated = list(enumerate(batches))
    chunks = [enumerated[i::num_threads] for i in range(num_threads)]
    threads = [
        threading.Thread(
            target=worker, args=(c, seed + 7919 * epoch), daemon=True
        )
        for c in chunks if c
    ]
    for t in threads:
        t.start()

    def gen():
        buf = {}
        want = 0
        done = 0
        total = len(batches)
        while done < total:
            bi, b = q.get()
            buf[bi] = b
            while want in buf:
                yield buf.pop(want)
                want += 1
                done += 1

    return gen()


def make_single_loader(
    dataset,
    batch_size: int,
    canvas_hw,
    transform,  # SingleDomainTrainTransform
    max_boxes: int = 100,
    seed: int = 0,
    shuffle: bool = True,
    num_threads: int = 4,
    epoch: int = 0,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Single-domain supervised batches (plain-DINO pretraining; reference
    collate_fn path):
      images [b, H, W, 3], pad_mask [b, H, W],
      boxes/labels/valid [b, max_boxes, ...]
    """
    num_threads = max(1, num_threads)  # 0/negative would stall q.get()
    n = len(dataset)
    order = list(range(n))
    rng = random.Random(seed + epoch)
    if shuffle:
        rng.shuffle(order)

    def load_one(idx, seed_i):
        r = random.Random(seed_i)
        img, tgt = dataset.load(idx)
        img, tgt = transform(img, tgt, r)
        return finalize_example(img, tgt, canvas_hw, max_boxes)

    batches = [
        order[i : i + batch_size]
        for i in range(0, n - batch_size + 1, batch_size)
    ]
    if process_count > 1:
        batches = batches[process_index::process_count]

    q: queue.Queue = queue.Queue(maxsize=max(2, num_threads))

    def worker(chunk, base_seed):
        for bi, idxs in chunk:
            items = [load_one(idx, base_seed + bi * 1000 + j)
                     for j, idx in enumerate(idxs)]
            batch = {
                "images": _stack(items, "image"),
                "pad_mask": _stack(items, "pad_mask"),
                "boxes": _stack(items, "boxes"),
                "labels": _stack(items, "labels"),
                "valid": _stack(items, "valid"),
            }
            if "masks" in items[0]:  # masks=True single-domain training
                batch["masks"] = _stack(items, "masks")
            q.put((bi, batch))

    enumerated = list(enumerate(batches))
    chunks = [enumerated[i::num_threads] for i in range(num_threads)]
    threads = [
        threading.Thread(target=worker, args=(c, seed + 7919 * epoch),
                         daemon=True)
        for c in chunks if c
    ]
    for t in threads:
        t.start()

    def gen():
        buf = {}
        want = 0
        done = 0
        total = len(batches)
        while done < total:
            bi, b = q.get()
            buf[bi] = b
            while want in buf:
                yield buf.pop(want)
                want += 1
                done += 1

    return gen()


class EvalLoader:
    """Eval batches with image ids + original sizes (engine.py:349-421).
    The tail batch is padded by repeating the last image; `batch_valid`
    marks real entries.

    Iterable (re-iterable) and carries `.dataset` so engine.evaluate can
    fetch raw GT annotations (crowd + annotation areas) for exact
    pycocotools-style evaluation. With process_count > 1 each process
    evaluates a strided shard of images (DistributedSampler equivalent for
    val, reference main.py:180-186); engine.evaluate gathers the
    detections across processes before summarizing."""

    def __init__(self, dataset, batch_size: int, canvas_hw,
                 transform: EvalTransform, max_boxes: int = 100,
                 process_index: int = 0, process_count: int = 1,
                 num_threads: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.canvas_hw = canvas_hw
        self.transform = transform
        self.max_boxes = max_boxes
        self.indices = list(range(len(dataset)))[process_index::process_count]
        self.process_count = process_count
        self.num_threads = max(1, num_threads)
        # equal batch counts on every process so collectives stay in step
        self.n_batches = -(-max(len(dataset), 1) // batch_size)
        self.n_batches = -(-self.n_batches // max(process_count, 1))

    def _make_batch(self, b: int) -> Dict[str, np.ndarray]:
        bs = self.batch_size
        idxs = self.indices[b * bs : (b + 1) * bs]
        n_real = len(idxs)
        valid = np.zeros((bs,), bool)
        valid[:n_real] = True
        while len(idxs) < bs:
            idxs.append(self.indices[-1] if self.indices else 0)
        items = []
        for idx in idxs:
            img, tgt = self.dataset.load(idx)
            img, tgt = self.transform(img, tgt)
            items.append(
                finalize_example(img, tgt, self.canvas_hw, self.max_boxes)
            )
        return {
            "images": _stack(items, "image"),
            "pad_mask": _stack(items, "pad_mask"),
            "orig_sizes": _stack(items, "orig_size").astype(np.float32),
            # unpadded (h, w) on the canvas — the segm eval path crops the
            # upsampled masks to this before resizing to orig_sizes
            "real_sizes": _stack(items, "real_size"),
            "image_ids": _stack(items, "image_id"),
            "batch_valid": valid,
            "boxes": _stack(items, "boxes"),
            "labels": _stack(items, "labels"),
            "valid": _stack(items, "valid"),
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        # threaded prefetch, in-order delivery: host decode/resize overlaps
        # the device eval step (the reference gets this from DataLoader
        # workers; per-epoch eval re-runs 2-3x make it matter here)
        if self.num_threads == 1 or self.n_batches <= 1:
            for b in range(self.n_batches):
                yield self._make_batch(b)
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self.num_threads) as pool:
            depth = self.num_threads + 1
            futs = {b: pool.submit(self._make_batch, b)
                    for b in range(min(depth, self.n_batches))}
            for b in range(self.n_batches):
                nxt = b + depth
                if nxt < self.n_batches:
                    futs[nxt] = pool.submit(self._make_batch, nxt)
                yield futs.pop(b).result()


def make_eval_loader(
    dataset,
    batch_size: int,
    canvas_hw,
    transform: EvalTransform,
    max_boxes: int = 100,
    process_index: int = 0,
    process_count: int = 1,
    num_threads: int = 4,
) -> EvalLoader:
    return EvalLoader(dataset, batch_size, canvas_hw, transform, max_boxes,
                      process_index, process_count,
                      num_threads=num_threads)
