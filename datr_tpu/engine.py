"""Epoch-level loops: burn-in training, self-training, evaluation.

Equivalent of the reference engine.py (train_one_epoch :29,
train_one_epoch_with_self_training :146, evaluate :349) — the per-step body
lives in datr_tpu/train/steps.py (compiled once); here is the host-side epoch
orchestration, metric logging, EMA cadence (main.py:382-386: teacher EMA per
epoch, CosineEMA decay annealed per epoch), and the NaN abort
(engine.py:81-84).
"""

from __future__ import annotations

import math
import os
import sys
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .train.criterion import CriterionCfg
from .train.ema import cosine_decay, ema_update, ramped_decay
from .train.steps import (
    eval_step,
    train_step_burnin,
    train_step_plain,
    train_step_self_training,
)
from .utils.logger import MetricLogger
from .eval.coco_eval import CocoEvaluator


def _scalar_metrics(metrics):
    """Host-side scalar step metrics for the MetricLogger (the reference
    logs all weighted loss terms + class_error + grad_total_norm,
    engine.py:122-129)."""
    out = {}
    for k, v in metrics.items():
        try:
            if getattr(v, "ndim", 0) == 0:
                out[k] = float(v)
        except Exception:
            pass
    return out


def _drain_metrics(pending, ml):
    """Fetch a window of on-device metric dicts in ONE host transfer and
    abort on a non-finite loss (reference engine.py:81-84).

    Fetching per step would serialize dispatch through this environment's
    high-latency relay (every device->host fetch is a round trip); batching
    the fetch every print_freq steps keeps the device pipeline full while
    preserving the NaN abort within a window."""
    if not pending:
        return
    for m in jax.device_get(pending):
        loss = float(m["loss"])
        if not math.isfinite(loss):
            print(f"Loss is {loss}, stopping training", file=sys.stderr)
            sys.exit(1)
        ml.update(**_scalar_metrics(m))
    pending.clear()


def _run_epoch(step_fn, state, loader, ml, header, print_freq):
    """Shared epoch driver: async dispatch + windowed metric drain."""
    pending = []
    done = 0
    for batch in ml.log_every(loader, print_freq, header):
        state, metrics = step_fn(state, batch)
        pending.append(metrics)
        done += 1
        # drain so the i % print_freq == 0 log line (printed after this
        # body returns) shows fresh meters
        if (done - 1) % print_freq == 0:
            _drain_metrics(pending, ml)
    _drain_metrics(pending, ml)
    return state, {k: m.global_avg for k, m in ml.meters.items()}


def train_one_epoch(
    state, model, tx, loader: Iterable, ccfg: CriterionCfg,
    weight_dict: Dict[str, float], epoch: int, logger=None,
    print_freq: int = 10, ema_decay: float = 0.0,
):
    ml = MetricLogger(logger=logger)

    def step(state, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k not in ("images_strong", "real_sizes")}
        return train_step_burnin(state, batch, model, tx, ccfg, weight_dict,
                                 ema_decay=ema_decay)

    return _run_epoch(step, state, loader, ml, f"Epoch: [{epoch}]",
                      print_freq)


def train_one_epoch_plain(
    state, model, tx, loader: Iterable, ccfg: CriterionCfg,
    weight_dict: Dict[str, float], epoch: int, logger=None,
    print_freq: int = 10, ema_decay: float = 0.0,
):
    """Single-domain supervised epoch (plain-DINO pretraining; reference
    single-domain dataset path, datasets/coco.py:611-640)."""
    ml = MetricLogger(logger=logger)

    def step(state, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return train_step_plain(state, batch, model, tx, ccfg, weight_dict,
                                ema_decay=ema_decay)

    return _run_epoch(step, state, loader, ml, f"Epoch: [{epoch}]",
                      print_freq)


def train_one_epoch_self_training(
    state, model, tx, loader: Iterable, ccfg: CriterionCfg,
    weight_dict: Dict[str, float], class_thresholds, canvas_hw,
    epoch: int, logger=None, print_freq: int = 10, ema_decay: float = 0.0,
    teacher_model=None, teacher_params=None,
):
    """teacher_model/teacher_params switch the pseudo-label source from the
    student's EMA to an external (possibly different-architecture) teacher —
    the distillation path onto the fast config (train/steps.py)."""
    ml = MetricLogger(logger=logger)
    thr = jnp.asarray(class_thresholds)

    def step(state, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return train_step_self_training(
            state, batch, model, tx, ccfg, weight_dict, thr,
            canvas_hw=tuple(canvas_hw), ema_decay=ema_decay,
            teacher_model=teacher_model, teacher_params=teacher_params,
        )

    return _run_epoch(step, state, loader, ml,
                      f"SelfTrain Epoch: [{epoch}]", print_freq)


def update_emas_per_epoch(state, epoch: int, cfg):
    """main.py:382-386: ema_teacher.update(model); best.update_decay(epoch);
    best.update(ema_teacher)."""
    updates = state.ema_updates + 1
    d_teacher = ramped_decay(cfg.get("ema_decay_teacher", 0.9997),
                             updates.astype(jnp.float32))
    new_teacher = ema_update(state.ema_teacher, state.params, d_teacher)
    total = max(int(cfg.get("epochs", 36)) - int(cfg.get("burn_epochs", 40)),
                1)
    rel_epoch = max(epoch - int(cfg.get("burn_epochs", 40)), 0)
    d_best = cosine_decay(
        cfg.get("ema_decay_best_model", 0.9), 0.9999, rel_epoch, total
    )
    new_best = ema_update(state.best_ema, new_teacher, d_best)
    return state.replace(
        ema_teacher=new_teacher, best_ema=new_best, ema_updates=updates
    )


def evaluate(
    params, model, loader: Iterable, categories,
    num_select: int = 300, logger=None, print_freq: int = 50,
    save_results_path: Optional[str] = None,
    nms_iou_threshold: float = -1.0,
    segm: bool = False,
) -> Dict:
    """Run detection eval, return the 12 COCO stats
    (engine.py:349-513 -> stats['coco_eval_bbox']). With save_results_path,
    raw per-image gt/pred arrays are dumped for offline diffing (equivalent
    of --save_results, engine.py:433-492). nms_iou_threshold > 0 applies the
    reference's optional class-aware eval NMS (dino.py:989-992,1136).

    segm=True additionally evaluates mask AP (reference iou_types
    ('bbox','segm') when args.masks, engine.py:364,514-517 ->
    stats['coco_eval_masks']); requires a with_masks model and a dataset
    whose eval_annotations provide GT mask RLEs (return_masks=True). On a
    pod, detection RLEs ride a length-padded flat-buffer allgather
    (_merge_segm_across_processes) — GT comes from the shared annotation
    file on each host."""
    evaluator = CocoEvaluator(categories)
    evaluator_m = None
    segm_records = []
    if segm:
        evaluator_m = CocoEvaluator(categories, iou_type="segm")
    dumped = [] if save_results_path else None
    ml = MetricLogger(logger=logger)
    # raw GT (crowd annotations + annotation areas) when the dataset
    # provides it — matches the reference's evaluation against the
    # original COCO API GT (datasets/coco_eval.py:22-56)
    dataset = getattr(loader, "dataset", None)
    raw_gt = getattr(dataset, "eval_annotations", None)
    # per-image records for the multi-host merge — only accumulated when a
    # merge will actually run (single-host eval of a large val set would
    # otherwise hold ~num_select dets + max_boxes GT per image for nothing)
    multi = jax.process_count() > 1
    det_records = []
    max_boxes = None
    for batch in ml.log_every(loader, print_freq, "Test:"):
        arrays = {k: jnp.asarray(v) for k, v in batch.items()
                  if k in ("images", "pad_mask", "orig_sizes")}
        res = eval_step(params, arrays, model, num_select=num_select,
                        nms_iou_threshold=float(nms_iou_threshold),
                        with_masks=bool(evaluator_m is not None))
        res = jax.device_get(res)
        max_boxes = batch["boxes"].shape[1]
        for i in range(len(batch["image_ids"])):
            if not batch["batch_valid"][i]:
                continue
            oh, ow = batch["orig_sizes"][i]
            db = np.asarray(res["boxes"][i])
            ds = np.asarray(res["scores"][i])
            dl = np.asarray(res["labels"][i])
            if "valid" in res:  # NMS path: keep surviving detections only
                dv = np.asarray(res["valid"][i], bool)
                db, ds, dl = db[dv], ds[dv], dl[dv]
            if raw_gt is not None:
                # one call per image; GT mask RLEs are requested explicitly
                # (and only) when segm eval consumes them
                ann = (raw_gt(int(batch["image_ids"][i]), with_masks=True)
                       if evaluator_m is not None
                       else raw_gt(int(batch["image_ids"][i])))
                gt_kw = dict(
                    gt_boxes=ann["boxes"], gt_labels=ann["labels"],
                    gt_iscrowd=ann["iscrowd"], gt_areas=ann["areas"],
                )
                gt_xyxy = gv = gl = None
            else:
                # GT back to absolute xyxy in orig coords (used directly,
                # and as the multi-host payload so the merge also works
                # without raw annotations)
                gb = np.asarray(batch["boxes"][i], np.float64)
                gv = np.asarray(batch["valid"][i], bool)
                gl = np.asarray(batch["labels"][i])
                cx, cy, w_, h_ = gb[:, 0], gb[:, 1], gb[:, 2], gb[:, 3]
                gt_xyxy = np.stack(
                    [cx - w_ / 2, cy - h_ / 2, cx + w_ / 2, cy + h_ / 2], 1
                ) * np.array([ow, oh, ow, oh])
                gt_kw = dict(gt_boxes=gt_xyxy[gv], gt_labels=gl[gv])
            evaluator.add_image(
                int(batch["image_ids"][i]),
                det_boxes=db, det_scores=ds, det_labels=dl, **gt_kw,
            )
            if evaluator_m is not None:
                if raw_gt is None:
                    raise ValueError(
                        "segm eval needs dataset.eval_annotations"
                    )
                if "masks" not in ann:
                    raise ValueError(
                        "segm eval needs GT mask RLEs from "
                        "eval_annotations(with_masks=True)"
                    )
                from .models.segmentation import det_mask_rles

                ml_i = np.asarray(res["mask_logits"][i], np.float32)
                if "valid" in res:
                    ml_i = ml_i[dv]
                det_rles = det_mask_rles(
                    ml_i, tuple(batch["images"].shape[1:3]),
                    tuple(batch["real_sizes"][i]), (oh, ow),
                )
                evaluator_m.add_image(
                    int(batch["image_ids"][i]),
                    det_boxes=db, det_scores=ds, det_labels=dl,
                    gt_boxes=ann["boxes"], gt_labels=ann["labels"],
                    gt_iscrowd=ann["iscrowd"], gt_areas=ann["areas"],
                    gt_masks=ann["masks"], det_masks=det_rles,
                    mask_size=ann["mask_size"],
                )
                if multi:
                    segm_records.append(dict(
                        image_id=int(batch["image_ids"][i]),
                        boxes=db, scores=ds, labels=dl, rles=det_rles,
                    ))
            if multi:
                rec = dict(
                    image_id=int(batch["image_ids"][i]),
                    boxes=np.asarray(res["boxes"][i]),
                    scores=np.asarray(res["scores"][i])
                    if "valid" not in res else np.where(
                        np.asarray(res["valid"][i], bool),
                        np.asarray(res["scores"][i]), -1.0
                    ),
                    labels=np.asarray(res["labels"][i]),
                )
                if raw_gt is None:
                    # GT rides the allgather only when there is no shared
                    # annotation file for the far side to look it up in
                    rec.update(gt_boxes=gt_xyxy, gt_labels=np.asarray(gl),
                               gt_valid=gv)
                det_records.append(rec)
            if dumped is not None:
                dumped.append(dict(
                    image_id=int(batch["image_ids"][i]),
                    boxes=db, scores=ds, labels=dl, **gt_kw,
                ))
    if dumped is not None:
        np.savez_compressed(save_results_path,
                            results=np.array(dumped, dtype=object))
    if jax.process_count() > 1:
        # both det (num_select) and gt (max_boxes) payload shapes are config
        # constants, identical on every process (EvalLoader pads batch
        # counts), so the allgather shapes always line up
        _merge_across_processes(evaluator, det_records, raw_gt,
                                num_select, max_boxes or 1)
        if evaluator_m is not None:
            _merge_segm_across_processes(evaluator_m, segm_records, raw_gt)
    stats = evaluator.summarize()
    if logger:
        logger.info(
            "COCO stats: AP=%.4f AP50=%.4f AP75=%.4f" % tuple(stats[:3])
        )
    out = {"coco_eval_bbox": stats, "ap50": stats[1]}
    if evaluator_m is not None:
        m_stats = evaluator_m.summarize()
        if logger:
            logger.info(
                "COCO segm stats: AP=%.4f AP50=%.4f AP75=%.4f"
                % tuple(m_stats[:3])
            )
        out["coco_eval_masks"] = m_stats  # reference engine.py:514-517
    return out


def test(params, model, loader: Iterable, output_dir: str,
         num_select: int = 300, logger=None, print_freq: int = 50,
         nms_iou_threshold: float = -1.0):
    """--test mode (reference engine.py:527-597): dump every detection as a
    COCO-format record list to <output_dir>/results{rank}.json. Boxes stay
    cxcywh (PostProcess not_to_xyxy=True, engine.py:572) scaled to original
    image size; labels are the raw class indices.

    nms_iou_threshold > 0 applies the configured eval NMS (dino.py:989-992)
    and dumps survivors only. Deliberate divergence: the reference would run
    torchvision nms on the cxcywh tensors here (a latent upstream bug — the
    IoUs are meaningless in that layout); we apply it in xyxy space and
    convert the kept boxes back to cxcywh for the dump."""
    import json as _json

    use_nms = nms_iou_threshold and nms_iou_threshold > 0
    final_res = []
    ml = MetricLogger(logger=logger)
    for batch in ml.log_every(loader, print_freq, "Test:"):
        arrays = {k: jnp.asarray(v) for k, v in batch.items()
                  if k in ("images", "pad_mask", "orig_sizes")}
        res = jax.device_get(
            eval_step(params, arrays, model, num_select=num_select,
                      nms_iou_threshold=float(nms_iou_threshold),
                      not_to_xyxy=not use_nms)
        )
        for i in range(len(batch["image_ids"])):
            if not batch["batch_valid"][i]:
                continue
            boxes = np.asarray(res["boxes"][i], np.float64)
            scores = np.asarray(res["scores"][i])
            labels_ = np.asarray(res["labels"][i])
            if use_nms:  # xyxy survivors -> cxcywh dump layout
                keep = np.asarray(res["valid"][i], bool)
                boxes, scores, labels_ = boxes[keep], scores[keep], \
                    labels_[keep]
                x0, y0, x1, y1 = boxes.T
                boxes = np.stack(
                    [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], 1
                )
            for s, l, b in zip(scores, labels_, boxes):
                final_res.append({
                    "image_id": int(batch["image_ids"][i]),
                    "category_id": int(l),
                    "bbox": [float(x) for x in b],
                    "score": float(s),
                })
    if output_dir:
        path = os.path.join(output_dir,
                            f"results{jax.process_index()}.json")
        with open(path, "w") as f:
            _json.dump(final_res, f)
        if logger:
            logger.info(f"wrote {len(final_res)} detections to {path}")
    return final_res


def _merge_across_processes(evaluator, det_records, raw_gt, num_select,
                            max_boxes):
    """Gather every process's eval-shard detections so each process computes
    identical global stats (reference: CocoEvaluator.synchronize_between_
    processes, datasets/coco_eval.py:58-61, via pickle all_gather
    misc.py:96-136 — here fixed-shape arrays + process_allgather). When the
    dataset provides raw annotations only the detections travel (GT comes
    from the shared annotation file); otherwise the fixed-shape batch GT
    arrays are gathered too, so shard-local stats never silently stand in
    for global ones."""
    from jax.experimental import multihost_utils

    n_local = len(det_records)
    n_max = int(
        multihost_utils.process_allgather(np.array(n_local)).max()
    )
    ids = np.full((n_max,), -1, np.int64)
    boxes = np.zeros((n_max, num_select, 4), np.float32)
    scores = np.full((n_max, num_select), -1.0, np.float32)
    labels = np.zeros((n_max, num_select), np.int32)
    gt_boxes = np.zeros((n_max, max_boxes, 4), np.float64)
    gt_labels = np.zeros((n_max, max_boxes), np.int32)
    gt_valid = np.zeros((n_max, max_boxes), bool)
    for i, r in enumerate(det_records):
        ids[i] = r["image_id"]
        boxes[i] = r["boxes"]
        scores[i] = r["scores"]
        labels[i] = r["labels"]
        if raw_gt is None:  # GT only travels when there's no shared ann file
            gt_boxes[i] = r["gt_boxes"]
            gt_labels[i] = r["gt_labels"]
            gt_valid[i] = r["gt_valid"]
    gathered = multihost_utils.process_allgather(
        (ids, boxes, scores, labels, gt_boxes, gt_labels, gt_valid)
    )
    g_ids, g_boxes, g_scores, g_labels, g_gtb, g_gtl, g_gtv = gathered
    me = jax.process_index()
    for p in range(jax.process_count()):
        if p == me:
            continue
        for i in range(n_max):
            iid = int(g_ids[p, i])
            if iid < 0:
                continue
            ds = np.asarray(g_scores[p, i])
            keep = ds >= 0  # NMS-invalid entries were marked -1
            if raw_gt is not None:
                ann = raw_gt(iid)
                gt_kw = dict(
                    gt_boxes=ann["boxes"], gt_labels=ann["labels"],
                    gt_iscrowd=ann["iscrowd"], gt_areas=ann["areas"],
                )
            else:
                gv = np.asarray(g_gtv[p, i], bool)
                gt_kw = dict(gt_boxes=np.asarray(g_gtb[p, i])[gv],
                             gt_labels=np.asarray(g_gtl[p, i])[gv])
            evaluator.add_image(
                iid,
                det_boxes=np.asarray(g_boxes[p, i])[keep],
                det_scores=ds[keep],
                det_labels=np.asarray(g_labels[p, i])[keep],
                **gt_kw,
            )


def _merge_segm_across_processes(evaluator_m, segm_records, raw_gt):
    """Gather every process's segm-shard detections (mask RLEs are ragged,
    so they travel as ONE flat int64 buffer per process, padded to the
    global max length — the exact-data equivalent of the reference's pickle
    all_gather, misc.py:96-136). GT always comes from the shared annotation
    file (segm eval requires raw annotations with masks).

    Buffer layout per image: [image_id, D] then per det [label, len(counts),
    counts...]; float payload per det rides a parallel [N_det, 5] array
    (score, box xyxy) padded the same way."""
    from jax.experimental import multihost_utils

    ints: list = []
    floats: list = []
    for r in segm_records:
        ints += [r["image_id"], len(r["scores"])]
        for j in range(len(r["scores"])):
            c = np.asarray(r["rles"][j], np.int64)
            ints += [int(r["labels"][j]), len(c)]
            ints += c.tolist()
            floats.append([float(r["scores"][j]), *map(float, r["boxes"][j])])
    ibuf = np.asarray(ints, np.int64)
    fbuf = (np.asarray(floats, np.float64).reshape(-1, 5)
            if floats else np.zeros((0, 5)))
    lens = multihost_utils.process_allgather(
        np.array([ibuf.size, fbuf.shape[0]], np.int64)
    )  # [P, 2]
    pad_i = np.zeros((int(lens[:, 0].max()),), np.int64)
    pad_i[: ibuf.size] = ibuf
    pad_f = np.zeros((int(lens[:, 1].max()), 5), np.float64)
    pad_f[: fbuf.shape[0]] = fbuf
    g_i, g_f = multihost_utils.process_allgather((pad_i, pad_f))
    me = jax.process_index()
    for p in range(jax.process_count()):
        if p == me:
            continue
        buf = np.asarray(g_i[p][: int(lens[p, 0])])
        fl = np.asarray(g_f[p][: int(lens[p, 1])])
        pos = 0
        det = 0
        while pos < buf.size:
            iid, D = int(buf[pos]), int(buf[pos + 1])
            pos += 2
            labels, scores, boxes, rles = [], [], [], []
            for _ in range(D):
                lab, L = int(buf[pos]), int(buf[pos + 1])
                pos += 2
                rles.append(buf[pos: pos + L].copy())
                pos += L
                labels.append(lab)
                scores.append(fl[det, 0])
                boxes.append(fl[det, 1:5])
                det += 1
            # GT mask RLEs must be requested explicitly — eval_annotations
            # only includes them when asked (with_masks), and this merge
            # path is segm-only
            ann = raw_gt(iid, with_masks=True)
            evaluator_m.add_image(
                iid,
                det_boxes=np.asarray(boxes, np.float64).reshape(-1, 4),
                det_scores=np.asarray(scores),
                det_labels=np.asarray(labels, np.int64),
                gt_boxes=ann["boxes"], gt_labels=ann["labels"],
                gt_iscrowd=ann["iscrowd"], gt_areas=ann["areas"],
                gt_masks=ann["masks"], det_masks=rles,
                mask_size=ann["mask_size"],
            )
