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
    train_step_self_training,
)
from .utils.logger import MetricLogger
from .eval.coco_eval import CocoEvaluator


def train_one_epoch(
    state, model, tx, loader: Iterable, ccfg: CriterionCfg,
    weight_dict: Dict[str, float], epoch: int, logger=None,
    print_freq: int = 10,
):
    ml = MetricLogger(logger=logger)
    for batch in ml.log_every(loader, print_freq, f"Epoch: [{epoch}]"):
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k not in ("images_strong", "real_sizes")}
        state, metrics = train_step_burnin(
            state, batch, model, tx, ccfg, weight_dict
        )
        loss = float(metrics["loss"])
        if not math.isfinite(loss):
            print(f"Loss is {loss}, stopping training", file=sys.stderr)
            sys.exit(1)
        ml.update(loss=loss,
                  class_error=float(metrics.get("class_error", 0.0)))
    return state, {k: m.global_avg for k, m in ml.meters.items()}


def train_one_epoch_self_training(
    state, model, tx, loader: Iterable, ccfg: CriterionCfg,
    weight_dict: Dict[str, float], class_thresholds, canvas_hw,
    epoch: int, logger=None, print_freq: int = 10,
):
    ml = MetricLogger(logger=logger)
    thr = jnp.asarray(class_thresholds)
    for batch in ml.log_every(loader, print_freq,
                              f"SelfTrain Epoch: [{epoch}]"):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = train_step_self_training(
            state, batch, model, tx, ccfg, weight_dict, thr,
            canvas_hw=tuple(canvas_hw),
        )
        loss = float(metrics["loss"])
        if not math.isfinite(loss):
            print(f"Loss is {loss}, stopping training", file=sys.stderr)
            sys.exit(1)
        ml.update(loss=loss, num_pseudo=float(metrics["num_pseudo"]))
    return state, {k: m.global_avg for k, m in ml.meters.items()}


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
) -> Dict:
    """Run detection eval, return the 12 COCO stats
    (engine.py:349-513 -> stats['coco_eval_bbox']). With save_results_path,
    raw per-image gt/pred arrays are dumped for offline diffing (equivalent
    of --save_results, engine.py:433-492)."""
    evaluator = CocoEvaluator(categories)
    dumped = [] if save_results_path else None
    ml = MetricLogger(logger=logger)
    for batch in ml.log_every(loader, print_freq, "Test:"):
        arrays = {k: jnp.asarray(v) for k, v in batch.items()
                  if k in ("images", "pad_mask", "orig_sizes")}
        res = eval_step(params, arrays, model, num_select=num_select)
        res = jax.device_get(res)
        for i in range(len(batch["image_ids"])):
            if not batch["batch_valid"][i]:
                continue
            oh, ow = batch["orig_sizes"][i]
            # GT boxes back to absolute xyxy in orig coords
            gb = np.asarray(batch["boxes"][i], np.float64)
            gv = np.asarray(batch["valid"][i], bool)
            gl = np.asarray(batch["labels"][i])
            cx, cy, w_, h_ = gb[:, 0], gb[:, 1], gb[:, 2], gb[:, 3]
            xyxy = np.stack(
                [cx - w_ / 2, cy - h_ / 2, cx + w_ / 2, cy + h_ / 2], 1
            ) * np.array([ow, oh, ow, oh])
            evaluator.add_image(
                int(batch["image_ids"][i]),
                xyxy[gv], gl[gv],
                res["boxes"][i], res["scores"][i], res["labels"][i],
            )
            if dumped is not None:
                dumped.append(dict(
                    image_id=int(batch["image_ids"][i]),
                    gt_boxes=xyxy[gv], gt_labels=gl[gv],
                    boxes=res["boxes"][i], scores=res["scores"][i],
                    labels=res["labels"][i],
                ))
    if dumped is not None:
        np.savez_compressed(save_results_path,
                            results=np.array(dumped, dtype=object))
    stats = evaluator.summarize()
    if logger:
        logger.info(
            "COCO stats: AP=%.4f AP50=%.4f AP75=%.4f" % tuple(stats[:3])
        )
    return {"coco_eval_bbox": stats, "ap50": stats[1]}
