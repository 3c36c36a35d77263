"""Flagship-scale distillation accuracy-retention measurement (VERDICT r4
#4).

The fast config (P=2 sampling points, 24.95 img/s measured vs 12.99 parity —
tools/benchmark.py, ROADMAP round 4) is the shipped single-chip lever past
the MSDA gather wall, and its migration path from parity checkpoints is
cross-architecture distillation (main.py --distill_teacher_ckpt; reference
self-training loop engine.py:146-259). tests/test_e2e_distill.py proves the
bridge at toy scale (hidden 32, 96x128); THIS tool measures the retention
number at FLAGSHIP width — hidden 256 / 8 heads / 6+6 layers / R50 — on a
C2F-shaped synthetic domain pair (8 foreground classes, fog-corrupted
target), the regime the claim "1.91x with acceptable accuracy loss" needs.

Phases (one process, chip-friendly bf16+remat):
  1. teacher: parity arch (P=4), supervised on the FOG domain — the
     stand-in for "a good parity checkpoint" — then fog-val AP50.
  2. student: fast arch (P=2), burn-in on CLEAR labels, then teacher
     pseudo-labels on fog (reference burn_epochs schedule), fog-val AP50.
  3. (--scratch) equal-budget from-scratch fast baseline, clear labels only.

Prints one JSON line per phase plus a final
{"retention": ap_student/ap_teacher, ...} verdict line.

Usage (real chip): python tools/distill_retention.py --steps 1500
CPU smoke:        python tools/distill_retention.py --cpu --tiny --steps 40
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(**kw):
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=1500,
                    help="teacher train steps; the student gets the same "
                         "total budget (half burn-in, half self-training)")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--canvas", type=int, nargs=2, default=(320, 640))
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 512),
                    help="synthetic source-image size")
    ap.add_argument("--classes", type=int, default=8,
                    help="foreground classes (9-class C2F shape with bg)")
    ap.add_argument("--images", type=int, default=64,
                    help="per-domain train images")
    ap.add_argument("--val_images", type=int, default=32)
    ap.add_argument("--fog", type=float, default=0.55)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--threshold", type=float, default=0.45,
                    help="pseudo-label score threshold (reference default "
                         "0.3; see test_e2e_distill.py rationale)")
    ap.add_argument("--max_objects", type=int, default=6)
    ap.add_argument("--scratch", action="store_true",
                    help="also run the from-scratch fast baseline")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="hidden-32 arch for CPU smoke runs")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from datr_tpu.data.coco import DAPairedDataset
    from datr_tpu.data.loader import make_da_loader, make_eval_loader
    from datr_tpu.data.synthetic import SyntheticDetectionDataset
    from datr_tpu.data.transforms import DATrainTransform, EvalTransform
    from datr_tpu.engine import evaluate
    from datr_tpu.models.dino import DINO
    from datr_tpu.train.criterion import CriterionCfg, build_weight_dict
    from datr_tpu.train.optim import make_optimizer
    from datr_tpu.train.state import create_train_state
    from datr_tpu.train.steps import train_step_burnin, \
        train_step_self_training

    K = args.classes + 1
    canvas = tuple(args.canvas)
    hw = tuple(args.hw)

    def make_model(points):
        if args.tiny:
            return DINO(num_classes=K, num_queries=16, hidden_dim=32,
                        nheads=2, enc_layers=1, dec_layers=2,
                        dim_feedforward=64, dn_number=4, dn_single_pad=4,
                        dn_labelbook_size=K, enc_n_points=points,
                        dec_n_points=points, use_remat=False)
        # the flagship DINO-R50 4-scale arch (configs/DINO/DINO_4scale.py),
        # bf16+remat as trained on chip (ROADMAP train-step profile)
        return DINO(num_classes=K, num_queries=300, hidden_dim=256,
                    nheads=8, enc_layers=6, dec_layers=6,
                    dim_feedforward=2048, dn_number=100, dn_single_pad=10,
                    dn_labelbook_size=K, enc_n_points=points,
                    dec_n_points=points, use_remat=True,
                    dtype=jnp.bfloat16)

    HD = 32 if args.tiny else 256
    dn_groups = 1 if args.tiny else 5
    max_boxes = max(args.max_objects + 2, 8)
    clear = SyntheticDetectionDataset(args.images, hw=hw,
                                      num_classes=args.classes,
                                      max_objects=args.max_objects, seed=0)
    fog = SyntheticDetectionDataset(args.images, hw=hw,
                                    num_classes=args.classes,
                                    max_objects=args.max_objects, seed=1,
                                    fog=args.fog)
    val = SyntheticDetectionDataset(args.val_images, hw=hw,
                                    num_classes=args.classes,
                                    max_objects=args.max_objects, seed=11,
                                    fog=args.fog)
    short = int(min(hw) * 0.9)
    tf = DATrainTransform(
        scales=[int(short * 0.85), short], max_size=max(canvas),
        scales2_resize=[int(short * 0.7), int(short * 0.85)],
        scales2_crop=[int(short * 0.6), int(short * 0.9)],
    )
    ev_loader = make_eval_loader(val, args.batch, canvas,
                                 EvalTransform(short, max(canvas)),
                                 max_boxes=max_boxes)
    ccfg = CriterionCfg(num_classes=K, dn_single_pad=(4 if args.tiny
                                                      else 10),
                        dn_groups=dn_groups)
    wd = build_weight_dict(dec_layers=2 if args.tiny else 6)

    def loader(ds, epoch, seed):
        return make_da_loader(ds, args.batch, canvas, tf,
                              max_boxes=max_boxes, seed=seed, epoch=epoch,
                              num_threads=4)

    def init_state(model, batch0, seed):
        params = model.init(
            jax.random.PRNGKey(seed), jnp.asarray(batch0["images"]),
            jnp.asarray(batch0["pad_mask"]),
            targets={k: jnp.asarray(batch0[k])
                     for k in ("boxes", "labels", "valid")},
            dn_rng=jax.random.PRNGKey(seed + 1), train=True,
            global_proto=jnp.zeros((K, HD)), amount=jnp.zeros((K,)),
        )
        tx = make_optimizer(params, lr=args.lr, lr_backbone=args.lr / 10)
        return create_train_state(params, tx, K, HD,
                                  jax.random.PRNGKey(seed + 2)), tx

    def run_burnin(model, tx, state, ds, steps, seed, tag):
        t0, done, epoch = time.time(), 0, 0
        while done < steps:
            for batch in loader(ds, epoch, seed):
                arrays = {k: jnp.asarray(v) for k, v in batch.items()
                          if k not in ("images_strong", "real_sizes")}
                state, m = train_step_burnin(state, arrays, model, tx,
                                             ccfg, wd)
                done += 1
                if done % 100 == 0:
                    log(phase=tag, step=done,
                        loss=float(m["loss"]),
                        sec_per_step=(time.time() - t0) / done)
                if done >= steps:
                    break
            epoch += 1
        log(phase=tag, steps=done, train_s=round(time.time() - t0, 1))
        return state

    # ---- 1. teacher: parity arch, fog-supervised ----
    teacher = make_model(4)
    fogfog = DAPairedDataset(fog, fog, strong_aug=True)
    batch0 = next(iter(loader(fogfog, 0, 0)))
    t_state, t_tx = init_state(teacher, batch0, seed=0)
    t_state = run_burnin(teacher, t_tx, t_state, fogfog, args.steps, 0,
                         "teacher")
    ap_teacher = evaluate(t_state.params, teacher, ev_loader,
                          val.categories)["ap50"]
    log(phase="teacher_eval", ap50=float(ap_teacher))

    # ---- 2. student: fast arch, burn-in on clear then distill on fog ----
    da = DAPairedDataset(clear, fog, strong_aug=True)
    student = make_model(2)
    d_state, d_tx = init_state(student, batch0, seed=10)
    d_state = run_burnin(student, d_tx, d_state, da, args.steps // 2, 1,
                         "student_burnin")
    thr = jnp.full((K,), args.threshold, jnp.float32)
    t0, done, epoch, n_pseudo = time.time(), 0, 0, 0
    while done < args.steps - args.steps // 2:
        for batch in loader(da, 1000 + epoch, 1):
            arrays = {k: jnp.asarray(v) for k, v in batch.items()}
            d_state, m = train_step_self_training(
                d_state, arrays, student, d_tx, ccfg, wd, thr,
                canvas_hw=canvas, num_select=100, max_pseudo=max_boxes,
                teacher_model=teacher, teacher_params=t_state.params,
            )
            done += 1
            n_pseudo += int(m["num_pseudo"])
            if done % 100 == 0:
                log(phase="student_distill", step=done,
                    loss=float(m["loss"]), pseudo=n_pseudo,
                    sec_per_step=(time.time() - t0) / done)
            if done >= args.steps - args.steps // 2:
                break
        epoch += 1
    log(phase="student_distill", steps=done, pseudo=n_pseudo,
        train_s=round(time.time() - t0, 1))
    ap_student = evaluate(d_state.params, student, ev_loader,
                          val.categories)["ap50"]
    log(phase="student_eval", ap50=float(ap_student))

    ap_scratch = None
    if args.scratch:
        s_state, s_tx = init_state(student, batch0, seed=10)
        s_state = run_burnin(student, s_tx, s_state, da, args.steps, 1,
                             "scratch")
        ap_scratch = float(evaluate(s_state.params, student, ev_loader,
                                    val.categories)["ap50"])
        log(phase="scratch_eval", ap50=ap_scratch)

    out = {
        "retention": float(ap_student) / max(1e-9, float(ap_teacher)),
        "ap50_teacher": float(ap_teacher),
        "ap50_student": float(ap_student),
        "steps": args.steps, "canvas": list(canvas),
        "classes": args.classes, "fog": args.fog,
        "arch": "tiny" if args.tiny else "flagship-256/8h/6+6/R50",
        "pseudo_total": n_pseudo,
    }
    if ap_scratch is not None:
        out["ap50_scratch"] = ap_scratch
    log(**out)


if __name__ == "__main__":
    main()
