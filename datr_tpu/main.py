"""Training driver CLI.

Capability match for the reference main.py (:87-563) + main_teacher.py:
config load + CLI overrides, model/criterion build, datasets, the
burn-in -> self-training epoch schedule, per-epoch eval of student + EMA
teacher + best-EMA model, best-checkpoint families keyed on AP50, auto-resume,
JSON log lines.

Usage:
  python -m datr_tpu.main --config_file configs/DA/Cityscapes2FoggyCityscapes\
/DINO_4scale_C2F.py --data_root /data --output_dir runs/c2f \
      [--options lr=2e-4 ...] [--eval] [--resume path] [--synthetic]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import apply_overrides, load_config
from .data.coco import DAPairedDataset, build_dataset
from .data.loader import (
    make_da_loader,
    make_eval_loader,
    make_single_loader,
)
from .data.synthetic import SyntheticDetectionDataset, synthetic_da_pair
from .data.transforms import (
    DATrainTransform,
    EvalTransform,
    SingleDomainTrainTransform,
)
from .engine import (
    evaluate,
    train_one_epoch,
    train_one_epoch_plain,
    train_one_epoch_self_training,
    update_emas_per_epoch,
)
from .models import build_model
from .train.checkpoint import BestTracker, maybe_auto_resume, save_checkpoint
from .train.optim import make_optimizer
from .train.state import create_train_state
from .utils.logger import setup_logger


def get_args_parser():
    p = argparse.ArgumentParser("DATR-TPU trainer", add_help=False)
    p.add_argument("--config_file", "-c", required=True)
    p.add_argument("--options", nargs="+", default=[])
    p.add_argument("--data_root", default="data")
    p.add_argument("--output_dir", default="runs/exp")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--ema", action="store_true",
                   help="with --eval: evaluate the --use_ema ModelEma track "
                        "instead of the student (scripts/DINO_eval_ema.sh; "
                        "reference inference_ema_model.py:91)")
    p.add_argument("--resume", default="")
    p.add_argument("--pretrain_model_path", default="")
    p.add_argument("--finetune_ignore", nargs="+", default=[],
                   help="param-name keywords to NOT load from the pretrain "
                        "checkpoint (main.py:247-271)")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic dataset (smoke runs)")
    p.add_argument("--save_results", action="store_true",
                   help="dump raw eval gt/pred arrays (engine.py:433-492)")
    p.add_argument("--debug", action="store_true",
                   help="break epochs after a few iters (engine.py:125-128)")
    # reference-CLI parity flags (reference main.py:38-73)
    p.add_argument("--dataset_file", default="",
                   help="override the config's dataset_file")
    p.add_argument("--note", default="",
                   help="free-text note recorded in config_args_all.json")
    p.add_argument("--num_workers", type=int, default=4,
                   help="host loader threads (reference DataLoader workers)")
    p.add_argument("--start_epoch", type=int, default=0,
                   help="force the starting epoch (e.g. after --resume from "
                        "a params-only tree)")
    p.add_argument("--test", action="store_true",
                   help="dump COCO-format detections to results{rank}.json "
                        "(reference engine.py:527-597)")
    p.add_argument("--amp", action="store_true",
                   help="shorthand for amp_dtype='bfloat16' (reference "
                        "--amp; bf16 needs no GradScaler on TPU)")
    # cross-architecture distillation (no reference equivalent): replace the
    # EMA teacher in self-training epochs with an external teacher — e.g.
    # distill a parity-config DATR checkpoint into the opt-in fast config
    # (configs/DINO/DINO_4scale_fast.py, ~1.9x inference throughput)
    p.add_argument("--distill_teacher_ckpt", default="",
                   help="checkpoint (full TrainState or params-only family) "
                        "whose weights supply pseudo labels during "
                        "self-training epochs")
    p.add_argument("--distill_teacher_config", default="",
                   help="teacher model config (defaults to the training "
                        "config; set when the teacher architecture differs, "
                        "e.g. parity teacher -> fast student)")
    return p


def main(args):
    # multi-host SPMD init (reference: util/misc.py init_distributed_mode
    # over torch.distributed; here jax.distributed — one process per host,
    # launched by scripts/DINO_train*_dist.sh)
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    cfg = load_config(args.config_file)
    cfg = apply_overrides(cfg, args.options)
    if args.dataset_file:
        cfg["dataset_file"] = args.dataset_file
    if args.amp:
        cfg["amp_dtype"] = "bfloat16"
    # all output_dir writes are gated on process 0 (reference save_on_master /
    # is_main_process, util/misc.py) — state is replicated, so host 0's copy
    # is complete; concurrent orbax writes to a shared dir would corrupt it
    is_main = jax.process_index() == 0
    os.makedirs(args.output_dir, exist_ok=True)
    logger = setup_logger(args.output_dir, process_index=jax.process_index())
    try:  # git sha for reproducibility (reference: main.py:118)
        import subprocess

        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip()
        logger.info(f"git sha: {sha}")
    except Exception:
        pass
    logger.info(f"config: {json.dumps(dict(cfg), default=str)}")
    if is_main:
        with open(os.path.join(args.output_dir, "config_args_all.json"),
                  "w") as f:
            json.dump({**dict(cfg), **vars(args)}, f, default=str, indent=1)

    model, ccfg, weight_dict = build_model(cfg)
    canvas_hw = (cfg.get("canvas_h", 800), cfg.get("canvas_w", 1344))
    max_boxes = cfg.get("max_boxes", 100)

    # --- optional external distillation teacher (see get_args_parser) ---
    distill_model = distill_params = None
    if args.distill_teacher_ckpt:
        from .train.checkpoint import load_pretrain_params

        t_cfg = cfg
        if args.distill_teacher_config:
            # loaded verbatim: --options target the STUDENT config; applying
            # them here would silently mutate the teacher architecture (and
            # then fail the checkpoint load, or worse, not fail)
            t_cfg = load_config(args.distill_teacher_config)
        distill_model, _, _ = build_model(t_cfg)
        # param shapes are input-size independent (sine PE, convs) — init
        # on a small dummy canvas just to get the template tree. Init in
        # TRAIN mode so the template matches checkpoints saved from
        # training state (they carry DN/DA-only params like label_enc and
        # the discriminator); apply(train=False) simply never reads those.
        dummy = jnp.zeros((2, 64, 64, 3), jnp.float32)
        t_k = t_cfg.get("num_classes", 91)
        t_hd = t_cfg.get("hidden_dim", 256)
        t_template = distill_model.init(
            jax.random.PRNGKey(0), dummy, jnp.zeros((2, 64, 64), bool),
            targets=dict(
                boxes=jnp.full((1, 1, 4), 0.5), labels=jnp.zeros(
                    (1, 1), jnp.int32), valid=jnp.ones((1, 1), bool),
            ),
            dn_rng=jax.random.PRNGKey(1), train=True,
            global_proto=jnp.zeros((t_k, t_hd)), amount=jnp.zeros((t_k,)),
        )
        distill_params = load_pretrain_params(
            args.distill_teacher_ckpt, t_template
        )
        logger.info(
            f"distillation teacher: {args.distill_teacher_ckpt} "
            f"({args.distill_teacher_config or 'training config'})"
        )

    # --- datasets ---
    if args.synthetic:
        train_ds = synthetic_da_pair(
            n_images=cfg.get("synthetic_images", 16),
            num_classes=cfg.num_classes - 1,
        )
        val_ds = SyntheticDetectionDataset(
            8, num_classes=cfg.num_classes - 1, seed=1, fog=0.35
        )
        categories = val_ds.categories
    else:
        train_ds = build_dataset("train", cfg.dataset_file, args.data_root,
                                 cfg.get("strong_aug", True),
                                 return_masks=cfg.get("masks", False))
        # val never decodes per-image masks: segm-AP GT comes on demand
        # from eval_annotations(with_masks=True) RLEs, so return_masks
        # here would only burn loader time padding [max_boxes, H, W]
        # canvases that eval drops
        val_ds = build_dataset("val", cfg.dataset_file, args.data_root,
                               return_masks=False)
        categories = val_ds.category_ids() or list(
            range(1, cfg.num_classes)
        )

    single_domain = not isinstance(train_ds, DAPairedDataset) and not (
        args.synthetic
    )
    if single_domain:
        train_tf = SingleDomainTrainTransform(
            cfg.data_aug_scales, cfg.data_aug_max_size,
            cfg.data_aug_scales2_resize, cfg.data_aug_scales2_crop,
            strong_aug=cfg.get("strong_aug", False),
        )
    else:
        train_tf = DATrainTransform(
            cfg.data_aug_scales, cfg.data_aug_max_size,
            cfg.data_aug_scales2_resize, cfg.data_aug_scales2_crop,
        )
    eval_tf = EvalTransform(max(cfg.data_aug_scales), cfg.data_aug_max_size)

    # --- init state ---
    rng = jax.random.PRNGKey(args.seed)
    sample_images = jnp.zeros((2, *canvas_hw, 3))
    sample_mask = jnp.zeros((2, *canvas_hw), bool)
    sample_targets = dict(
        boxes=jnp.zeros((1, max_boxes, 4)),
        labels=jnp.zeros((1, max_boxes), jnp.int32),
        valid=jnp.zeros((1, max_boxes), bool),
    )
    params = model.init(
        rng, sample_images, sample_mask, targets=sample_targets,
        dn_rng=rng, train=True,
        global_proto=jnp.zeros((model.num_classes, model.hidden_dim)),
        amount=jnp.zeros((model.num_classes,)),
    )
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.info(f"params: {n_params / 1e6:.2f}M")

    lr_drop_step = None  # epoch-level drop handled by optax schedule on steps
    steps_per_epoch = max(len(train_ds) // cfg.batch_size, 1)
    if cfg.get("lr_drop"):
        lr_drop_step = int(cfg.lr_drop) * steps_per_epoch
    schedule_type = "step"
    if cfg.get("onecyclelr"):
        schedule_type = "onecycle"
    elif cfg.get("multi_step_lr"):
        schedule_type = "multistep"
    tx, lr_schedule = make_optimizer(
        params, lr=cfg.lr, lr_backbone=cfg.lr_backbone,
        weight_decay=cfg.weight_decay, clip_max_norm=cfg.clip_max_norm,
        lr_drop_step=lr_drop_step,
        schedule_type=schedule_type,
        lr_drop_steps=[e * steps_per_epoch
                       for e in cfg.get("lr_drop_list", [])],
        total_steps=cfg.epochs * steps_per_epoch,
        return_schedule=True,
    )
    state = create_train_state(params, tx, model.num_classes,
                               model.hidden_dim, rng)

    if args.pretrain_model_path:
        from .train.checkpoint import load_pretrain_params

        loaded_params = load_pretrain_params(
            args.pretrain_model_path, state.params
        )
        if args.finetune_ignore:
            # drop params matching ignore keywords (main.py:247-271)
            import jax.tree_util as jtu

            def keep(path, new, old):
                name = "/".join(str(getattr(p, "key", p)) for p in path)
                return old if any(k in name for k in args.finetune_ignore) \
                    else new

            loaded_params = jtu.tree_map_with_path(
                keep, loaded_params, state.params
            )
        # fresh EMA tracks (incl. the --use_ema ModelEma) start from the
        # loaded weights, matching the reference's ModelEMA-created-after-load
        # (main.py:292)
        state = state.replace(
            params=loaded_params,
            ema_teacher=jax.tree.map(jnp.copy, loaded_params),
            best_ema=jax.tree.map(jnp.copy, loaded_params),
            model_ema=jax.tree.map(jnp.copy, loaded_params),
        )
        logger.info(f"loaded pretrain weights: {args.pretrain_model_path}")
    if args.resume:
        # explicit --resume wins over auto-resume: the reference fills
        # args.resume from output_dir/checkpoint.pth only when --resume is
        # absent (main.py:226-245; scripts/DINO_eval_ema.sh passes a
        # best-family dir here)
        from .train.checkpoint import load_resume

        state, start_epoch, resume_meta = load_resume(args.resume, state)
        logger.info(f"resumed from {args.resume} (epoch {start_epoch})")
    else:
        state, start_epoch, resume_meta = maybe_auto_resume(
            args.output_dir, state)
    if args.start_epoch:
        start_epoch = args.start_epoch  # reference main.py:55

    # one re-iterable eval loader for the whole run (the reference
    # rebuilds DataLoaders; EvalLoader re-iterates cheaply)
    val_loader = make_eval_loader(val_ds, cfg.batch_size, canvas_hw, eval_tf,
                                  max_boxes,
                                  process_index=jax.process_index(),
                                  process_count=jax.process_count(),
                                  num_threads=args.num_workers)

    # reference dino.py:989-992,1136: PostProcess gets the config's
    # nms_iou_threshold (>0 enables class-aware eval NMS)
    nms_thr = float(cfg.get("nms_iou_threshold") or -1.0)
    # masks=True adds the segm-AP evaluator (reference iou_types
    # ('bbox','segm') when args.masks, engine.py:364,514-517); synthetic
    # smoke datasets carry no GT masks
    segm_eval = bool(cfg.get("masks")) and not args.synthetic

    if args.test:
        # reference --test (main.py:59, engine.py:527): dump raw COCO-format
        # detections instead of computing stats
        from .engine import test as test_dump

        eval_params = state.model_ema if args.ema else state.params
        test_dump(eval_params, model, val_loader, args.output_dir,
                  cfg.num_select, logger, nms_iou_threshold=nms_thr)
        return

    if args.eval:
        eval_params = state.model_ema if args.ema else state.params
        stats = evaluate(
            eval_params, model, val_loader, categories,
            cfg.num_select, logger,
            save_results_path=os.path.join(args.output_dir, "results.npz")
            if args.save_results else None,
            nms_iou_threshold=nms_thr, segm=segm_eval,
        )
        logger.info(json.dumps(stats))
        return stats

    best = BestTracker(args.output_dir,
                       initial_best=resume_meta.get("best"),
                       write_enabled=is_main)
    # optional TensorBoard mirror of the log.txt scalars (utils/tb.py);
    # enabled by config key, never a hard dependency
    from .utils.tb import ScalarWriter

    tb = ScalarWriter(os.path.join(args.output_dir, "tb"),
                      enabled=is_main and bool(cfg.get("use_tensorboard")))
    burn_epochs = cfg.get("burn_epochs", cfg.epochs)
    thresholds = np.full((cfg.num_classes,),
                         cfg.get("pseudo_label_threshold", 0.3), np.float32)

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        # at the lr drop, restart the student from the best EMA teacher
        # (reference: main.py:321-327)
        if epoch == cfg.get("lr_drop") and epoch > start_epoch:
            best_teacher = os.path.join(args.output_dir, "best_ema_teacher")
            if os.path.isdir(best_teacher):
                from .train.checkpoint import load_pretrain_params

                loaded = load_pretrain_params(best_teacher, state.params)
                state = state.replace(params=loaded)
                logger.info("reloaded best_ema_teacher weights at lr_drop")
        if single_domain:
            loader = make_single_loader(
                train_ds, cfg.batch_size, canvas_hw, train_tf, max_boxes,
                seed=args.seed, epoch=epoch,
                num_threads=args.num_workers,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
            )
        else:
            loader = make_da_loader(
                train_ds, cfg.batch_size, canvas_hw, train_tf, max_boxes,
                seed=args.seed, epoch=epoch,
                num_threads=args.num_workers,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                # burn-in steps never consume the strong views — skip the
                # photometric aug work on the host entirely
                compute_strong=(epoch >= burn_epochs),
            )
        if args.debug:
            import itertools

            loader = itertools.islice(loader, 4)
        # --use_ema per-step ModelEma, active from ema_epoch on
        # (reference main.py:149-152, engine per-iter ema_m.update)
        ema_decay = float(cfg.get("ema_decay", 0.9997)) if (
            cfg.get("use_ema") and epoch >= int(cfg.get("ema_epoch", 0))
        ) else 0.0
        if single_domain:
            state, train_stats = train_one_epoch_plain(
                state, model, tx, loader, ccfg, weight_dict, epoch, logger,
                ema_decay=ema_decay,
            )
        elif epoch < burn_epochs:
            state, train_stats = train_one_epoch(
                state, model, tx, loader, ccfg, weight_dict, epoch, logger,
                ema_decay=ema_decay,
            )
        else:
            state, train_stats = train_one_epoch_self_training(
                state, model, tx, loader, ccfg, weight_dict, thresholds,
                canvas_hw, epoch, logger, ema_decay=ema_decay,
                teacher_model=distill_model, teacher_params=distill_params,
            )
        state = update_emas_per_epoch(state, epoch, cfg)

        if is_main:
            save_checkpoint(os.path.join(args.output_dir, "checkpoint"),
                            jax.device_get(state), epoch, use_async=True,
                            extra={"best": best.best})
            if cfg.get("save_checkpoint_interval", 1) and (
                (epoch + 1) % cfg.save_checkpoint_interval == 0
            ):
                save_checkpoint(
                    os.path.join(args.output_dir, f"checkpoint{epoch:04d}"),
                    jax.device_get(state), epoch,
                )

        # --- per-epoch eval: student + EMA teacher (+ best-EMA after
        # burn-in), best families keyed on AP50 (main.py:416-515) ---
        stats = evaluate(state.params, model, val_loader, categories,
                         cfg.num_select, logger, nms_iou_threshold=nms_thr,
                         segm=segm_eval)
        best.update("checkpoint_best_regular", stats["ap50"],
                    jax.device_get(state.params), epoch)
        t_stats = evaluate(state.ema_teacher, model, val_loader,
                           categories, cfg.num_select, logger,
                           nms_iou_threshold=nms_thr, segm=segm_eval)
        best.update("best_ema_teacher", t_stats["ap50"],
                    jax.device_get(state.ema_teacher), epoch)
        if cfg.get("use_ema"):
            # 4th family: the --use_ema ModelEma track (main.py:448-457)
            e_stats = evaluate(state.model_ema, model, val_loader,
                               categories, cfg.num_select, logger,
                               nms_iou_threshold=nms_thr, segm=segm_eval)
            best.update("checkpoint_best_ema", e_stats["ap50"],
                        jax.device_get(state.model_ema), epoch)
        log_line = {
            "epoch": epoch,
            "lr": float(lr_schedule(int(state.step))),
            **{f"train_{k}": v for k, v in train_stats.items()},
            "ap50_student": stats["ap50"],
            "ap50_teacher": t_stats["ap50"],
            **({"ap50_ema": e_stats["ap50"]} if cfg.get("use_ema") else {}),
            "time": time.time() - t0,
        }
        if epoch >= burn_epochs:
            b_stats = evaluate(state.best_ema, model, val_loader,
                               categories, cfg.num_select, logger,
                               nms_iou_threshold=nms_thr, segm=segm_eval)
            best.update("best_ema_model", b_stats["ap50"],
                        jax.device_get(state.best_ema), epoch)
            log_line["ap50_best_ema"] = b_stats["ap50"]
        if is_main:
            from .train.checkpoint import update_checkpoint_meta

            # record post-eval best-family state in the resumable checkpoint
            update_checkpoint_meta(
                os.path.join(args.output_dir, "checkpoint"),
                {"best": best.best},
            )
            with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
                f.write(json.dumps(log_line) + "\n")
            tb.write(epoch, log_line)
        logger.info(json.dumps(log_line))
    tb.close()


def cli():
    """Console entry point (`datr-train`, pyproject.toml) — same surface as
    `python -m datr_tpu.main`."""
    parser = argparse.ArgumentParser("DATR-TPU", parents=[get_args_parser()])
    main(parser.parse_args())


if __name__ == "__main__":
    cli()
