"""Jitted training/eval steps.

Equivalents of the reference engine loops (engine.py:train_one_epoch :29,
train_one_epoch_with_self_training :146, evaluate :349) with the per-step body
compiled once: forward (paired DA batch) -> criterion -> grad -> AdamW update
-> prototype state carry. EMA updates are separate pure functions invoked at
the reference's cadence (per epoch, main.py:382-386).

Batches are dicts of fixed-shape arrays:
  images   [B, H, W, 3]  first half source, second half target
  pad_mask [B, H, W]
  boxes    [B//2, T, 4] | labels [B//2, T] | valid [B//2, T]   (source GT)
  (self-training) images_strong [B, H, W, 3], real_sizes [B//2, 2]
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import optax
import jax.numpy as jnp

from .criterion import CriterionCfg, criterion, weighted_total
from .optim import zero_frozen
from .pseudo import pseudo_labels_from_outputs
from .state import TrainState


def _split_rng(state: TrainState):
    rng, sub = jax.random.split(state.rng)
    return rng, sub


@functools.partial(jax.jit,
                   static_argnames=("model", "tx", "ccfg", "ema_decay",
                                    "pp_mesh", "pp_n_micro", "pp_dp_axis"),
                   donate_argnums=(0,))
def train_step_burnin(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    model,
    tx,
    ccfg: CriterionCfg,
    weight_dict: Dict[str, float],
    ema_decay: float = 0.0,  # --use_ema per-step ModelEma (main.py:149-152)
    pp_mesh=None,  # pipeline parallelism over pp_mesh's 'pipe' axis:
    pp_n_micro: int = 0,  # GPipe microbatches (parallel/pipeline.py);
    pp_dp_axis=None,  # optional data axis the microbatch batch dim shards on
):
    rng, dn_rng = _split_rng(state)

    def loss_fn(params):
        encoder_fn = None
        if pp_n_micro:
            from ..parallel.pipeline import make_pp_encoder_fn

            # built INSIDE loss_fn so the stacked layer copies are traced
            # from the differentiated params (grads reach enc_layer{i})
            encoder_fn = make_pp_encoder_fn(
                model, params, mesh=pp_mesh, n_micro=pp_n_micro,
                dp_axis=pp_dp_axis,
            )
        out = model.apply(
            params, batch["images"], batch["pad_mask"],
            targets={k: batch[k] for k in ("boxes", "labels", "valid")},
            dn_rng=dn_rng, train=True, self_training=False,
            global_proto=state.global_proto, amount=state.amount,
            encoder_fn=encoder_fn,
        )
        losses = criterion(out, batch["labels"], batch["boxes"],
                           batch["valid"], ccfg,
                           gt_masks=batch.get("masks"))
        total = weighted_total(losses, weight_dict)
        return total, (losses, out["new_global_proto"], out["new_amount"])

    (total, (losses, new_proto, new_amount)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

    # pre-clip global grad norm (reference engine.py:93 logs grad_total_norm)
    metrics = {"loss": total, **losses,
               "grad_norm": optax.global_norm(zero_frozen(grads))}
    new_state = state.replace(
        params=new_params, opt_state=new_opt, rng=rng,
        global_proto=new_proto, amount=new_amount, step=state.step + 1,
    )
    if ema_decay > 0.0:
        from .ema import ema_update

        new_state = new_state.replace(
            model_ema=ema_update(state.model_ema, new_params, ema_decay)
        )
    return new_state, metrics


@functools.partial(jax.jit,
                   static_argnames=("model", "tx", "ccfg", "ema_decay"),
                   donate_argnums=(0,))
def train_step_plain(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    model,
    tx,
    ccfg: CriterionCfg,
    weight_dict: Dict[str, float],
    ema_decay: float = 0.0,
):
    """Single-domain supervised step: plain-DINO pretraining, full batch
    labeled, no DA branch (reference single-domain path,
    datasets/coco.py:611-640 + main.py without DA losses)."""
    rng, dn_rng = _split_rng(state)

    def loss_fn(params):
        out = model.apply(
            params, batch["images"], batch["pad_mask"],
            targets={k: batch[k] for k in ("boxes", "labels", "valid")},
            dn_rng=dn_rng, train=True, domain_adapt=False,
        )
        losses = criterion(out, batch["labels"], batch["boxes"],
                           batch["valid"], ccfg,
                           gt_masks=batch.get("masks"))
        return weighted_total(losses, weight_dict), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    new_state = state.replace(
        params=new_params, opt_state=new_opt, rng=rng, step=state.step + 1,
    )
    if ema_decay > 0.0:
        from .ema import ema_update

        new_state = new_state.replace(
            model_ema=ema_update(state.model_ema, new_params, ema_decay)
        )
    return new_state, {"loss": total, **losses,
                       "grad_norm": optax.global_norm(zero_frozen(grads))}


@functools.partial(
    jax.jit,
    static_argnames=("model", "tx", "ccfg", "canvas_hw", "num_select",
                     "max_pseudo", "ema_decay", "teacher_model"),
    donate_argnums=(0,),
)
def train_step_self_training(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    model,
    tx,
    ccfg: CriterionCfg,
    weight_dict: Dict[str, float],
    class_thresholds: jnp.ndarray,  # [K]
    canvas_hw=(800, 1344),
    num_select: int = 300,
    max_pseudo: int = 100,
    ema_decay: float = 0.0,
    teacher_model=None,       # cross-architecture distillation: a DIFFERENT
    teacher_params=None,      # (e.g. parity-config) model provides the
                              # pseudo labels instead of the student's EMA
):
    rng, dn_rng = _split_rng(state)
    B = batch["images"].shape[0]
    half = B // 2

    # --- teacher pseudo-labels on weak-aug target half (engine.py:199-215).
    # Default teacher: the student's own EMA (reference self-training).
    # Distillation mode (no reference equivalent): pass teacher_model +
    # teacher_params, e.g. a parity-architecture DATR teacher labeling for a
    # fast-config (fewer-sampling-points) student — the migration path onto
    # the opt-in throughput variant (configs/DINO/DINO_4scale_fast.py). ---
    tgt_images = batch["images"][half:]
    tgt_mask = batch["pad_mask"][half:]
    t_model = teacher_model if teacher_model is not None else model
    t_params = teacher_params if teacher_params is not None \
        else state.ema_teacher
    teacher_out = t_model.apply(t_params, tgt_images, tgt_mask, train=False)
    p_boxes, p_labels, p_valid, img_has = pseudo_labels_from_outputs(
        jax.lax.stop_gradient(teacher_out["pred_logits"]),
        jax.lax.stop_gradient(teacher_out["pred_boxes"]),
        batch["real_sizes"], canvas_hw, class_thresholds,
        num_select=num_select, max_pseudo=max_pseudo,
    )

    def loss_fn(params):
        out = model.apply(
            params, batch["images_strong"], batch["pad_mask"],
            targets={k: batch[k] for k in ("boxes", "labels", "valid")},
            dn_rng=dn_rng, train=True, self_training=True,
            global_proto=state.global_proto, amount=state.amount,
        )
        src_losses = criterion(out, batch["labels"], batch["boxes"],
                               batch["valid"], ccfg)
        tgt_losses = criterion(
            out, p_labels, p_boxes, p_valid, ccfg, target_domain=True,
            img_mask=img_has.astype(jnp.float32),
        )
        total = weighted_total(src_losses, weight_dict) + weight_dict.get(
            "loss_self_training", 1.0
        ) * weighted_total(tgt_losses, weight_dict)
        aux = (src_losses, tgt_losses, out["new_global_proto"],
               out["new_amount"])
        return total, aux

    (total, (src_l, tgt_l, new_proto, new_amount)), grads = (
        jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

    metrics = {"loss": total, "num_pseudo": p_valid.sum(),
               "grad_norm": optax.global_norm(zero_frozen(grads))}
    metrics.update(src_l)
    metrics.update({f"{k}_target": v for k, v in tgt_l.items()})
    new_state = state.replace(
        params=new_params, opt_state=new_opt, rng=rng,
        global_proto=new_proto, amount=new_amount, step=state.step + 1,
    )
    if ema_decay > 0.0:
        from .ema import ema_update

        new_state = new_state.replace(
            model_ema=ema_update(state.model_ema, new_params, ema_decay)
        )
    return new_state, metrics


@functools.partial(jax.jit,
                   static_argnames=("model", "num_select",
                                    "nms_iou_threshold", "not_to_xyxy",
                                    "with_masks"))
def eval_step(params, batch, model, num_select: int = 300,
              nms_iou_threshold: float = -1.0, not_to_xyxy: bool = False,
              with_masks: bool = False):
    """Forward + postprocess for evaluation (engine.py:349-421).

    nms_iou_threshold > 0 enables the reference's optional class-aware NMS
    (dino.py:989-992,1136 — PostProcess(nms_iou_threshold=args.nms_iou_
    threshold)); the result then carries a `valid` mask for the fixed-shape
    NMS output. not_to_xyxy keeps boxes cxcywh (reference engine.test,
    engine.py:572). with_masks adds per-detection stride-4 mask logits
    ('mask_logits' [B, num_select, h4, w4], reference postprocessors['segm']
    path engine.py:415-417) gathered by each detection's source query."""
    from ..models.postprocess import postprocess, postprocess_with_nms

    out = model.apply(params, batch["images"], batch["pad_mask"], train=False)
    if nms_iou_threshold and nms_iou_threshold > 0:
        res = postprocess_with_nms(
            out["pred_logits"], out["pred_boxes"], batch["orig_sizes"],
            num_select=num_select, nms_iou_threshold=nms_iou_threshold,
            max_out=num_select,
        )
    else:
        res = postprocess(
            out["pred_logits"], out["pred_boxes"], batch["orig_sizes"],
            num_select=num_select, not_to_xyxy=not_to_xyxy,
        )
    if with_masks:
        # f16 halves the per-image device->host fetch (tens of MB of
        # stride-4 logits over the relay); logits are well within f16 range
        # and the host tail upcasts before the bilinear finish
        pm = out["pred_masks"].astype(jnp.float16)  # [B, Q, h4, w4]
        res["mask_logits"] = jnp.take_along_axis(
            pm, res["queries"][:, :, None, None], axis=1
        )
    return res
