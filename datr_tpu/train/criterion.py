"""Set criterion: Hungarian-matched detection losses + DN + DA losses.

Functional rebuild of the reference SetCriterion (models/dino/dino.py:486-941):
- loss_labels (:508-532): focal loss over all queries, matched queries get
  their class, total sum / num_boxes.
- loss_boxes (:548-574): L1 + GIoU over matched pairs / num_boxes.
- loss_cardinality (:534-546): logging only.
- DN losses (:780-819): fixed group-identity matching, num_boxes * groups.
- aux/interm fan-out (:824-915): here a vmap over the stacked layer axis
  instead of a python loop over dicts.
- DA losses (:628-720): image-level BCE, prototype BCE, global-prototype
  contrastive (soft-label cross-entropy).

Targets are static-shape: boxes [B, T, 4] (normalized cxcywh), labels [B, T]
int32, valid [B, T] bool. num_boxes is the global valid count (the reference's
all_reduce / world-size dance collapses to a plain sum under SPMD jit —
gradients agree exactly).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.focal import optax_sigmoid_ce, sigmoid_focal_loss
from ..ops.matcher import batch_match
from ..utils.boxes import (
    box_cxcywh_to_xyxy,
    generalized_box_iou_elementwise,
)


class CriterionCfg(NamedTuple):
    num_classes: int
    focal_alpha: float = 0.25
    cost_class: float = 2.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    dn_single_pad: int = 20
    dn_groups: int = 5
    matcher_type: str = "HungarianMatcher"  # or "SimpleMinsumMatcher"


# ---------------------------------------------------------------------------
# matched detection losses
# ---------------------------------------------------------------------------
def detection_losses(
    logits: jnp.ndarray,  # [B, N, K]
    boxes: jnp.ndarray,  # [B, N, 4]
    gt_labels: jnp.ndarray,  # [B, T]
    gt_boxes: jnp.ndarray,  # [B, T, 4]
    gt_valid: jnp.ndarray,  # [B, T]
    assign: jnp.ndarray,  # [B, T] matched query per target
    num_boxes: jnp.ndarray,  # scalar
    focal_alpha: float,
    img_mask: jnp.ndarray | None = None,  # [B] exclude whole images
) -> Dict[str, jnp.ndarray]:
    B, N, K = logits.shape
    if img_mask is None:
        img_mask = jnp.ones((B,), jnp.float32)
    # Images excluded wholesale (reference self-training drops images with
    # zero pseudo boxes from the target loss, self_training_utils.py:103-137).
    gt_valid = gt_valid & (img_mask > 0)[:, None]
    valid_f = gt_valid.astype(jnp.float32)
    assign_safe = jnp.where(gt_valid, assign, 0)
    b_idx = jnp.arange(B)[:, None]

    # --- labels ---
    onehot_t = jax.nn.one_hot(gt_labels, K) * valid_f[..., None]
    target_onehot = jnp.zeros((B, N, K)).at[b_idx, assign_safe].add(onehot_t)
    focal = sigmoid_focal_loss(
        logits.astype(jnp.float32), target_onehot, focal_alpha
    ) * img_mask[:, None, None]
    loss_ce = focal.sum() / num_boxes

    # --- boxes ---
    src_boxes = jnp.take_along_axis(
        boxes, assign_safe[..., None], axis=1
    ).astype(jnp.float32)  # [B, T, 4]
    l1 = jnp.abs(src_boxes - gt_boxes) * valid_f[..., None]
    loss_bbox = l1.sum() / num_boxes
    giou = generalized_box_iou_elementwise(
        box_cxcywh_to_xyxy(src_boxes), box_cxcywh_to_xyxy(gt_boxes)
    )
    loss_giou = ((1.0 - giou) * valid_f).sum() / num_boxes

    # --- logging-only metrics ---
    matched_logits = jnp.take_along_axis(
        logits, assign_safe[..., None], axis=1
    )
    correct = (jnp.argmax(matched_logits, -1) == gt_labels) & gt_valid
    denom = jnp.clip(valid_f.sum(), 1.0, None)
    class_error = 100.0 * (1.0 - correct.sum() / denom)
    # cardinality: predictions whose argmax is not the last class
    # (reference quirk, dino.py:543 — kept for log parity)
    card_pred = jnp.sum(jnp.argmax(logits, -1) != K - 1, axis=1)
    card_err = jnp.mean(
        jnp.abs(card_pred.astype(jnp.float32) - valid_f.sum(-1))
    )

    return {
        "loss_ce": loss_ce,
        "loss_bbox": loss_bbox,
        "loss_giou": loss_giou,
        "loss_xy": jax.lax.stop_gradient(l1[..., :2].sum() / num_boxes),
        "loss_hw": jax.lax.stop_gradient(l1[..., 2:].sum() / num_boxes),
        "class_error": jax.lax.stop_gradient(class_error),
        "cardinality_error": jax.lax.stop_gradient(card_err),
    }


def compute_assign(
    logits, boxes, gt_labels, gt_boxes, gt_valid, cfg: CriterionCfg
) -> jnp.ndarray:
    """Hungarian/minsum matching only: assign [B, T] query per target."""
    if cfg.matcher_type == "SimpleMinsumMatcher":
        from ..ops.matcher import detr_matching_cost, minsum_match

        def per_image(lg, pb, tl, tb, tv):
            return minsum_match(detr_matching_cost(
                lg, pb, tl, tb, tv, cfg.cost_class, cfg.cost_bbox,
                cfg.cost_giou, cfg.focal_alpha,
            ))

        return jax.vmap(per_image)(
            jax.lax.stop_gradient(logits.astype(jnp.float32)),
            jax.lax.stop_gradient(boxes.astype(jnp.float32)),
            gt_labels, gt_boxes, gt_valid,
        )
    return batch_match(
        jax.lax.stop_gradient(logits.astype(jnp.float32)),
        jax.lax.stop_gradient(boxes.astype(jnp.float32)),
        gt_labels, gt_boxes, gt_valid,
        cost_class=cfg.cost_class, cost_bbox=cfg.cost_bbox,
        cost_giou=cfg.cost_giou, focal_alpha=cfg.focal_alpha,
    )


def match_and_losses(
    logits, boxes, gt_labels, gt_boxes, gt_valid, num_boxes,
    cfg: CriterionCfg, img_mask=None,
):
    assign = compute_assign(logits, boxes, gt_labels, gt_boxes, gt_valid,
                            cfg)
    return detection_losses(
        logits, boxes, gt_labels, gt_boxes, gt_valid, assign, num_boxes,
        cfg.focal_alpha, img_mask,
    )


# ---------------------------------------------------------------------------
# DN losses (fixed identity matching inside each group)
# ---------------------------------------------------------------------------
def dn_losses(
    dn_logits: jnp.ndarray,  # [B, pad, K]
    dn_boxes: jnp.ndarray,  # [B, pad, 4]
    dn_valid: jnp.ndarray,  # [B, pad]
    gt_labels: jnp.ndarray,  # [B, T]
    gt_boxes: jnp.ndarray,  # [B, T, 4]
    num_boxes: jnp.ndarray,
    cfg: CriterionCfg,
) -> Dict[str, jnp.ndarray]:
    B, pad, K = dn_logits.shape
    sp, groups = cfg.dn_single_pad, cfg.dn_groups
    slot = jnp.arange(pad)
    is_pos = (slot // sp) % 2 == 0  # [pad] first half of each group
    tgt_idx = slot % sp  # [pad] target index within the image

    # Cap/align GT to single_pad (same slicing as cdn.build_cdn_queries).
    T = gt_labels.shape[1]
    if T >= sp:
        lab = gt_labels[:, :sp]
        box = gt_boxes[:, :sp]
    else:
        lab = jnp.pad(gt_labels, ((0, 0), (0, sp - T)))
        box = jnp.pad(gt_boxes, ((0, 0), (0, sp - T), (0, 0)))

    slot_labels = lab[:, tgt_idx]  # [B, pad]
    slot_boxes = box[:, tgt_idx]  # [B, pad, 4]
    pos_valid = dn_valid & is_pos[None, :]
    pos_f = pos_valid.astype(jnp.float32)

    norm = num_boxes * groups
    target_onehot = jax.nn.one_hot(slot_labels, K) * pos_f[..., None]
    loss_ce = (
        sigmoid_focal_loss(dn_logits.astype(jnp.float32), target_onehot,
                           cfg.focal_alpha).sum()
        / norm
    )
    l1 = jnp.abs(dn_boxes.astype(jnp.float32) - slot_boxes) * pos_f[..., None]
    loss_bbox = l1.sum() / norm
    giou = generalized_box_iou_elementwise(
        box_cxcywh_to_xyxy(dn_boxes.astype(jnp.float32)),
        box_cxcywh_to_xyxy(slot_boxes),
    )
    loss_giou = ((1.0 - giou) * pos_f).sum() / norm
    return {
        "loss_ce_dn": loss_ce,
        "loss_bbox_dn": loss_bbox,
        "loss_giou_dn": loss_giou,
    }


# ---------------------------------------------------------------------------
# DA losses
# ---------------------------------------------------------------------------
def da_image_loss(da_backbone: jnp.ndarray) -> jnp.ndarray:
    """BCE: source half -> 0, target half -> 1 (dino.py:628-643)."""
    B = da_backbone.shape[0]
    src, tgt = da_backbone[: B // 2], da_backbone[B // 2 :]
    loss_src = optax_sigmoid_ce(src, jnp.zeros_like(src)).mean()
    loss_tgt = optax_sigmoid_ce(tgt, jnp.ones_like(tgt)).mean()
    return loss_src + loss_tgt


def da_proto_loss(
    da_protos: jnp.ndarray,  # [2K, 1]
    class_map_source: jnp.ndarray,  # [K]
    class_map_target: jnp.ndarray,  # [K]
) -> jnp.ndarray:
    """Prototype adversarial BCE masked by class presence (dino.py:646-661)."""
    K = class_map_source.shape[0]
    target = jnp.concatenate([jnp.zeros((K, 1)), jnp.ones((K, 1))], axis=0)
    loss = optax_sigmoid_ce(da_protos.astype(jnp.float32), target)
    mask = jnp.concatenate([class_map_source, class_map_target])[:, None]
    return (loss * mask).mean()


def da_contrast_loss(
    query_source: jnp.ndarray,  # [K, C]
    query_target: jnp.ndarray,  # [K, C]
    class_map_source: jnp.ndarray,  # [K]
    class_map_target: jnp.ndarray,  # [K]
    global_proto: jnp.ndarray,  # [K, C]
) -> jnp.ndarray:
    """InfoNCE-vs-global-prototypes with soft-label CE (dino.py:665-720).

    Normalization uses rsqrt(|x|^2 + eps): prototype rows of absent classes
    are exactly zero, and d||x||/dx at 0 is NaN in JAX (torch defines the
    subgradient as 0) — the eps keeps both value and gradient finite."""

    def normalize(x):
        return x * jax.lax.rsqrt(
            jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12
        )

    g = normalize(jax.lax.stop_gradient(global_proto))
    K = g.shape[0]

    def one_side(q, cmap):
        logits = normalize(q) @ g.T  # [K, K]
        label = jnp.eye(K) * cmap  # soft labels, rows of absent classes are 0
        return (-(label * jax.nn.log_softmax(logits, -1)).sum(-1)).mean()

    return one_side(query_source, class_map_source) + one_side(
        query_target, class_map_target
    )


# ---------------------------------------------------------------------------
# full criterion
# ---------------------------------------------------------------------------
def criterion(
    outputs: Dict[str, Any],
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: CriterionCfg,
    target_domain: bool = False,
    num_boxes: jnp.ndarray | None = None,
    img_mask: jnp.ndarray | None = None,
    gt_masks: jnp.ndarray | None = None,  # [B, T, h4, w4] in [0, 1]
) -> Dict[str, jnp.ndarray]:
    """Compute every loss for one domain's outputs.

    For the source domain, outputs uses plain keys; for the target
    (self-training) domain pass target_domain=True and the *_target keys are
    read (reference renames them, dino.py:739-746); DN/DA are skipped there.
    img_mask [B] excludes whole images (zero-pseudo-label images).
    gt_masks + outputs['pred_masks'] enable the segmentation term
    (final layer only — reference skips aux/interm masks, dino.py:836-907).
    """
    sfx = "_target" if target_domain else ""
    if img_mask is not None:
        gt_valid = gt_valid & (img_mask > 0)[:, None]
    if num_boxes is None:
        num_boxes = jnp.clip(gt_valid.sum().astype(jnp.float32), 1.0, None)

    losses: Dict[str, jnp.ndarray] = {}

    # final layer (assign computed once and shared with loss_masks, like
    # the reference's get_loss reusing one `indices` for label/box/mask)
    final_assign = compute_assign(
        outputs["pred_logits" + sfx], outputs["pred_boxes" + sfx],
        gt_labels, gt_boxes, gt_valid, cfg,
    )
    losses.update(
        detection_losses(
            outputs["pred_logits" + sfx], outputs["pred_boxes" + sfx],
            gt_labels, gt_boxes, gt_valid, final_assign, num_boxes,
            cfg.focal_alpha, img_mask,
        )
    )

    # segmentation masks (reference loss_masks, dino.py:576-604; final
    # layer only — aux/interm masks are skipped as "too costly")
    if gt_masks is not None and ("pred_masks" + sfx) in outputs:
        from ..models.segmentation import loss_masks as _loss_masks

        losses.update(_loss_masks(
            outputs["pred_masks" + sfx], gt_masks, gt_valid, final_assign,
            num_boxes,
        ))

    # aux layers — vmap over the stacked layer axis (dino.py:824-845)
    aux_logits = outputs["aux_logits" + sfx]
    aux_boxes = outputs["aux_boxes" + sfx]

    def one_layer(lg, bx):
        return match_and_losses(
            lg, bx, gt_labels, gt_boxes, gt_valid, num_boxes, cfg, img_mask
        )

    aux = jax.vmap(one_layer)(aux_logits, aux_boxes)
    n_aux = aux_logits.shape[0]
    for i in range(n_aux):
        for k, v in aux.items():
            losses[f"{k}_{i}"] = v[i]

    # interm (two-stage encoder output, dino.py:873-893)
    interm = match_and_losses(
        outputs["interm_logits" + sfx], outputs["interm_boxes" + sfx],
        gt_labels, gt_boxes, gt_valid, num_boxes, cfg, img_mask,
    )
    losses.update({f"{k}_interm": v for k, v in interm.items()})

    if not target_domain and "dn_logits" in outputs:
        dn_logits = outputs["dn_logits"]  # [n_dec, B, pad, K]
        dn_boxes = outputs["dn_boxes"]
        dn_valid = outputs["dn_valid"]

        def one_dn(lg, bx):
            return dn_losses(lg, bx, dn_valid, gt_labels, gt_boxes,
                             num_boxes, cfg)

        dn = jax.vmap(one_dn)(dn_logits, dn_boxes)
        n_dec = dn_logits.shape[0]
        for k, v in dn.items():
            losses[k] = v[-1]
            for i in range(n_dec - 1):
                losses[f"{k}_{i}"] = v[i]

    if not target_domain and "da_backbone" in outputs:
        losses["loss_backbone_DA"] = da_image_loss(outputs["da_backbone"])
        losses["loss_proto_DA"] = da_proto_loss(
            outputs["da_protos"], outputs["da_class_map_source"],
            outputs["da_class_map_target"],
        )
        losses["loss_global_proto_DA"] = da_contrast_loss(
            outputs["da_query_source"], outputs["da_query_target"],
            outputs["da_class_map_source"], outputs["da_class_map_target"],
            outputs["new_global_proto"],
        )
    return losses


def build_weight_dict(
    dec_layers: int = 6,
    cls_loss_coef: float = 1.0,
    bbox_loss_coef: float = 5.0,
    giou_loss_coef: float = 2.0,
    da_backbone_loss_coef: float = 0.1,
    da_proto_loss_coef: float = 0.1,
    da_global_proto_coef: float = 0.1,
    interm_loss_coef: float = 1.0,
    no_interm_box_loss: bool = False,
    use_dn: bool = True,
    masks: bool = False,
    mask_loss_coef: float = 1.0,
    dice_loss_coef: float = 1.0,
) -> Dict[str, float]:
    """Reference: dino.py:1071-1127 (mask coefs :1099-1101)."""
    w = {
        "loss_ce": cls_loss_coef,
        "loss_bbox": bbox_loss_coef,
        "loss_giou": giou_loss_coef,
    }
    if masks:
        w["loss_mask"] = mask_loss_coef
        w["loss_dice"] = dice_loss_coef
    base = dict(w)
    w["loss_backbone_DA"] = da_backbone_loss_coef
    w["loss_proto_DA"] = da_proto_loss_coef
    w["loss_global_proto_DA"] = da_global_proto_coef
    if use_dn:
        w["loss_ce_dn"] = cls_loss_coef
        w["loss_bbox_dn"] = bbox_loss_coef
        w["loss_giou_dn"] = giou_loss_coef
    clean = {
        k: v for k, v in w.items()
        if k.startswith("loss_") and not k.endswith("_DA")
    }
    for i in range(dec_layers - 1):
        w.update({f"{k}_{i}": v for k, v in clean.items()})
    interm_box = 0.0 if no_interm_box_loss else 1.0
    w["loss_ce_interm"] = base["loss_ce"] * interm_loss_coef
    w["loss_bbox_interm"] = base["loss_bbox"] * interm_loss_coef * interm_box
    w["loss_giou_interm"] = base["loss_giou"] * interm_loss_coef * interm_box
    return w


def weighted_total(
    losses: Dict[str, jnp.ndarray], weight_dict: Dict[str, float]
) -> jnp.ndarray:
    total = jnp.float32(0.0)
    for k, v in losses.items():
        if k in weight_dict:
            total = total + weight_dict[k] * v
    return total
