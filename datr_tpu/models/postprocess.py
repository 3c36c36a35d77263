"""PostProcess: model outputs -> scored boxes, plus static-shape batched NMS.

Capability match for the reference PostProcess (models/dino/dino.py:944-996):
sigmoid scores, flat top-k over (queries x classes), cxcywh->xyxy, scale to
image size, optional class-agnostic-per-image NMS. All static shapes, jittable
and batched (the reference loops per image for NMS).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..utils.boxes import box_cxcywh_to_xyxy


@functools.partial(
    jax.jit, static_argnames=("num_select", "not_to_xyxy", "test")
)
def postprocess(
    pred_logits: jnp.ndarray,  # [B, N, K]
    pred_boxes: jnp.ndarray,  # [B, N, 4] normalized cxcywh
    target_sizes: jnp.ndarray,  # [B, 2] (h, w)
    num_select: int = 300,
    not_to_xyxy: bool = False,
    test: bool = False,  # xyxy -> xywh (reference dino.py:979-981)
) -> Dict[str, jnp.ndarray]:
    B, N, K = pred_logits.shape
    num_select = min(num_select, N * K)
    prob = jax.nn.sigmoid(pred_logits).reshape(B, N * K)
    scores, topk = jax.lax.top_k(prob, num_select)  # [B, num_select]
    topk_queries = topk // K
    labels = topk % K

    boxes = pred_boxes if not_to_xyxy else box_cxcywh_to_xyxy(pred_boxes)
    if test:
        assert not not_to_xyxy
        boxes = jnp.concatenate(
            [boxes[..., :2], boxes[..., 2:] - boxes[..., :2]], axis=-1
        )
    boxes = jnp.take_along_axis(boxes, topk_queries[..., None], axis=1)

    h, w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([w, h, w, h], axis=-1).astype(boxes.dtype)
    boxes = boxes * scale[:, None, :]
    # 'queries': which decoder query produced each detection — lets the
    # segm path gather the matching pred_masks rows (reference
    # PostProcessSegm assumes 1:1 query/detection order; the flat
    # (queries x classes) top-k here can select a query several times)
    return {"scores": scores, "labels": labels, "boxes": boxes,
            "queries": topk_queries}


def postprocess_with_nms(
    pred_logits, pred_boxes, target_sizes, num_select: int = 300,
    nms_iou_threshold: float = 0.7, max_out: int = 100,
):
    """PostProcess with the optional class-aware NMS of the reference
    (dino.py:989-992, nms_iou_threshold > 0 configs). Returns fixed-size
    results with a validity mask."""
    res = postprocess(pred_logits, pred_boxes, target_sizes, num_select)
    keep_idx, keep_valid = batched_nms(
        res["boxes"], res["scores"], res["labels"],
        iou_threshold=nms_iou_threshold, max_out=max_out,
    )

    def take(x):
        idx = keep_idx
        if x.ndim == 3:
            idx = idx[..., None]
        return jnp.take_along_axis(x, idx, axis=1)

    return {
        "scores": jnp.where(keep_valid, take(res["scores"]), -1.0),
        "labels": take(res["labels"]),
        "boxes": take(res["boxes"]),
        "queries": take(res["queries"]),
        "valid": keep_valid,
    }


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_out"))
def batched_nms(
    boxes: jnp.ndarray,  # [B, M, 4] xyxy
    scores: jnp.ndarray,  # [B, M]
    labels: jnp.ndarray,  # [B, M] int — NMS is applied per class
    iou_threshold: float = 0.7,
    max_out: int = 100,
):
    """Static-shape class-aware NMS (replaces torchvision.ops.batched_nms used
    at self_training_utils.py:80 and dino.py:990). Returns (keep_idx [B,
    max_out] int32, keep_valid [B, max_out] bool) sorted by descending score.

    Implementation: offset boxes per class (so different classes never
    overlap), then greedy suppression via a scan over the top-max_out
    candidates — O(max_out * M) vectorized IoU tests, no dynamic shapes.
    """
    B, M, _ = boxes.shape
    # class offset trick
    span = jnp.max(boxes) + 1.0
    off = labels.astype(boxes.dtype)[..., None] * span
    obox = boxes + off

    order_scores, order = jax.lax.top_k(scores, M)  # sorted candidates

    def per_image(ob, sc_sorted, idx_sorted):
        b_sorted = ob[idx_sorted]  # [M, 4] sorted by score

        x0 = b_sorted[:, 0]
        y0 = b_sorted[:, 1]
        x1 = b_sorted[:, 2]
        y1 = b_sorted[:, 3]
        area = jnp.clip(x1 - x0, 0, None) * jnp.clip(y1 - y0, 0, None)

        def iou_vs(i):
            xx0 = jnp.maximum(x0[i], x0)
            yy0 = jnp.maximum(y0[i], y0)
            xx1 = jnp.minimum(x1[i], x1)
            yy1 = jnp.minimum(y1[i], y1)
            inter = jnp.clip(xx1 - xx0, 0, None) * jnp.clip(yy1 - yy0, 0, None)
            return inter / jnp.clip(area[i] + area - inter, 1e-9, None)

        def step(alive, i):
            keep_i = alive[i]
            iou = iou_vs(i)
            suppress = keep_i & (iou > iou_threshold) & (
                jnp.arange(M) > i
            )
            alive = alive & (~suppress)
            return alive, keep_i

        alive0 = jnp.ones((M,), bool)
        alive, kept_full = jax.lax.scan(step, alive0, jnp.arange(M))
        # kept_full[i] True if sorted-candidate i survived greedy suppression
        rank = jnp.where(kept_full, jnp.arange(M), M + 1)
        sel = jnp.argsort(rank)[:max_out]
        valid = kept_full[sel]
        return idx_sorted[sel].astype(jnp.int32), valid

    return jax.vmap(per_image)(obox, order_scores, order)
