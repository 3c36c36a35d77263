"""CIoU / DIoU box losses (reference: util/box_loss.py:7,58 — present but
unused by the default configs; provided for capability parity)."""

from __future__ import annotations

import jax.numpy as jnp

from .boxes import box_iou_elementwise


def diou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise DIoU loss between aligned xyxy boxes [..., 4] -> [...]."""
    iou, _ = box_iou_elementwise(boxes1, boxes2)
    c1 = (boxes1[..., :2] + boxes1[..., 2:]) / 2.0
    c2 = (boxes2[..., :2] + boxes2[..., 2:]) / 2.0
    center_dist = jnp.sum((c1 - c2) ** 2, axis=-1)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    diag = jnp.sum((rb - lt) ** 2, axis=-1)
    return 1.0 - iou + center_dist / jnp.clip(diag, 1e-8, None)


def ciou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise CIoU loss: DIoU + aspect-ratio consistency term."""
    iou, _ = box_iou_elementwise(boxes1, boxes2)
    d = diou_loss(boxes1, boxes2)
    w1 = jnp.clip(boxes1[..., 2] - boxes1[..., 0], 1e-8, None)
    h1 = jnp.clip(boxes1[..., 3] - boxes1[..., 1], 1e-8, None)
    w2 = jnp.clip(boxes2[..., 2] - boxes2[..., 0], 1e-8, None)
    h2 = jnp.clip(boxes2[..., 3] - boxes2[..., 1], 1e-8, None)
    v = (4.0 / jnp.pi ** 2) * (
        jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)
    ) ** 2
    alpha = v / jnp.clip(1.0 - iou + v, 1e-8, None)
    return d + alpha * v
