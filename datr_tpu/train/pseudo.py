"""Static-shape pseudo-label generation for self-training.

Reference pipeline (engine.py:199-215 + self_training_utils.py): EMA-teacher
forward on the weak-aug target images -> PostProcess(num_select) at size (1,1)
-> per-class score threshold -> scale to the padded canvas -> class-aware
NMS(0.7) -> top-100 -> renormalize by the real (unpadded) image size.

Coordinate semantics: the reference multiplies normalized boxes by the
PADDED canvas (_h,_w) before NMS and divides by the REAL size after
(self_training_utils.py:68-90). In every dataset the reference self-trains
on (Cityscapes/Foggy 1024x2048, Sim10k, BDD100k — constant-size images)
canvas == real, so the round trip is the identity: thresholding + NMS only
SELECT teacher detections, their coordinates pass through unchanged. Under
a static canvas with varying real sizes (this repo's loader) the literal
multiply/divide would instead inflate every pseudo box by canvas/real —
measured to corrupt self-training (distill e2e ap50 0.13 vs 0.53 teacher).
So: NMS decisions are made in canvas pixels exactly as the reference's,
and kept boxes are returned verbatim — identical to the reference in its
own operating regime, and correct in ours.

Here the ragged python dicts become fixed [B_t, max_pseudo] arrays with a
validity mask, computed fully in-graph (the teacher forward runs inside the
same jit as the student step — no host round-trip between them).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.postprocess import batched_nms, postprocess
from ..utils.boxes import box_cxcywh_to_xyxy


def pseudo_labels_from_outputs(
    pred_logits: jnp.ndarray,  # [Bt, N, K] teacher outputs on target half
    pred_boxes: jnp.ndarray,  # [Bt, N, 4] normalized cxcywh
    real_sizes: jnp.ndarray,  # [Bt, 2] (h, w) unpadded image sizes
    canvas_hw,  # (H, W) static padded canvas
    class_thresholds: jnp.ndarray,  # [K] per-class score thresholds
    num_select: int = 300,
    max_pseudo: int = 100,
    nms_iou: float = 0.7,
):
    """Returns (boxes [Bt, max_pseudo, 4] cxcywh normalized — the teacher's
    own normalization, passed through unchanged (see module docstring),
    labels [Bt, max_pseudo], valid [Bt, max_pseudo], img_has_pseudo [Bt]).
    real_sizes is unused for coordinates (kept for API stability; the
    reference's real-size division cancels in its operating regime)."""
    Bt = pred_logits.shape[0]
    res = postprocess(
        pred_logits, pred_boxes,
        jnp.ones((Bt, 2), jnp.float32),  # size (1,1): keep normalized
        num_select=num_select, not_to_xyxy=True,
    )
    scores, labels, boxes_cxcywh = res["scores"], res["labels"], res["boxes"]

    thr = class_thresholds[labels]  # [Bt, num_select]
    valid = scores >= thr

    H, W = canvas_hw
    xyxy = box_cxcywh_to_xyxy(boxes_cxcywh) * jnp.array(
        [W, H, W, H], jnp.float32
    )
    # invalidate below-threshold candidates for NMS via score -inf
    nms_scores = jnp.where(valid, scores, -1.0)
    keep_idx, keep_valid = batched_nms(
        xyxy, nms_scores, labels, iou_threshold=nms_iou, max_out=max_pseudo
    )

    def take(x):
        idx = keep_idx
        if x.ndim == 3:
            idx = idx[..., None]
        return jnp.take_along_axis(x, idx, axis=1)

    # kept boxes pass through in the teacher's own normalization: the
    # reference's xyxy*canvas -> /real round trip (self_training_utils.py
    # :68-90) is the identity in its constant-size regime (module docstring)
    kept_boxes = take(boxes_cxcywh)
    kept_labels = take(labels)
    kept_scores = take(jnp.where(valid, scores, -1.0))
    kept_valid = keep_valid & (kept_scores > 0)

    img_has_pseudo = kept_valid.any(axis=1)
    return kept_boxes, kept_labels, kept_valid, img_has_pseudo
