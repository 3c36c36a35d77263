"""Instance/panoptic segmentation heads, mask losses and postprocessors.

Capability match for the reference's segmentation path
(models/dino/segmentation.py — DETRsegm:36-74, MaskHeadSmallConv:81-149,
MHAttentionMap:152-181, dice_loss:184-199, sigmoid_focal_loss:202-227,
PostProcessSegm:230-250, PostProcessPanoptic:253-375; wired by
``args.masks`` in build_dino, dino.py:1067-1139). The path is dead in every
shipped DATR config (masks=False) but is part of the reference's surface.

TPU-first redesign notes:
- NHWC layout throughout; the per-query mask-head fan-out (reference
  ``_expand`` flattens B*Q into the batch axis) is chunked with ``lax.map``
  so peak memory is bounded by ``query_chunk`` instead of B*Q full feature
  maps.
- Nearest upsampling uses the reference's asymmetric ``floor(i*in/out)``
  index map (torch F.interpolate mode='nearest'), not jax.image.resize's
  half-pixel convention — bit parity on odd FPN sizes.
- Mask losses take the padded+masked static-shape targets of our criterion
  (masks [B, T, h4, w4] soft in [0, 1], valid [B, T]) and run at the
  stride-4 prediction resolution against area-averaged GT — see
  loss_masks for why this replaces the reference's upsample-to-GT-size
  (segmentation.py:593 in dino.py loss_masks) under static pair padding.
- Panoptic assembly (argmax over query masks, stuff-class merging, small
  segment filtering) is host-side numpy: ragged per-image output formatting,
  off the jit path, exactly like the reference's CPU postprocessor.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# resize helpers
# ---------------------------------------------------------------------------

def nearest_resize_torch(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') for NHWC: src = floor(i*in/out).

    jax.image.resize('nearest') uses half-pixel centers and disagrees on
    non-integer ratios; the mask-head FPN hits odd sizes routinely.
    """
    H, W = x.shape[-3], x.shape[-2]
    oh, ow = size
    ih = jnp.floor(jnp.arange(oh) * (H / oh)).astype(jnp.int32)
    iw = jnp.floor(jnp.arange(ow) * (W / ow)).astype(jnp.int32)
    return x[..., ih[:, None], iw[None, :], :]


def bilinear_resize(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """align_corners=False bilinear (jax.image.resize 'linear' semantics
    match torch interpolate align_corners=False). x [..., H, W]."""
    out_shape = x.shape[:-2] + tuple(size)
    return jax.image.resize(x, out_shape, method="linear")


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

class MHAttentionMap(nn.Module):
    """Per-query multi-head 2D attention maps (softmax only, no value mix).

    Reference: segmentation.py:152-181. q [B, Q, C]; k NHWC [B, h, w, C];
    mask [B, h, w] True = padded. Returns [B, Q, heads, h, w] f32.
    """

    hidden_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, mask: Optional[jnp.ndarray] = None):
        B, Q, _ = q.shape
        h, w = k.shape[1], k.shape[2]
        hd = self.hidden_dim // self.num_heads
        q = nn.Dense(self.hidden_dim, dtype=self.dtype, name="q_linear")(q)
        # reference applies k_linear as a 1x1 conv; on NHWC that is a Dense
        # over the channel axis (segmentation.py:172)
        k = nn.Dense(self.hidden_dim, dtype=self.dtype, name="k_linear")(k)
        qh = q.reshape(B, Q, self.num_heads, hd).astype(jnp.float32)
        kh = k.reshape(B, h, w, self.num_heads, hd).astype(jnp.float32)
        logits = jnp.einsum(
            "bqnc,bhwnc->bqnhw", qh * (float(hd) ** -0.5), kh
        )
        if mask is not None:
            logits = jnp.where(
                mask[:, None, None, :, :], -jnp.inf, logits
            )
        # the reference softmaxes over heads AND space jointly
        # (weights.flatten(2), segmentation.py:179) — kept for parity
        weights = jax.nn.softmax(
            logits.reshape(B, Q, self.num_heads * h * w), axis=-1
        )
        return weights.reshape(B, Q, self.num_heads, h, w)


class MaskHeadSmallConv(nn.Module):
    """FPN-style conv mask head (reference segmentation.py:81-149).

    Processes one fused [N, h, w, dim] tensor (dim = context + heads
    channels, in that order, matching the reference's channel concat) through
    3x3 conv + GroupNorm(8) + relu blocks, merging three lateral backbone
    features at 2x-increasing resolution; emits a 1-channel logit map.
    """

    dim: int            # context_dim + n_heads
    context_dim: int    # transformer d_model
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, fpns: Sequence[jnp.ndarray]):
        c = self.context_dim
        inter = [self.dim, c // 2, c // 4, c // 8, c // 16, c // 64]

        def block(y, ch, i):
            y = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                        name=f"lay{i}")(y)
            y = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype,
                             name=f"gn{i}")(y)
            return nn.relu(y)

        x = block(x, inter[0], 1)
        x = block(x, inter[1], 2)
        for stage, (fpn, ch) in enumerate(zip(fpns, inter[2:5])):
            lateral = nn.Conv(inter[1 + stage], (1, 1), dtype=self.dtype,
                              name=f"adapter{stage + 1}")(fpn)
            # lateral is per image; x is per (image, query) — broadcast by
            # repeat (reference _expand, segmentation.py:77-78, 124-126)
            rep = x.shape[0] // lateral.shape[0]
            lateral = jnp.repeat(lateral, rep, axis=0)
            x = lateral + nearest_resize_torch(x, lateral.shape[1:3])
            x = block(x, ch, 3 + stage)
        x = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="out_lay")(x)
        return x[..., 0]  # [N, h4, w4] logits


def mask_head_forward(
    attn_map_mod: MHAttentionMap,
    mask_head_mod: MaskHeadSmallConv,
    hs_last: jnp.ndarray,      # [B, Q, C] final decoder embeddings
    src_proj: jnp.ndarray,     # [B, h32, w32, C] pre-encoder projected feat
    memory_32: jnp.ndarray,    # [B, h32, w32, C] encoder memory at stride 32
    level_mask: jnp.ndarray,   # [B, h32, w32] True = padded
    fpns: Sequence[jnp.ndarray],  # [C4, C3, C2] raw backbone laterals
    query_chunk: int = 0,
) -> jnp.ndarray:
    """DETRsegm forward tail (segmentation.py:66-74): attention maps against
    the encoder memory, fused with the projected context feature, through
    the FPN conv head. Returns pred_masks [B, Q, h4, w4] (stride-4 logits).

    query_chunk > 0 bounds peak memory: the B*Q fan-out is processed in
    chunks of at most that many (image, query) pairs (rounded down to a
    divisor of B*Q if needed so the bound always holds).
    """
    B, Q, C = hs_last.shape
    h, w = src_proj.shape[1], src_proj.shape[2]
    bbox_mask = attn_map_mod(hs_last, memory_32, level_mask)  # [B,Q,Hd,h,w]
    heads = bbox_mask.shape[2]
    att = bbox_mask.transpose(0, 1, 3, 4, 2).reshape(B * Q, h, w, heads)

    if query_chunk and query_chunk < B * Q:
        if (B * Q) % query_chunk:
            # round DOWN to the largest divisor of B*Q so the bound still
            # holds — silently running the full fan-out would be the exact
            # peak-memory blowup the option exists to prevent
            query_chunk = next(
                c for c in range(query_chunk, 0, -1) if (B * Q) % c == 0
            )
        # statically-unrolled chunks (a python loop reuses the same flax
        # submodule, so params are shared; lax.map would hide the module
        # call from flax's param machinery). Each chunk gathers ONLY its own
        # per-pair context/laterals — nothing Q-repeated is materialized at
        # full B*Q (the blowup this option exists to prevent; the stride-4
        # raw lateral alone would be tens of GB at Q=900).
        n = (B * Q) // query_chunk
        img_idx = np.arange(B * Q) // Q  # pair -> image, (b, q) raster order
        outs = []
        for i in range(n):
            sl = slice(i * query_chunk, (i + 1) * query_chunk)
            ctx_i = src_proj[img_idx[sl]]  # [qc, h, w, C]
            fused_i = jnp.concatenate(
                [ctx_i, att[sl].astype(src_proj.dtype)], axis=-1
            )
            outs.append(
                mask_head_mod(fused_i, [f[img_idx[sl]] for f in fpns])
            )
        masks = jnp.concatenate(outs, axis=0)
    else:
        ctx = jnp.repeat(src_proj, Q, axis=0)  # [B*Q, h, w, C]
        fused = jnp.concatenate([ctx, att.astype(src_proj.dtype)], axis=-1)
        masks = mask_head_mod(fused, fpns)
    return masks.reshape(B, Q, masks.shape[-2], masks.shape[-1])


# ---------------------------------------------------------------------------
# losses (reference segmentation.py:184-227, dino.py:576-604)
# ---------------------------------------------------------------------------

def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray,
              num_boxes: jnp.ndarray,
              pair_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """DICE/F-1 loss over flattened masks. inputs [P, ...] logits, targets
    same shape in {0,1}; padded pairs are excluded via pair_valid [P]."""
    probs = jax.nn.sigmoid(inputs.astype(jnp.float32))
    P = inputs.shape[0]
    probs = probs.reshape(P, -1)
    targets = targets.reshape(P, -1).astype(jnp.float32)
    if pair_valid is not None:
        v = pair_valid.astype(jnp.float32)[:, None]
        probs, targets = probs * v, targets * v
    num = 2.0 * (probs * targets).sum(-1)
    den = probs.sum(-1) + targets.sum(-1)
    loss = 1.0 - (num + 1.0) / (den + 1.0)
    if pair_valid is not None:
        loss = jnp.where(pair_valid, loss, 0.0)
    return loss.sum() / num_boxes


def mask_focal_loss(inputs: jnp.ndarray, targets: jnp.ndarray,
                    num_boxes: jnp.ndarray,
                    pair_valid: Optional[jnp.ndarray] = None,
                    alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Sigmoid focal loss, mean over pixels then sum over pairs / num_boxes
    (reference segmentation.py:202-227)."""
    x = inputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    prob = jax.nn.sigmoid(x)
    ce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = prob * t + (1.0 - prob) * (1.0 - t)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * t + (1.0 - alpha) * (1.0 - t)) * loss
    P = inputs.shape[0]
    loss = loss.reshape(P, -1).mean(-1)
    if pair_valid is not None:
        loss = jnp.where(pair_valid, loss, 0.0)
    return loss.sum() / num_boxes


def loss_masks(
    pred_masks: jnp.ndarray,   # [B, N, h, w] logits
    gt_masks: jnp.ndarray,     # [B, T, Hm, Wm] targets in [0, 1] (soft ok)
    gt_valid: jnp.ndarray,     # [B, T]
    assign: jnp.ndarray,       # [B, T] matched query per target
    num_boxes: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Criterion 'masks' term (reference dino.py:576-604): gather the
    matched predictions, focal + dice.

    TPU redesign: the loss is computed at the PREDICTION (stride-4)
    resolution against area-averaged soft GT (data/transforms.py
    finalize_example mask_stride) — the reference instead upsamples the ~N
    matched predictions to full GT resolution, which with our static
    [B, T=max_boxes] pair padding would materialize multi-GB canvas-size
    activations forward and backward. Predictions are only resized if the
    GT grid differs from the head's output grid (then bilinearly, matching
    the reference's align_corners=False interpolate)."""
    B, T = gt_valid.shape
    assign_safe = jnp.where(gt_valid, assign, 0)
    src = jnp.take_along_axis(
        pred_masks, assign_safe[:, :, None, None], axis=1
    )  # [B, T, h, w]
    if src.shape[-2:] != gt_masks.shape[-2:]:
        src = bilinear_resize(src, gt_masks.shape[-2:])
    src = src.reshape(B * T, -1)
    tgt = gt_masks.reshape(B * T, -1)
    pv = gt_valid.reshape(B * T)
    return {
        "loss_mask": mask_focal_loss(src, tgt, num_boxes, pv),
        "loss_dice": dice_loss(src, tgt, num_boxes, pv),
    }


def _bilinear_np(x: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Half-pixel-centers bilinear resize (torch F.interpolate
    align_corners=False) for [..., H, W] numpy arrays."""
    h, w = x.shape[-2], x.shape[-1]
    ys = np.clip((np.arange(oh) + 0.5) * (h / oh) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(ow) + 0.5) * (w / ow) - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    a = x[..., y0[:, None], x0[None, :]]
    b = x[..., y0[:, None], x1[None, :]]
    c = x[..., y1[:, None], x0[None, :]]
    d = x[..., y1[:, None], x1[None, :]]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def det_mask_rles(
    mask_logits: np.ndarray,   # [S, h4, w4] per-detection stride-4 logits
    canvas_hw: Tuple[int, int],
    real_hw: Tuple[int, int],   # unpadded (h, w) on the canvas
    orig_hw: Tuple[int, int],   # original image (h, w)
    chunk: int = 32,
) -> List[np.ndarray]:
    """Finish detection masks on the host: bilinear-upsample the stride-4
    logits to the padded canvas, threshold at probability 0.5 (= logit 0),
    crop each image's valid region, nearest-resize to the original size,
    RLE-encode (reference PostProcessSegm, segmentation.py:230-250 — there
    the CPU tail runs per image too; ragged original sizes keep this off
    the jit path). Chunked over detections to bound peak memory."""
    from ..utils.rle import encode_mask

    H, W = canvas_hw
    ih, iw = min(int(real_hw[0]), H), min(int(real_hw[1]), W)
    oh, ow = int(orig_hw[0]), int(orig_hw[1])
    yi = np.floor(np.arange(oh) * (ih / oh)).astype(np.int64)
    xi = np.floor(np.arange(ow) * (iw / ow)).astype(np.int64)
    out: List[np.ndarray] = []
    S = mask_logits.shape[0]
    for s in range(0, S, chunk):
        up = _bilinear_np(
            np.asarray(mask_logits[s:s + chunk], np.float32), H, W
        )
        binm = up[:, :ih, :iw] > 0.0  # sigmoid(x) > 0.5 <=> x > 0
        binm = binm[:, yi[:, None], xi[None, :]]
        out.extend(encode_mask(m) for m in binm)
    return out


# ---------------------------------------------------------------------------
# postprocessors
# ---------------------------------------------------------------------------

def postprocess_segm(
    results: List[Dict[str, np.ndarray]],
    pred_masks: jnp.ndarray,       # [B, Q, h, w] logits
    orig_target_sizes: np.ndarray,  # [B, 2] original (h, w)
    max_target_sizes: np.ndarray,   # [B, 2] post-aug (h, w)
    threshold: float = 0.5,
) -> List[Dict[str, np.ndarray]]:
    """Reference PostProcessSegm (segmentation.py:230-250): upsample to the
    batch-max padded size (bilinear), threshold, crop each image's valid
    region, nearest-resize to its original size. Host-side tail is numpy
    (ragged output sizes)."""
    max_h = int(max_target_sizes[:, 0].max())
    max_w = int(max_target_sizes[:, 1].max())
    up = bilinear_resize(pred_masks.astype(jnp.float32), (max_h, max_w))
    binm = np.asarray(jax.nn.sigmoid(up) > threshold)
    for i, (t, tt) in enumerate(zip(max_target_sizes, orig_target_sizes)):
        ih, iw = int(t[0]), int(t[1])
        m = binm[i][:, :ih, :iw]
        oh, ow = int(tt[0]), int(tt[1])
        yi = np.floor(np.arange(oh) * (ih / oh)).astype(np.int64)
        xi = np.floor(np.arange(ow) * (iw / ow)).astype(np.int64)
        results[i]["masks"] = m[:, yi[:, None], xi[None, :]].astype(np.uint8)
    return results


def postprocess_panoptic(
    pred_logits: np.ndarray,     # [Q, K]
    pred_masks: np.ndarray,      # [Q, h, w] logits
    is_thing_map: Dict[int, bool],
    processed_size: Tuple[int, int],
    target_size: Optional[Tuple[int, int]] = None,
    threshold: float = 0.85,
) -> Dict[str, np.ndarray]:
    """Single-image panoptic assembly (reference segmentation.py:268-375).

    Returns {'id_map': [H, W] int32 segment ids (-1 = void is impossible:
    argmax always assigns), 'segments_info': list of dicts}. The reference
    serializes id2rgb PNG bytes; we return the id map directly — our
    panoptic evaluator (eval/panoptic_eval.py) consumes id maps.
    """
    if target_size is None:
        target_size = processed_size
    # softmax scores; drop no-object (last class) and low confidence
    z = pred_logits - pred_logits.max(-1, keepdims=True)
    probs = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    scores, labels = probs.max(-1), probs.argmax(-1)
    keep = (labels != pred_logits.shape[-1] - 1) & (scores > threshold)
    cur_scores, cur_classes = scores[keep], labels[keep]
    cur_masks = np.asarray(
        bilinear_resize(jnp.asarray(pred_masks[keep], np.float32),
                        processed_size)
    )
    h, w = processed_size

    def assemble(masks):
        if masks.shape[0] == 0:
            return np.zeros((h, w), np.int32)
        flat = masks.reshape(masks.shape[0], -1)
        # per-pixel soft assignment: argmax over query masks
        # (reference get_ids_area, segmentation.py:313-323)
        m_id = flat.argmax(0).reshape(h, w).astype(np.int32)
        return m_id

    m_id = assemble(cur_masks)
    # merge duplicate stuff segments (segmentation.py:325-330)
    stuff: Dict[int, List[int]] = {}
    for k, lab in enumerate(cur_classes):
        if not is_thing_map.get(int(lab), True):
            stuff.setdefault(int(lab), []).append(k)
    for ids in stuff.values():
        for eq in ids[1:]:
            m_id[m_id == eq] = ids[0]

    # nearest-resize the id map to the target size
    th, tw = target_size
    yi = np.floor(np.arange(th) * (h / th)).astype(np.int64)
    xi = np.floor(np.arange(tw) * (w / tw)).astype(np.int64)
    m_id = m_id[yi[:, None], xi[None, :]]

    # drop tiny segments iteratively (reference segmentation.py:348-360)
    while cur_classes.size > 0:
        area = np.array([(m_id == i).sum() for i in range(len(cur_scores))])
        small = area <= 4
        if not small.any():
            break
        keep2 = ~small
        cur_scores, cur_classes = cur_scores[keep2], cur_classes[keep2]
        cur_masks = cur_masks[keep2]
        m_id = assemble(cur_masks)
        m_id = m_id[yi[:, None], xi[None, :]]

    segments_info = [
        {
            "id": i,
            "isthing": bool(is_thing_map.get(int(c), True)),
            "category_id": int(c),
            "area": int((m_id == i).sum()),
        }
        for i, c in enumerate(cur_classes)
    ]
    return {"id_map": m_id, "segments_info": segments_info}
