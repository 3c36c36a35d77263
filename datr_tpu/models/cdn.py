"""Contrastive DeNoising (CDN) query construction — static-shape redesign.

The reference (models/dino/dn_components.py:prepare_for_cdn, :20-137) sizes its
DN groups from the per-batch max GT count, which is a dynamic shape. On TPU
everything under jit must be static, so we fix the layout from config:

  single_pad = dn_single_pad     (cap on GT used for denoising per image)
  groups     = max(1, dn_number // single_pad)   (dn_number = positive queries,
               reference semantics: dn_number*2 total pos+neg)
  pad_size   = 2 * single_pad * groups

Group g occupies slots [2g*single_pad, (2g+2)*single_pad): first half positive
(small jitter), second half negative (jitter in the 1..2 band) — the same
pos/neg layout the reference builds dynamically (dn_components.py:71-74,
104-110). Slots beyond an image's true GT count are masked via dn_valid and
padded with zero embeddings, exactly like the reference's padding_label
(:98-102).

The block self-attention mask (match queries blind to DN, DN groups blind to
each other, dn_components.py:112-124) becomes a compile-time constant.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import inverse_sigmoid
from ..utils.boxes import box_cxcywh_to_xyxy, box_xyxy_to_cxcywh


class CdnBatch(NamedTuple):
    query_label_embed: jnp.ndarray  # [B, pad_size, C]
    query_bbox_unsig: jnp.ndarray  # [B, pad_size, 4]
    dn_valid: jnp.ndarray  # [B, pad_size] bool — slot holds a real GT
    noised_labels: jnp.ndarray  # [B, pad_size] int32 (for debugging/tests)


def cdn_layout(dn_number: int, single_pad: int) -> Tuple[int, int]:
    groups = max(1, dn_number // max(1, single_pad))
    return groups, 2 * single_pad * groups


def cdn_self_attn_mask(num_queries: int, single_pad: int, groups: int) -> np.ndarray:
    """[N, N] bool, True = may attend (flax convention; the reference uses
    True = blocked). N = pad_size + num_queries. Static — build once."""
    pad_size = 2 * single_pad * groups
    n = pad_size + num_queries
    allow = np.ones((n, n), dtype=bool)
    # matching queries cannot see any DN slot
    allow[pad_size:, :pad_size] = False
    # DN group g sees only itself (plus the matching part)
    for g in range(groups):
        lo, hi = 2 * single_pad * g, 2 * single_pad * (g + 1)
        allow[lo:hi, :lo] = False
        allow[lo:hi, hi:pad_size] = False
    return allow


def build_cdn_queries(
    rng: jax.Array,
    gt_boxes: jnp.ndarray,  # [B, Nmax, 4] normalized cxcywh
    gt_labels: jnp.ndarray,  # [B, Nmax] int32
    gt_valid: jnp.ndarray,  # [B, Nmax] bool
    label_embed_table: jnp.ndarray,  # [labelbook_size + 1, C]
    num_classes: int,
    dn_number: int = 100,
    single_pad: int = 20,
    label_noise_ratio: float = 0.5,
    box_noise_scale: float = 0.4,
) -> CdnBatch:
    B = gt_boxes.shape[0]
    groups, pad_size = cdn_layout(dn_number, single_pad)

    # Cap/pad GT to single_pad entries.
    nmax = gt_boxes.shape[1]
    if nmax >= single_pad:
        boxes = gt_boxes[:, :single_pad]
        labels = gt_labels[:, :single_pad]
        valid = gt_valid[:, :single_pad]
    else:
        pad = single_pad - nmax
        boxes = jnp.pad(gt_boxes, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(gt_labels, ((0, 0), (0, pad)))
        valid = jnp.pad(gt_valid, ((0, 0), (0, pad)))

    # Tile into [B, groups, 2, single_pad, ...]: axis 2 = (positive, negative).
    boxes_t = jnp.tile(boxes[:, None, None], (1, groups, 2, 1, 1))
    labels_t = jnp.tile(labels[:, None, None], (1, groups, 2, 1))
    valid_t = jnp.tile(valid[:, None, None], (1, groups, 2, 1))

    k_flip, k_cls, k_sign, k_part = jax.random.split(rng, 4)

    # Label noise: flip with prob ratio * 0.5 to a uniform class
    # (dn_components.py:63-67 applies it to every copy, pos and neg).
    flip = (
        jax.random.uniform(k_flip, labels_t.shape) < label_noise_ratio * 0.5
    )
    rand_cls = jax.random.randint(k_cls, labels_t.shape, 0, num_classes)
    noised_labels = jnp.where(flip, rand_cls, labels_t)

    # Box noise in corner space: positives jitter within the box extent,
    # negatives in the 1..2 band (dn_components.py:75-92).
    corners = box_cxcywh_to_xyxy(boxes_t)  # [B, G, 2, S, 4]
    half_wh = jnp.concatenate([boxes_t[..., 2:] / 2.0] * 2, axis=-1)
    sign = jax.random.randint(k_sign, corners.shape, 0, 2).astype(
        jnp.float32
    ) * 2.0 - 1.0
    part = jax.random.uniform(k_part, corners.shape)
    is_neg = jnp.zeros((1, 1, 2, 1, 1)).at[:, :, 1].set(1.0)
    part = part + is_neg
    noised = corners + sign * part * half_wh * box_noise_scale
    noised = jnp.clip(noised, 0.0, 1.0)
    noised_boxes = box_xyxy_to_cxcywh(noised)

    # Flatten group/pos-neg/slot axes into the DN query axis.
    noised_labels = noised_labels.reshape(B, pad_size)
    noised_boxes = noised_boxes.reshape(B, pad_size, 4)
    dn_valid = valid_t.reshape(B, pad_size)

    embed = jnp.take(label_embed_table, noised_labels, axis=0)
    embed = jnp.where(dn_valid[..., None], embed, 0.0)
    bbox_unsig = jnp.where(
        dn_valid[..., None], inverse_sigmoid(noised_boxes), 0.0
    )
    return CdnBatch(embed, bbox_unsig, dn_valid, noised_labels)
