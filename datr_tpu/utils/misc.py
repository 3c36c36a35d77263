"""Small numeric helpers shared across the framework.

Equivalents of the reference's util/misc.py:inverse_sigmoid (:587) and
models/dino/utils.py:gen_sineembed_for_position (:138) /
gen_encoder_output_proposals (:15), reworked batch-first and static-shape.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def sine_embed_for_position(pos: jnp.ndarray, num_feats: int = 128) -> jnp.ndarray:
    """Sine embedding of normalized positions.

    pos: [..., 2] or [..., 4] (x, y[, w, h]) in [0,1].
    Returns [..., 2*num_feats] or [..., 4*num_feats], ordered (y, x[, w, h])
    to match the reference (models/dino/utils.py:138-164).
    """
    scale = 2.0 * math.pi
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = 10000.0 ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)

    def embed(coord):
        p = coord[..., None] * scale / dim_t
        return jnp.stack(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
        ).reshape(*p.shape[:-1], num_feats)

    pos_x = embed(pos[..., 0])
    pos_y = embed(pos[..., 1])
    if pos.shape[-1] == 2:
        return jnp.concatenate([pos_y, pos_x], axis=-1)
    pos_w = embed(pos[..., 2])
    pos_h = embed(pos[..., 3])
    return jnp.concatenate([pos_y, pos_x, pos_w, pos_h], axis=-1)


def level_start_indices(spatial_shapes: Sequence[Tuple[int, int]]):
    """Static start offset of each level inside the flattened token axis."""
    starts = [0]
    for h, w in spatial_shapes[:-1]:
        starts.append(starts[-1] + h * w)
    return tuple(starts)


def total_tokens(spatial_shapes: Sequence[Tuple[int, int]]) -> int:
    return sum(h * w for h, w in spatial_shapes)
