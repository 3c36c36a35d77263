"""Sine position embeddings with separate H/W temperatures.

Functional equivalent of the reference's PositionEmbeddingSineHW
(models/dino/position_encoding.py:62-108): cumulative-sum of the not-padded
mask along each axis, normalized to [0, 2pi], embedded with per-axis
temperatures (configs use 20/20). Batch-first, channels-last.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


def position_embedding_sine_hw(
    mask: jnp.ndarray,  # [B, H, W]  True = padding
    num_pos_feats: int = 128,
    temperature_h: float = 10000.0,
    temperature_w: float = 10000.0,
    normalize: bool = True,
    scale: float = 2.0 * math.pi,
) -> jnp.ndarray:
    """Returns [B, H, W, 2*num_pos_feats] (y-embed then x-embed)."""
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    def embed(coord, temperature):
        dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
        dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
        p = coord[..., None] / dim_t
        return jnp.stack(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
        ).reshape(*p.shape[:-1], num_pos_feats)

    pos_y = embed(y_embed, temperature_h)
    pos_x = embed(x_embed, temperature_w)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class PositionEmbeddingLearned(nn.Module):
    """Learned absolute row/column embeddings
    (reference: position_encoding.py:110-135; configs default to sine)."""

    num_pos_feats: int = 128
    max_size: int = 50

    @nn.compact
    def __call__(self, mask: jnp.ndarray) -> jnp.ndarray:
        B, H, W = mask.shape
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (self.max_size, self.num_pos_feats))
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (self.max_size, self.num_pos_feats))
        i = jnp.clip(jnp.arange(W), 0, self.max_size - 1)
        j = jnp.clip(jnp.arange(H), 0, self.max_size - 1)
        x_emb = col[i]  # [W, F]
        y_emb = row[j]  # [H, F]
        pos = jnp.concatenate(
            [
                jnp.tile(x_emb[None, :, :], (H, 1, 1)),
                jnp.tile(y_emb[:, None, :], (1, W, 1)),
            ],
            axis=-1,
        )
        return jnp.tile(pos[None], (B, 1, 1, 1))
