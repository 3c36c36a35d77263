"""Shared flax building blocks: MLP head and the MSDeformAttn module.

MSDeformAttn mirrors the projection/softmax/sampling-location computation of
the reference module (models/dino/ops/modules/ms_deform_attn.py:78-126) and its
directional-bias initialization (:62-76), but is batch-first and calls the
TPU-native sampling op (datr_tpu.ops.msda) instead of the CUDA extension.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.msda import ms_deform_attn


class MLP(nn.Module):
    """ReLU MLP (reference: models/dino/utils.py:107-119)."""

    hidden_dim: int
    out_dim: int
    num_layers: int
    last_zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layer{i}")(x)
            x = nn.relu(x)
        kwargs = {}
        if self.last_zero_init:
            # bbox-delta heads start at zero so initial boxes equal the
            # reference points (reference: dino.py:152-153).
            kwargs = dict(
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros
            )
        return nn.Dense(
            self.out_dim, dtype=self.dtype, name=f"layer{self.num_layers - 1}",
            **kwargs,
        )(x)


def _directional_offset_bias(n_heads: int, n_levels: int, n_points: int):
    """Initial sampling-offset bias: heads point at evenly-spaced directions,
    points at increasing radii (reference: ms_deform_attn.py:62-70)."""
    thetas = jnp.arange(n_heads, dtype=jnp.float32) * (2.0 * math.pi / n_heads)
    grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)  # [H, 2]
    grid = grid / jnp.abs(grid).max(axis=-1, keepdims=True)
    grid = jnp.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    scale = jnp.arange(1, n_points + 1, dtype=jnp.float32)[None, None, :, None]
    return (grid * scale).reshape(-1)


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention over flattened multi-level features."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    impl: str = "xla"  # 'xla' | 'pallas'
    bh_mode: str = "auto"  # 'flat' under tensor parallelism (mesh.py)
    table_mode: str = "slice"  # quad-table build: 'slice' | 'conv'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Lq, C]
        reference_points: jnp.ndarray,  # [B, Lq, L, 2|4] normalized
        value_src: jnp.ndarray,  # [B, S, C]
        spatial_shapes: Tuple[Tuple[int, int], ...],
        padding_mask: Optional[jnp.ndarray] = None,  # [B, S] True = pad
    ) -> jnp.ndarray:
        H, L, P = self.n_heads, self.n_levels, self.n_points
        D = self.d_model // H
        B, Lq, _ = query.shape
        S = value_src.shape[1]

        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(
            value_src
        )
        if padding_mask is not None:
            value = jnp.where(padding_mask[..., None], 0.0, value)
        value = value.reshape(B, S, H, D)

        offsets = nn.Dense(
            H * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: (
                _directional_offset_bias(H, L, P).astype(dtype)
            ),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(B, Lq, H, L, P, 2)

        attn = nn.Dense(
            H * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(B, Lq, H, L * P)
        attn = jax.nn.softmax(attn, axis=-1).reshape(B, Lq, H, L, P)

        if reference_points.shape[-1] == 2:
            # normalize offsets by each level's (W, H)
            wh = jnp.array(
                [(w, h) for h, w in spatial_shapes], dtype=jnp.float32
            )  # [L, 2] as (W, H)
            loc = (
                reference_points[:, :, None, :, None, :]
                + offsets / wh[None, None, None, :, None, :]
            )
        elif reference_points.shape[-1] == 4:
            loc = (
                reference_points[:, :, None, :, None, :2]
                + offsets / P * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        else:
            raise ValueError(
                f"reference_points last dim must be 2 or 4, got "
                f"{reference_points.shape[-1]}"
            )

        out = ms_deform_attn(
            value, spatial_shapes, loc.astype(jnp.float32),
            attn.astype(jnp.float32), impl=self.impl,
            bh_mode=self.bh_mode, table_mode=self.table_mode,
        )
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)
