"""Deformable transformer encoder/decoder layers (batch-first, static shapes).

Capability match for the reference's deformable_transformer.py:
- DeformableTransformerEncoderLayer (:765-820): MSDeformAttn self-attention
  + post-norm + 2-layer FFN.
- DeformableTransformerDecoderLayer (:822-994): query self-attention (with the
  CDN block mask), MSDeformAttn cross-attention, FFN, module order sa->ca->ffn.
- grid reference points for the encoder (:477-489) and valid-ratio handling.

The full two-stage + iterative-refinement orchestration lives in
datr_tpu/models/dino.py so that the box/class heads can be shared between the
decoder refinement and the output heads (reference: dino.py:163-166).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import MSDeformAttn
from .norms import layer_norm


def encoder_reference_points(
    spatial_shapes: Tuple[Tuple[int, int], ...],
    valid_ratios: jnp.ndarray,  # [B, L, 2] (w_ratio, h_ratio)
) -> jnp.ndarray:
    """Normalized (x, y) grid centers for every token at every level.

    Returns [B, S, L, 2] (reference: deformable_transformer.py:477-489).
    """
    points = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry = (jnp.arange(h, dtype=jnp.float32) + 0.5)
        rx = (jnp.arange(w, dtype=jnp.float32) + 0.5)
        gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
        gy = gy.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
        gx = gx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
        points.append(jnp.stack([gx, gy], axis=-1))  # [B, hw, 2]
    ref = jnp.concatenate(points, axis=1)  # [B, S, 2]
    return ref[:, :, None, :] * valid_ratios[:, None, :, :]


def valid_ratios_from_mask(masks) -> jnp.ndarray:
    """[B, L, 2] fraction of non-padded width/height per level
    (reference: deformable_transformer.py:238-245). masks: list of [B, H, W]
    bool, True = padding."""
    ratios = []
    for m in masks:
        h, w = m.shape[1], m.shape[2]
        valid_h = jnp.sum(~m[:, :, 0], axis=1).astype(jnp.float32) / h
        valid_w = jnp.sum(~m[:, 0, :], axis=1).astype(jnp.float32) / w
        ratios.append(jnp.stack([valid_w, valid_h], axis=-1))
    return jnp.stack(ratios, axis=1)


class FFN(nn.Module):
    d_model: int
    d_ffn: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    fast_norm: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return layer_norm(self.dtype, self.fast_norm, "norm")(x + y)


class DeformableEncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 2048
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dropout: float = 0.0
    msda_impl: str = "xla"
    msda_bh_mode: str = "auto"
    msda_table_mode: str = "slice"
    dtype: jnp.dtype = jnp.float32
    fast_norm: bool = False

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # [B, S, C]
        pos: jnp.ndarray,  # [B, S, C]
        reference_points: jnp.ndarray,  # [B, S, L, 2]
        spatial_shapes: Tuple[Tuple[int, int], ...],
        padding_mask: Optional[jnp.ndarray] = None,  # [B, S]
        deterministic: bool = True,
    ):
        attn_out = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            impl=self.msda_impl, bh_mode=self.msda_bh_mode,
            table_mode=self.msda_table_mode,
            dtype=self.dtype, name="self_attn",
        )(src + pos, reference_points, src, spatial_shapes, padding_mask)
        attn_out = nn.Dropout(self.dropout, deterministic=deterministic)(attn_out)
        src = layer_norm(self.dtype, self.fast_norm, "norm1")(src + attn_out)
        return FFN(self.d_model, self.d_ffn, self.dropout, self.dtype,
                   self.fast_norm, name="ffn")(src, deterministic)


class DeformableDecoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 2048
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dropout: float = 0.0
    msda_impl: str = "xla"
    msda_bh_mode: str = "auto"
    msda_table_mode: str = "slice"
    dtype: jnp.dtype = jnp.float32
    fast_norm: bool = False

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # [B, Nq, C]
        query_pos: jnp.ndarray,  # [B, Nq, C]
        memory: jnp.ndarray,  # [B, S, C]
        reference_points: jnp.ndarray,  # [B, Nq, L, 4]
        spatial_shapes: Tuple[Tuple[int, int], ...],
        memory_padding_mask: Optional[jnp.ndarray] = None,  # [B, S]
        self_attn_mask: Optional[jnp.ndarray] = None,  # [Nq, Nq] True=attend
        deterministic: bool = True,
    ):
        # --- query self-attention (module_seq 'sa') ---
        q = tgt + query_pos
        mask = None
        if self_attn_mask is not None:
            mask = self_attn_mask[None, None, :, :]  # [1, 1, Nq, Nq]
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, name="self_attn",
            dropout_rate=self.dropout, deterministic=deterministic,
        )(inputs_q=q, inputs_k=q, inputs_v=tgt, mask=mask)
        sa = nn.Dropout(self.dropout, deterministic=deterministic)(sa)
        tgt = layer_norm(self.dtype, self.fast_norm, "norm2")(tgt + sa)

        # --- deformable cross-attention ('ca') ---
        ca = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            impl=self.msda_impl, bh_mode=self.msda_bh_mode,
            table_mode=self.msda_table_mode,
            dtype=self.dtype, name="cross_attn",
        )(tgt + query_pos, reference_points, memory, spatial_shapes,
          memory_padding_mask)
        ca = nn.Dropout(self.dropout, deterministic=deterministic)(ca)
        tgt = layer_norm(self.dtype, self.fast_norm, "norm1")(tgt + ca)

        # --- ffn ---
        return FFN(self.d_model, self.d_ffn, self.dropout, self.dtype,
                   self.fast_norm, name="ffn")(tgt, deterministic)
