"""Multi-scale deformable attention — the hot op of the framework.

TPU-native replacement for the reference's CUDA extension
(models/dino/ops/src/cuda/ms_deform_attn_cuda.cu:20-80 forward,
ms_deform_im2col_cuda.cuh:238-300 im2col kernel, :302-922 col2im backward) and
its pure-PyTorch oracle (ops/functions/ms_deform_attn_func.py:41-61).

Contract (matches MSDeformAttnFunction.apply, batch-first):
  value:              [B, S, H, D]   S = sum_l(H_l * W_l), H heads, D head dim
  spatial_shapes:     static tuple ((H_0, W_0), ...)) — static so XLA sees fixed
                      shapes; the reference passes a device tensor instead.
  sampling_locations: [B, Lq, H, L, P, 2]  (x, y) normalized to [0, 1]
  attention_weights:  [B, Lq, H, L, P]  softmax-normalized over (L, P)
  output:             [B, Lq, H * D]

Bilinear sampling semantics replicate torch.nn.functional.grid_sample with
mode='bilinear', padding_mode='zeros', align_corners=False: the pixel-space
coordinate is loc * size - 0.5 and out-of-range corners contribute zero.

Design notes (TPU):
- The whole op is 4 flat gathers (one per bilinear corner) over the flattened
  token axis + a small weighted reduction. Level offsets are folded into the
  gather indices so the gather count is independent of the number of levels.
- Gradients come from XLA autodiff: the gather transposes to scatter-add, which
  is the exact TPU-native analogue of the CUDA col2im atomics.
- A Pallas kernel (msda_pallas.py) keeps `value` VMEM-resident per (batch, head)
  and is used on TPU when enabled; this XLA path is the oracle and fallback.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _corner_gather_indices(
    sampling_locations: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
):
    """Compute per-corner flat indices and bilinear weights.

    Returns (indices, weights): each a list of 4 arrays shaped
    [B, Lq, H, L, P] (int32 / float32). Invalid corners get index 0 and
    weight 0.
    """
    loc = sampling_locations
    num_levels = len(spatial_shapes)
    assert loc.shape[-3] == num_levels, (loc.shape, spatial_shapes)

    # Pixel coordinates per level: x = loc_x * W - 0.5 (align_corners=False).
    ws = jnp.array([w for _, w in spatial_shapes], dtype=loc.dtype)
    hs = jnp.array([h for h, _ in spatial_shapes], dtype=loc.dtype)
    starts_list = [0]
    for h, w in spatial_shapes[:-1]:
        starts_list.append(starts_list[-1] + h * w)
    starts = jnp.array(starts_list, dtype=jnp.int32)

    x = loc[..., 0] * ws[:, None] - 0.5  # [B, Lq, H, L, P]
    y = loc[..., 1] * hs[:, None] - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    wi = ws.astype(jnp.int32)[:, None]
    hi = hs.astype(jnp.int32)[:, None]

    indices = []
    weights = []
    for dy, dx, w_corner in (
        (0, 0, (1 - fx) * (1 - fy)),
        (0, 1, fx * (1 - fy)),
        (1, 0, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        cx = x0i + dx
        cy = y0i + dy
        valid = (cx >= 0) & (cx < wi) & (cy >= 0) & (cy < hi)
        cx_c = jnp.clip(cx, 0, wi - 1)
        cy_c = jnp.clip(cy, 0, hi - 1)
        flat = starts[:, None] + cy_c * wi + cx_c
        indices.append(jnp.where(valid, flat, 0))
        weights.append(jnp.where(valid, w_corner, 0.0))
    return indices, weights


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn_xla(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    B, S, H, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)

    indices, corner_w = _corner_gather_indices(
        sampling_locations.astype(jnp.float32), spatial_shapes
    )

    # [B, S, H, D] -> [B, H, S, D] for a per-head flat gather.
    value_bh = jnp.swapaxes(value, 1, 2)
    # fold attention weights into the bilinear corner weights once
    attn = jnp.transpose(attention_weights, (0, 2, 1, 3, 4))  # [B,H,Lq,L,P]

    # Accumulate per (corner, level): the per-step gather buffer is
    # [B, H, Lq, P, D] — L*4 sequential steps keep peak memory ~1/(4L) of a
    # fused [B, H, Lq, L*P, D] materialization (encoder Lq == S ~ 22k tokens,
    # where one fused buffer is GBs at batch 8).
    out = jnp.zeros((B, H, Lq, D), jnp.float32)
    for idx, w in zip(indices, corner_w):
        idx_bh = jnp.transpose(idx, (0, 2, 1, 3, 4))  # [B,H,Lq,L,P]
        w_attn = (jnp.transpose(w, (0, 2, 1, 3, 4)) * attn).astype(value.dtype)
        for lvl in range(L):
            g = jnp.take_along_axis(
                value_bh,
                idx_bh[:, :, :, lvl].reshape(B, H, Lq * P)[..., None],
                axis=2,
            ).reshape(B, H, Lq, P, D)
            out = out + jnp.einsum(
                "bhqpd,bhqp->bhqd", g, w_attn[:, :, :, lvl],
                preferred_element_type=jnp.float32,
            )
    # [B, H, Lq, D] -> [B, Lq, H*D]
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, H * D).astype(
        value.dtype
    )


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    impl: str = "xla",
) -> jnp.ndarray:
    """Dispatching entry point (reference: ops/src/ms_deform_attn.h:21-62)."""
    if impl == "xla":
        return ms_deform_attn_xla(
            value, tuple(map(tuple, spatial_shapes)), sampling_locations,
            attention_weights,
        )
    if impl == "pallas":
        from .msda_pallas import ms_deform_attn_pallas

        return ms_deform_attn_pallas(
            value, tuple(map(tuple, spatial_shapes)), sampling_locations,
            attention_weights,
        )
    raise ValueError(f"unknown msda impl: {impl!r}")
