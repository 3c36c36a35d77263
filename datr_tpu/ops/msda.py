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
- Default fast path (head_dim 32): `ms_deform_attn_quad` — the four bilinear
  corners of a sample pack into one 128-lane row of a per-level shifted-slice
  table, and ONE gather per (batch, head) fetches every corner of every
  sample at the gather unit's issue rate. See its docstring for the measured
  hardware facts.
- `ms_deform_attn_xla` is the generic-width oracle (per-corner gathers).
- Gradients come from XLA autodiff: the gather transposes to scatter-add,
  which is the exact TPU-native analogue of the CUDA col2im atomics.
- The Pallas kernel (msda_pallas.py) is experimental: Mosaic in this
  toolchain cannot compile vectorized in-kernel gathers.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import numpy as np
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

    # Corner choice must be FMA-proof: XLA duplicates `loc*w - 0.5` into the
    # index fusion and the weight fusion and may contract only one copy into
    # an FMA. At exact-integer pixel coordinates (ubiquitous with DINO's
    # directional-bias offsets) the two copies then floor() to different
    # corners — the gathered row and its bilinear weights disagree, silently
    # sampling the wrong row. Shifting the floor threshold by an epsilon
    # larger than any 1-ulp divergence makes every duplicated copy take the
    # same branch; at exact integers this deterministically picks the
    # (lower-corner, frac≈1) decomposition, which is bilinearly identical.
    # Max deviation from exact grid_sample semantics: ~eps px (extrapolation
    # when the true coordinate lies within eps of a grid line).
    eps_x = 1e-4 + ws[:, None] * 2.0 ** -20
    eps_y = 1e-4 + hs[:, None] * 2.0 ** -20
    x0 = jnp.floor(x - eps_x)
    y0 = jnp.floor(y - eps_y)
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


def _quad_tables_conv(value, spatial_shapes):
    """Quad corner tables via a 2x2 patch-extraction convolution.

    One identity-kernel conv per level writes the packed table in a SINGLE
    materialization on the MXU (the shifted-slice build chains pad+concat
    ops that XLA materializes several times). Table rows are indexed by
    (y0+1) * (w+1) + (x0+1) on the (h+1, w+1) window grid.

    Returns (quad_all [B*H, rows, 4D], row_offsets, grid_strides).
    """
    B, S, H, D = value.shape
    value_bh = jnp.swapaxes(value, 1, 2)  # [B, H, S, D]
    kernel = np.zeros((2, 2, D, 4 * D), value.dtype)
    for corner, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        for c in range(D):
            kernel[dy, dx, c, corner * D + c] = 1.0
    kernel = jnp.asarray(kernel)

    tables = []
    row_offsets = []
    total = 0
    start = 0
    for (h, w) in spatial_shapes:
        hw = h * w
        grid = value_bh[:, :, start : start + hw].reshape(B * H, h, w, D)
        start += hw
        vp = jnp.pad(grid, ((0, 0), (1, 1), (1, 1), (0, 0)))
        quad = jax.lax.conv_general_dilated(
            vp, kernel, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=value.dtype,
        )  # [B*H, h+1, w+1, 4D]
        tables.append(quad.reshape(B * H, (h + 1) * (w + 1), 4 * D))
        row_offsets.append(total)
        total += (h + 1) * (w + 1)
    return jnp.concatenate(tables, axis=1), row_offsets


@functools.partial(jax.jit,
                   static_argnames=("spatial_shapes", "bh_mode",
                                    "table_mode"))
def ms_deform_attn_quad(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    bh_mode: str = "auto",
    table_mode: str = "slice",  # 'slice' | 'conv'
) -> jnp.ndarray:
    """Quad-packed gather formulation — the fast TPU path for D == 32.

    Measured facts about XLA's TPU gather (v5e) that shape this design:
    1. The gather unit is ISSUE-RATE bound at ~0.4e9 rows/s, so throughput is
       proportional to row width: 23 GB/s at 32 lanes vs ~100 GB/s at 128
       lanes (the maximum row width with a fast layout). Minimize ROWS, pack
       each row full.
    2. It needs a 2D operand [rows, 128 lanes] with flat 1D indices and the
       operand in the tens-of-MB range; the batched take_along_axis form and
       >64 MB operands fall to ~20 GB/s.
    3. Per-gather fixed overhead is ~0.2 ms, so fewer, larger gathers win.

    Hence: with head_dim 32 the four bilinear corners of a sample pack into
    one 128-lane row — in row-major token order the corners are rows
    (i, i+1, i+W, i+W+1), so shifted slices of the zero-padded per-level
    value build quad[i] = [v(y0,x0), v(y0,x1), v(y1,x0), v(y1,x1)]. The
    per-level tables concatenate along rows into ONE ~6 MB table per
    (batch, head), and a single gather of all Lq*L*P samples per (b, h)
    (lax.map over the b*h axis keeps each step's table inside VMEM) fetches
    every corner of every sample — 100%% of every gathered byte is used.
    """
    B, S, H, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert 4 * D == 128, "quad packing requires head_dim 32"

    loc = sampling_locations.astype(jnp.float32)

    # ---- build the packed corner tables, all levels concatenated ----
    if table_mode == "conv":
        quad_all, row_offsets = _quad_tables_conv(value, spatial_shapes)
    else:
        tables = []
        row_offsets = []
        start = 0
        total_rows = 0
        for (h, w) in spatial_shapes:
            hw = h * w
            v_l = jnp.swapaxes(value[:, start : start + hw], 1, 2)
            start += hw
            # base index range (clamped): y0 in [-1, h-1], x0 in [-1, w-1]
            # -> flat + (w+1) in [0, hw+w]; slices need v_pad len hw+2w+2.
            n_pack = hw + w + 1
            v_pad = jnp.pad(v_l, ((0, 0), (0, 0), (w + 1, w + 1), (0, 0)))
            quad = jnp.concatenate(
                [
                    v_pad[:, :, 0:n_pack],
                    v_pad[:, :, 1 : n_pack + 1],
                    v_pad[:, :, w : n_pack + w],
                    v_pad[:, :, w + 1 : n_pack + w + 1],
                ],
                axis=-1,
            )  # [B, H, n_pack, 4D]
            tables.append(quad)
            row_offsets.append(total_rows)
            total_rows += n_pack
        quad_all = jnp.concatenate(tables, axis=2).reshape(
            B * H, total_rows, 4 * D
        )

    # ---- indices + corner weights, computed in (b, h)-major layout ----
    # Transposing the small raw inputs once (loc 2 lanes, attn 1 lane) and
    # deriving everything in the target layout avoids transposing the 4x
    # larger corner-weight stack (profiled 11.3 ms/layer in f32).
    loc_t = jnp.transpose(loc, (0, 2, 1, 3, 4, 5)).reshape(
        B * H, Lq, L, P, 2
    )
    attn_t = jnp.transpose(
        attention_weights, (0, 2, 1, 3, 4)
    ).reshape(B * H, Lq, L, P).astype(value.dtype)

    bases = []
    corner_ws = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        x = loc_t[:, :, lvl, :, 0] * w - 0.5  # [B*H, Lq, P]
        y = loc_t[:, :, lvl, :, 1] * h - 0.5
        # FMA-proof corner choice — see _corner_gather_indices for why the
        # floor threshold is nudged.
        x0 = jnp.floor(x - (1e-4 + w * 2.0 ** -20))
        y0 = jnp.floor(y - (1e-4 + h * 2.0 ** -20))
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        vx0 = (x0i >= 0) & (x0i < w)
        vx1 = (x0i + 1 >= 0) & (x0i + 1 < w)
        vy0 = (y0i >= 0) & (y0i < h)
        vy1 = (y0i + 1 >= 0) & (y0i + 1 < h)
        a_ = attn_t[:, :, lvl]
        w00 = (jnp.where(vx0 & vy0, (1 - fx) * (1 - fy), 0.0)
               .astype(value.dtype) * a_)
        w01 = (jnp.where(vx1 & vy0, fx * (1 - fy), 0.0)
               .astype(value.dtype) * a_)
        w10 = (jnp.where(vx0 & vy1, (1 - fx) * fy, 0.0)
               .astype(value.dtype) * a_)
        w11 = (jnp.where(vx1 & vy1, fx * fy, 0.0)
               .astype(value.dtype) * a_)
        if table_mode == "conv":
            # conv tables index the (h+1, w+1) window grid
            base = ((jnp.clip(y0i, -1, h - 1) + 1) * (w + 1)
                    + jnp.clip(x0i, -1, w - 1) + 1 + row_offsets[lvl])
        else:
            base = (jnp.clip(y0i, -1, h - 1) * w
                    + jnp.clip(x0i, -1, w - 1)
                    + (w + 1)
                    + row_offsets[lvl])
        bases.append(base)  # [B*H, Lq, P]
        corner_ws.append(jnp.stack([w00, w01, w10, w11], axis=-1))

    idx = jnp.stack(bases, axis=2).reshape(B * H, Lq * L * P)
    cw = jnp.stack(corner_ws, axis=2).reshape(B * H, Lq * L * P, 4)

    # ---- one big gather + lane-preserving reduction per (b, h) ----
    # Splitting the 128 gathered lanes into (4, D) for an einsum forces a
    # cross-lane relayout that costs more than the gather itself (profiled:
    # 6.5 ms/op). Instead the corner weights are expanded into lane blocks
    # with a constant [4, 128] 0/1 matmul, the L*P samples reduce over
    # sublanes, and a constant [128, D] 0/1 matmul folds the four corner
    # blocks — lanes stay intact end to end, both matmuls ride the MXU.
    expand = jnp.asarray(
        np.kron(np.eye(4), np.ones((1, D))), dtype=value.dtype
    )  # [4, 128]
    fold = jnp.asarray(np.tile(np.eye(D), (4, 1)), dtype=jnp.float32)

    # bh_mode: 'auto' picks per-(b,h) lax.map at encoder scale (VMEM-resident
    # tables, fastest single-chip) and the flat batched gather at decoder
    # scale. 'flat' forces the batched form everywhere — required under
    # tensor parallelism: a lax.map is a sequential while-loop whose
    # iterations SPMD cannot split across chips, while the flat gather's
    # b*h-major rows partition cleanly over head-sharded tables.
    if bh_mode == "auto" and Lq * L * P >= 65536:
        # encoder-scale: big per-(b,h) gathers amortize the ~0.2 ms fixed
        # gather cost and keep each step's table VMEM-resident
        def one_bh(args):
            table, ix, w_ = args
            g = jnp.take(table, ix, axis=0)  # [Lq*L*P, 128]
            w_lane = jnp.dot(w_, expand, preferred_element_type=value.dtype)
            r = (g * w_lane).reshape(Lq, L * P, 4 * D).sum(axis=1)
            return jnp.dot(r, fold, preferred_element_type=jnp.float32)

        out = jax.lax.map(one_bh, (quad_all, idx, cw))  # [B*H, Lq, D]
    else:
        # decoder-scale (Lq ~ 1k): one flat gather over all (b, h) — the
        # operand exceeds VMEM (slower per-byte) but total bytes are small
        # and the per-gather overhead is paid once
        n_rows = quad_all.shape[1]
        flat_idx = (
            idx + jnp.arange(B * H, dtype=jnp.int32)[:, None] * n_rows
        ).reshape(-1)
        g = jnp.take(quad_all.reshape(B * H * n_rows, 4 * D), flat_idx,
                     axis=0)
        w_lane = jnp.dot(cw.reshape(-1, 4), expand,
                         preferred_element_type=value.dtype)
        r = (g * w_lane).reshape(B * H * Lq, L * P, 4 * D).sum(axis=1)
        out = jnp.dot(r, fold, preferred_element_type=jnp.float32)
    out = out.reshape(B, H, Lq, D)
    return (
        jnp.transpose(out, (0, 2, 1, 3))
        .reshape(B, Lq, H * D)
        .astype(value.dtype)
    )


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

    # [B, S, H, D] -> [B, H, S, D] -> flat rows for the fast 2D gather.
    value_bh = jnp.swapaxes(value, 1, 2)
    value_flat = value_bh.reshape(B * H * S, D)
    bh_off = jnp.arange(B * H, dtype=jnp.int32).reshape(B, H, 1) * S
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
            flat_idx = (
                idx_bh[:, :, :, lvl].reshape(B, H, Lq * P) + bh_off
            ).reshape(-1)
            g = jnp.take(value_flat, flat_idx, axis=0).reshape(
                B, H, Lq, P, D
            )
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
    bh_mode: str = "auto",
    table_mode: str = "slice",
) -> jnp.ndarray:
    """Dispatching entry point (reference: ops/src/ms_deform_attn.h:21-62)."""
    shapes = tuple(map(tuple, spatial_shapes))
    if impl == "xla":
        if 4 * value.shape[-1] == 128:
            return ms_deform_attn_quad(
                value, shapes, sampling_locations, attention_weights,
                bh_mode=bh_mode, table_mode=table_mode,
            )
        return ms_deform_attn_xla(
            value, shapes, sampling_locations, attention_weights
        )
    if impl == "pallas":
        from .msda_pallas import ms_deform_attn_pallas

        return ms_deform_attn_pallas(
            value, tuple(map(tuple, spatial_shapes)), sampling_locations,
            attention_weights,
        )
    raise ValueError(f"unknown msda impl: {impl!r}")
