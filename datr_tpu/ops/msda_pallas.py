"""Pallas TPU kernel for multi-scale deformable attention (forward).

Replaces the reference CUDA im2col kernel
(models/dino/ops/src/cuda/ms_deform_im2col_cuda.cuh:238-300) for workloads
where `value` fits in VMEM per (batch, head): the whole bilinear gather +
weighting + reduction happens on-chip, so HBM sees `value` once plus the
locations/weights/outputs — none of the [B, H, Lq, L*P, D] intermediates the
XLA gather path streams through HBM.

Status / design notes (probed on v5e, jax 0.9 Mosaic):
- vectorized in-kernel gathers (jnp.take / take_along_axis on VMEM refs)
  either fail to lower or crash the Mosaic compiler, so rows are fetched with
  scalar dynamic indexing inside a fori_loop — correct everywhere, and
  profitable only for modest query counts (decoder cross-attention:
  Lq ~ 1.1k). The encoder (Lq == S ~ 22k) stays on the XLA gather path
  (datr_tpu/ops/msda.py), which is also the custom-VJP oracle.
- backward reuses the XLA path's autodiff (gather transpose = scatter-add,
  the TPU analogue of the CUDA col2im atomics at ms_deform_im2col_cuda.cuh
  :302-922).
- Round-2 measurement (ROADMAP.md "MSDA ceiling analysis"): a production
  fused kernel CANNOT beat the XLA gather on this toolchain — Mosaic
  rejects dynamic single-sublane row loads ("index in dimension 0 must be
  a multiple of 8"), so the only legal in-kernel gather is the scalar loop
  below, whose issue rate is at best comparable to XLA's 0.42 Grows/s.
  This module is kept as the dispatchable prototype to revisit when the
  toolchain exposes vectorized gathers (tpu.dynamic_gather).

grid: (B * H,) — one program per (batch, head); value block [S, D] is
VMEM-resident for the program's lifetime.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda import ms_deform_attn_xla


def _kernel(loc_ref, w_ref, val_ref, out_ref, *, spatial_shapes, P):
    """loc_ref: [1, Lq, L*P, 2] SMEM-free VMEM float32 (x, y normalized)
    w_ref:   [1, Lq, L*P] attention weights (softmaxed)
    val_ref: [1, S, D] value rows for this (b, h)
    out_ref: [1, Lq, D]
    """
    L = len(spatial_shapes)
    Lq = loc_ref.shape[1]
    D = val_ref.shape[2]

    starts = []
    s = 0
    for h, w in spatial_shapes:
        starts.append(s)
        s += h * w

    acc0 = jnp.zeros((Lq, D), jnp.float32)

    def q_body(q, acc):
        # accumulate the q-th query's L*P samples
        o = jnp.zeros((1, D), jnp.float32)
        for lvl, (hl, wl) in enumerate(spatial_shapes):
            for p in range(P):
                k = lvl * P + p
                x = loc_ref[0, q, k, 0] * wl - 0.5
                y = loc_ref[0, q, k, 1] * hl - 0.5
                # FMA-proof corner choice (see msda._corner_gather_indices)
                x0 = jnp.floor(x - (1e-4 + wl * 2.0 ** -20))
                y0 = jnp.floor(y - (1e-4 + hl * 2.0 ** -20))
                fx = x - x0
                fy = y - y0
                x0i = x0.astype(jnp.int32)
                y0i = y0.astype(jnp.int32)
                aw = w_ref[0, q, k]
                for dy in (0, 1):
                    for dx in (0, 1):
                        cx = x0i + dx
                        cy = y0i + dy
                        wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                        valid = ((cx >= 0) & (cx < wl) & (cy >= 0)
                                 & (cy < hl))
                        idx = jnp.where(
                            valid, starts[lvl] + cy * wl + cx, 0
                        )
                        row = val_ref[0, idx, :]
                        o_add = jnp.where(valid, wgt * aw, 0.0) * row
                        o = o + o_add[None, :]
        return acc.at[q, :].set(o[0])

    out_ref[0, :, :] = jax.lax.fori_loop(0, Lq, q_body, acc0)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn_pallas_fwd(
    value: jnp.ndarray,  # [B, S, H, D]
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,  # [B, Lq, H, L, P, 2]
    attention_weights: jnp.ndarray,  # [B, Lq, H, L, P]
) -> jnp.ndarray:
    B, S, H, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape

    val_bh = jnp.swapaxes(value, 1, 2).reshape(B * H, S, D).astype(
        jnp.float32
    )
    loc = jnp.transpose(sampling_locations, (0, 2, 1, 3, 4, 5)).reshape(
        B * H, Lq, L * P, 2
    ).astype(jnp.float32)
    attn = jnp.transpose(attention_weights, (0, 2, 1, 3, 4)).reshape(
        B * H, Lq, L * P
    ).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, spatial_shapes=spatial_shapes, P=P),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Lq, L * P, 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq, L * P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Lq, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, D), jnp.float32),
    )(loc, attn, val_bh)

    return (
        out.reshape(B, H, Lq, D)
        .transpose(0, 2, 1, 3)
        .reshape(B, Lq, H * D)
        .astype(value.dtype)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights):
    return ms_deform_attn_pallas_fwd(
        value, spatial_shapes, sampling_locations, attention_weights
    )


def _fwd(value, spatial_shapes, loc, attn):
    out = ms_deform_attn_pallas_fwd(value, spatial_shapes, loc, attn)
    return out, (value, loc, attn)


def _bwd(spatial_shapes, res, g):
    value, loc, attn = res
    # backward via the XLA oracle's autodiff (identical math)
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_xla(v, spatial_shapes, l, a),
        value, loc, attn,
    )
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
