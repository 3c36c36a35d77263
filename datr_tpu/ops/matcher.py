"""In-graph Hungarian assignment (Jonker-Volgenant) — static shapes, no host
round-trip.

The reference matcher (models/dino/matcher.py:47-95) moves the cost matrix to
CPU and calls scipy.optimize.linear_sum_assignment per image — a GPU->CPU sync
in the middle of every training step. Here the same shortest-augmenting-path
algorithm runs on-device under jit/vmap: each augmenting step is a vectorized
Dijkstra relaxation over the prediction axis (VPU-friendly [N]-wide ops), and
the outer loops are lax.fori_loop/while_loop with static bounds.

Orientation: rows = targets (T, small), cols = predictions (N, large), T <= N.
Invalid (padded) targets get a constant zero cost row: they absorb leftover
predictions without disturbing the optimum of the valid rows, and are masked
out downstream.

Also provides focal/L1/GIoU cost construction matching matcher.py:77-90.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp

from ..utils.boxes import box_cxcywh_to_xyxy, generalized_box_iou

_INF = jnp.float32(1e30)


@jax.jit
def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment. cost: [T, N] with T <= N.

    Returns col4row [T] int32: the prediction index assigned to each target.

    Every loop is a fixed-trip-count lax.scan with a done-flag (a Dijkstra
    augmentation scans at most T+1 columns, an augmenting path has at most T
    edges) — data-dependent while_loops compile pathologically on some XLA
    backends and scan pipelines better on TPU.
    """
    T, N = cost.shape
    cost = cost.astype(jnp.float32)

    def solve_row(state, cur_row):
        u, v, row4col, col4row = state

        # --- Dijkstra over columns until an unassigned column is reached ---
        def dijkstra_step(s, _):
            shortest, path, sc, sr, sink, i, min_val = s
            done = sink >= 0

            sr_n = sr.at[i].set(True)
            reduced = min_val + cost[i] - u[i] - v
            better = (~sc) & (reduced < shortest) & (~done)
            shortest_n = jnp.where(better, reduced, shortest)
            path_n = jnp.where(better, i, path)
            masked = jnp.where(sc, _INF, shortest_n)
            j = jnp.argmin(masked).astype(jnp.int32)
            mv_n = masked[j]
            sc_n = sc.at[j].set(True)
            unassigned = row4col[j] < 0
            sink_n = jnp.where(unassigned, j, jnp.int32(-1))
            i_n = jnp.where(unassigned, i, row4col[j])

            out = (
                jnp.where(done, shortest, shortest_n),
                jnp.where(done, path, path_n),
                jnp.where(done, sc, sc_n),
                jnp.where(done, sr, sr_n),
                jnp.where(done, sink, sink_n),
                jnp.where(done, i, i_n),
                jnp.where(done, min_val, mv_n),
            )
            return out, None

        init = (
            jnp.full((N,), _INF),
            jnp.full((N,), -1, dtype=jnp.int32),
            jnp.zeros((N,), dtype=bool),
            jnp.zeros((T,), dtype=bool),
            jnp.int32(-1),
            cur_row,
            jnp.float32(0.0),
        )
        (shortest, path, scanned_cols, scanned_rows, sink, _, min_val), _ = (
            jax.lax.scan(dijkstra_step, init, None, length=T + 1)
        )

        # Dual updates ("On implementing 2D rectangular assignment", Crouse).
        u = u.at[cur_row].add(min_val)
        other = scanned_rows & (jnp.arange(T) != cur_row)
        # For a scanned row i != cur_row, its matched column is col4row[i].
        row_col_cost = shortest[jnp.clip(col4row, 0, N - 1)]
        u = jnp.where(other, u + min_val - row_col_cost, u)
        v = jnp.where(scanned_cols, v + shortest - min_val, v)

        # --- augment along the alternating path ending at sink ---
        def aug_step(s, _):
            j, row4col, col4row = s
            done = j < 0
            j_safe = jnp.maximum(j, 0)
            i = path[j_safe]
            row4col_n = row4col.at[j_safe].set(i)
            j_next = jnp.where(i == cur_row, jnp.int32(-1), col4row[i])
            col4row_n = col4row.at[i].set(j_safe)
            return (
                jnp.where(done, j, j_next),
                jnp.where(done, row4col, row4col_n),
                jnp.where(done, col4row, col4row_n),
            ), None

        (_, row4col, col4row), _ = jax.lax.scan(
            aug_step, (sink, row4col, col4row), None, length=T
        )
        return (u, v, row4col, col4row), None

    u = jnp.zeros((T,), jnp.float32)
    v = jnp.zeros((N,), jnp.float32)
    row4col = jnp.full((N,), -1, dtype=jnp.int32)
    col4row = jnp.full((T,), -1, dtype=jnp.int32)
    (_, _, _, col4row), _ = jax.lax.scan(
        solve_row, (u, v, row4col, col4row),
        jnp.arange(T, dtype=jnp.int32),
    )
    return col4row


def detr_matching_cost(
    logits: jnp.ndarray,  # [N, K]
    pred_boxes: jnp.ndarray,  # [N, 4] cxcywh
    gt_labels: jnp.ndarray,  # [T] int32
    gt_boxes: jnp.ndarray,  # [T, 4] cxcywh
    gt_valid: jnp.ndarray,  # [T] bool
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    focal_alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """[T, N] cost with invalid target rows zeroed
    (reference: matcher.py:69-91, transposed to targets-first)."""
    prob = jax.nn.sigmoid(logits)  # [N, K]
    pos = focal_alpha * ((1.0 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    neg = (1.0 - focal_alpha) * (prob ** gamma) * (
        -jnp.log(1.0 - prob + 1e-8)
    )
    cls = (pos - neg)[:, gt_labels]  # [N, T]

    l1 = jnp.sum(
        jnp.abs(pred_boxes[:, None, :] - gt_boxes[None, :, :]), axis=-1
    )
    giou = -generalized_box_iou(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(gt_boxes)
    )
    C = cost_bbox * l1 + cost_class * cls + cost_giou * giou  # [N, T]
    C = jnp.where(gt_valid[None, :], C, 0.0)
    return C.T  # [T, N]


def minsum_match(cost: jnp.ndarray) -> jnp.ndarray:
    """SimpleMinsumMatcher (reference: matcher.py:98-175): each target takes
    its argmin-cost prediction independently (not necessarily injective).
    cost: [T, N] -> [T] int32."""
    return jnp.argmin(cost, axis=1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("cost_class", "cost_bbox", "cost_giou",
                              "focal_alpha"),
)
def batch_match(
    logits: jnp.ndarray,  # [B, N, K]
    pred_boxes: jnp.ndarray,  # [B, N, 4]
    gt_labels: jnp.ndarray,  # [B, T]
    gt_boxes: jnp.ndarray,  # [B, T, 4]
    gt_valid: jnp.ndarray,  # [B, T]
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    focal_alpha: float = 0.25,
) -> jnp.ndarray:
    """vmap of cost + hungarian. Returns assignment [B, T] int32 (prediction
    index per target; meaningful only where gt_valid)."""

    def per_image(lg, pb, tl, tb, tv):
        C = detr_matching_cost(
            lg, pb, tl, tb, tv, cost_class, cost_bbox, cost_giou, focal_alpha
        )
        return hungarian(C)

    return jax.vmap(per_image)(logits, pred_boxes, gt_labels, gt_boxes,
                               gt_valid)
