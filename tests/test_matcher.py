"""In-graph Hungarian vs scipy.optimize.linear_sum_assignment (the reference's
solver, models/dino/matcher.py:91-95). Optimal cost must match exactly;
indices may differ only at ties."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from datr_tpu.ops.matcher import hungarian, batch_match, detr_matching_cost


def _optimal_cost(C):
    r, c = linear_sum_assignment(C)
    return C[r, c].sum()


def test_hungarian_matches_scipy_cost_square_and_rect():
    rng = np.random.default_rng(0)
    for (t, n) in [(1, 1), (3, 3), (5, 12), (10, 50), (20, 300)]:
        C = rng.standard_normal((t, n)).astype(np.float32) * 3.0
        col4row = np.asarray(hungarian(jnp.asarray(C)))
        assert len(set(col4row.tolist())) == t, "assignment must be injective"
        got = C[np.arange(t), col4row].sum()
        want = _optimal_cost(C)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hungarian_deterministic_structures():
    # Diagonal-dominant cost: assignment must be the diagonal.
    C = np.full((4, 6), 10.0, np.float32)
    np.fill_diagonal(C, 0.0)
    col4row = np.asarray(hungarian(jnp.asarray(C)))
    np.testing.assert_array_equal(col4row, [0, 1, 2, 3])


def test_batch_match_respects_validity_and_cost():
    rng = np.random.default_rng(1)
    B, N, K, T = 2, 25, 5, 6
    logits = rng.standard_normal((B, N, K)).astype(np.float32)
    boxes = rng.random((B, N, 4)).astype(np.float32) * 0.5 + 0.25
    tl = rng.integers(0, K, (B, T)).astype(np.int32)
    tb = rng.random((B, T, 4)).astype(np.float32) * 0.4 + 0.3
    tv = np.ones((B, T), bool)
    tv[0, 4:] = False
    assign = np.asarray(batch_match(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(tl),
        jnp.asarray(tb), jnp.asarray(tv)))
    for b in range(B):
        C = np.asarray(detr_matching_cost(
            jnp.asarray(logits[b]), jnp.asarray(boxes[b]), jnp.asarray(tl[b]),
            jnp.asarray(tb[b]), jnp.asarray(tv[b])))
        valid = tv[b]
        got = C[np.arange(T), assign[b]][valid].sum()
        # scipy on only the valid rows
        want = _optimal_cost(C[valid])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        # injective over valid rows
        a = assign[b][valid]
        assert len(set(a.tolist())) == valid.sum()
