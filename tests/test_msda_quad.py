"""Quad-packed gather path (head_dim 32) vs the generic XLA oracle — value
parity and gradient parity, including out-of-range samples."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from datr_tpu.ops.msda import ms_deform_attn_quad, ms_deform_attn_xla

SHAPES = ((7, 5), (4, 3), (2, 2))
S = sum(h * w for h, w in SHAPES)


def _inputs(loc_scale, seed=0):
    rng = np.random.default_rng(seed)
    B, Lq, H, D, P = 2, 6, 2, 32, 3
    L = len(SHAPES)
    value = rng.standard_normal((B, S, H, D)).astype(np.float32)
    loc = (rng.random((B, Lq, H, L, P, 2)).astype(np.float32) - 0.2) * (
        loc_scale
    )
    attn = rng.random((B, Lq, H, L, P)).astype(np.float32)
    attn /= attn.sum(axis=(-1, -2), keepdims=True)
    return value, loc, attn


@pytest.mark.parametrize("loc_scale", [1.0, 1.6])
def test_quad_matches_generic(loc_scale):
    value, loc, attn = _inputs(loc_scale)
    want = np.asarray(ms_deform_attn_xla(value, SHAPES, loc, attn))
    got = np.asarray(ms_deform_attn_quad(value, SHAPES, loc, attn))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_quad_gradients_match_generic():
    value, loc, attn = _inputs(1.2, seed=1)

    def fq(v, l, a):
        return jnp.sum(ms_deform_attn_quad(v, SHAPES, l, a) ** 2)

    def fx(v, l, a):
        return jnp.sum(ms_deform_attn_xla(v, SHAPES, l, a) ** 2)

    gq = jax.grad(fq, argnums=(0, 1, 2))(value, loc, attn)
    gx = jax.grad(fx, argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(gq, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.parametrize("loc_scale", [1.0, 1.6])
def test_conv_table_mode_matches_slice(loc_scale):
    """table_mode='conv' (2x2 patch-extraction conv build, measured 12.42
    vs 12.93 img/s for 'slice' on v5e — kept as a documented alternative)
    computes the same function, including clamped out-of-range corners."""
    value, loc, attn = _inputs(loc_scale, seed=3)
    a = np.asarray(ms_deform_attn_quad(value, SHAPES, loc, attn,
                                       table_mode="slice"))
    b = np.asarray(ms_deform_attn_quad(value, SHAPES, loc, attn,
                                       table_mode="conv"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("big_lq", [False, True])
def test_flat_bh_mode_matches_auto(big_lq):
    """bh_mode='flat' (the TP-partitionable batched gather) computes the
    same function as 'auto' at both decoder and encoder scales."""
    value, loc, attn = _inputs(1.1, seed=2)
    if big_lq:
        # force the auto path into the lax.map branch by tiling queries
        # past the threshold is too slow on CPU; instead just check that
        # both modes agree on the same inputs
        loc = np.concatenate([loc, loc[:, ::-1]], axis=1)
        attn = np.concatenate([attn, attn[:, ::-1]], axis=1)
    a = np.asarray(ms_deform_attn_quad(value, SHAPES, loc, attn,
                                       bh_mode="auto"))
    b = np.asarray(ms_deform_attn_quad(value, SHAPES, loc, attn,
                                       bh_mode="flat"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
