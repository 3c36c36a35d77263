"""Pallas MSDA kernel parity vs the XLA oracle (interpret mode on CPU; the
same test runs compiled on a real TPU). Mirrors the reference's
CUDA-vs-pytorch check (models/dino/ops/test.py:31-60)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from datr_tpu.ops.msda import ms_deform_attn_xla

SHAPES = ((6, 4), (3, 2))
S = sum(h * w for h, w in SHAPES)


@pytest.fixture
def inputs():
    rng = np.random.default_rng(0)
    B, Lq, H, D, P = 1, 5, 2, 8, 2
    L = len(SHAPES)
    value = rng.standard_normal((B, S, H, D)).astype(np.float32)
    loc = rng.random((B, Lq, H, L, P, 2)).astype(np.float32)
    attn = rng.random((B, Lq, H, L, P)).astype(np.float32)
    attn /= attn.sum(axis=(-1, -2), keepdims=True)
    return value, loc, attn


def test_pallas_kernel_matches_xla_interpret(inputs):
    value, loc, attn = inputs
    from jax.experimental.pallas import tpu as pltpu

    from datr_tpu.ops import msda_pallas

    want = np.asarray(ms_deform_attn_xla(value, SHAPES, loc, attn))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            msda_pallas.ms_deform_attn_pallas_fwd(value, SHAPES, loc, attn)
        )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_custom_vjp_matches_xla_grads(inputs):
    value, loc, attn = inputs
    from jax.experimental.pallas import tpu as pltpu

    from datr_tpu.ops.msda_pallas import ms_deform_attn_pallas

    def f_xla(v, l, a):
        return jnp.sum(ms_deform_attn_xla(v, SHAPES, l, a) ** 2)

    def f_pl(v, l, a):
        return jnp.sum(ms_deform_attn_pallas(v, SHAPES, l, a) ** 2)

    g_want = jax.grad(f_xla, argnums=(0, 1, 2))(value, loc, attn)
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(f_pl, argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
