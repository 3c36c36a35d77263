"""Parity + gradient tests for multi-scale deformable attention.

Mirrors the reference's only real test (models/dino/ops/test.py): forward
parity against a torch.nn.functional.grid_sample oracle (the reference's
ms_deform_attn_core_pytorch, ops/functions/ms_deform_attn_func.py:41-61) and
gradient checks across head-dim sizes including non-powers-of-2.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from datr_tpu.ops import ms_deform_attn_xla

SHAPES = ((6, 4), (4, 3), (2, 2))  # (H_l, W_l)
S = sum(h * w for h, w in SHAPES)


def _rand_inputs(rng, B=2, Lq=5, H=2, D=8, P=3, loc_scale=1.0):
    L = len(SHAPES)
    value = rng.standard_normal((B, S, H, D)).astype(np.float32) * 0.01
    # Bias locations into [0,1] but leave some outside to exercise zero padding.
    loc = rng.random((B, Lq, H, L, P, 2)).astype(np.float32) * loc_scale
    attn = rng.random((B, Lq, H, L, P)).astype(np.float32) + 1e-5
    attn = attn / attn.sum(axis=(-1, -2), keepdims=True)
    return value, loc, attn


def _torch_oracle(value, loc, attn):
    """Reference semantics via torch grid_sample (zeros padding, no corner
    alignment), re-expressed independently of the reference code."""
    import torch
    import torch.nn.functional as F

    v = torch.from_numpy(value)  # [B, S, H, D]
    g = torch.from_numpy(loc)  # [B, Lq, H, L, P, 2]
    a = torch.from_numpy(attn)  # [B, Lq, H, L, P]
    B, _, H, D = v.shape
    _, Lq, _, L, P, _ = g.shape

    out = torch.zeros(B, Lq, H, D)
    start = 0
    for lvl, (hl, wl) in enumerate(SHAPES):
        v_l = v[:, start : start + hl * wl]  # [B, hw, H, D]
        start += hl * wl
        v_l = v_l.permute(0, 2, 3, 1).reshape(B * H, D, hl, wl)
        grid = 2.0 * g[:, :, :, lvl] - 1.0  # [B, Lq, H, P, 2]
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * H, Lq, P, 2)
        smp = F.grid_sample(
            v_l, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # [B*H, D, Lq, P]
        w = a[:, :, :, lvl].permute(0, 2, 1, 3).reshape(B * H, 1, Lq, P)
        out += (smp * w).sum(-1).reshape(B, H, D, Lq).permute(0, 3, 1, 2)
    return out.reshape(B, Lq, H * D).numpy()


@pytest.mark.parametrize("loc_scale", [1.0, 1.4])
@pytest.mark.parametrize("D", [8, 16, 30])
def test_forward_parity_vs_torch(loc_scale, D):
    rng = np.random.default_rng(0)
    value, loc, attn = _rand_inputs(rng, D=D, loc_scale=loc_scale)
    got = np.asarray(ms_deform_attn_xla(value, SHAPES, loc, attn))
    want = _torch_oracle(value, loc, attn)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gradients_finite_difference():
    rng = np.random.default_rng(1)
    value, loc, attn = _rand_inputs(rng, B=1, Lq=3, H=1, D=4, P=2)

    def f(v, l, a):
        return jnp.sum(ms_deform_attn_xla(v, SHAPES, l, a) ** 2)

    g_val, g_loc, g_attn = jax.grad(f, argnums=(0, 1, 2))(value, loc, attn)
    eps = 1e-3
    for arr, g, name in ((value, g_val, "value"), (attn, g_attn, "attn"),
                         (loc, g_loc, "loc")):
        flat = arr.reshape(-1)
        gf = np.asarray(g).reshape(-1)
        idxs = rng.choice(flat.size, size=min(10, flat.size), replace=False)
        for i in idxs:
            pert = flat.copy()
            pert[i] += eps
            up = pert.reshape(arr.shape)
            pert[i] -= 2 * eps
            dn = pert.reshape(arr.shape)
            args_up = [value, loc, attn]
            args_dn = [value, loc, attn]
            pos = {"value": 0, "loc": 1, "attn": 2}[name]
            args_up[pos] = up
            args_dn[pos] = dn
            fd = (float(f(*args_up)) - float(f(*args_dn))) / (2 * eps)
            np.testing.assert_allclose(gf[i], fd, rtol=5e-2, atol=1e-3)


def test_padding_zeroed_outside():
    """Samples fully outside [0,1] must contribute exactly zero."""
    rng = np.random.default_rng(2)
    value, loc, attn = _rand_inputs(rng, B=1, Lq=2, H=1, D=4, P=1)
    loc = loc * 0.0 + 7.5  # way outside every level
    out = np.asarray(ms_deform_attn_xla(value, SHAPES, loc, attn))
    np.testing.assert_allclose(out, 0.0, atol=1e-7)
