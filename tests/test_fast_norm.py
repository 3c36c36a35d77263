"""FastLayerNorm/FastGroupNorm (bf16 TPU path) match the flax reference
norms within bf16 resolution, standalone and through the full model."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from datr_tpu.models.norms import FastGroupNorm, FastLayerNorm


def test_fast_layer_norm_matches_flax():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 37, 256)) * 3 + 1.5,
                    jnp.bfloat16)
    ref = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
    fast = FastLayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
    p = ref.init(jax.random.PRNGKey(0), x)
    p = jax.tree.map(
        lambda v: v + jax.random.normal(jax.random.PRNGKey(1), v.shape) * 0.1,
        p)
    a = np.asarray(ref.apply(p, x), np.float32)
    b = np.asarray(fast.apply(p, x), np.float32)
    # bf16 storage resolution is ~0.4%; the single-pass stats stay inside it
    np.testing.assert_allclose(a, b, atol=0.03, rtol=0.02)
    assert np.abs(a - b).mean() < 5e-3


def test_fast_group_norm_matches_flax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 13, 17, 256)) * 2 - 0.5,
                    jnp.bfloat16)
    ref = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.bfloat16)
    fast = FastGroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.bfloat16)
    p = ref.init(jax.random.PRNGKey(0), x)
    a = np.asarray(ref.apply(p, x), np.float32)
    b = np.asarray(fast.apply(p, x), np.float32)
    np.testing.assert_allclose(a, b, atol=0.03, rtol=0.02)
    assert np.abs(a - b).mean() < 5e-3


def test_fast_norm_model_outputs_close():
    """Full tiny-model eval forward: fast_norm perturbs bf16 outputs well
    inside the documented bf16-vs-f32 envelope."""
    from datr_tpu.models.dino import DINO

    kw = dict(
        num_classes=5, num_queries=12, hidden_dim=64, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=64,
        dn_number=4, dn_single_pad=4, dn_labelbook_size=5,
        use_remat=False, dtype=jnp.bfloat16,
    )
    m_ref = DINO(**kw, fast_norm=False)
    m_fast = DINO(**kw, fast_norm=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 64, 96, 3))
    mask = jnp.zeros((1, 64, 96), bool)
    params = m_ref.init(rng, x, mask, train=False)
    a = m_ref.apply(params, x, mask, train=False)
    b = m_fast.apply(params, x, mask, train=False)  # same param tree
    da = np.asarray(a["pred_boxes"], np.float32)
    db = np.asarray(b["pred_boxes"], np.float32)
    np.testing.assert_allclose(da, db, atol=0.02)
    la = np.asarray(a["pred_logits"], np.float32)
    lb = np.asarray(b["pred_logits"], np.float32)
    np.testing.assert_allclose(la, lb, atol=0.25)  # logit scale
