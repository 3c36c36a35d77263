"""AOT export: the eval forward serializes to StableHLO and the
deserialized artifact reproduces the jit outputs (tools/export_model.py)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jexport

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from export_model import build_exported  # noqa: E402

from datr_tpu.models.registry import build_model  # noqa: E402


def test_export_roundtrip():
    cfg = dict(
        num_classes=4, dn_labelbook_size=4, hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=2, dim_feedforward=64, num_queries=8,
        dn_number=0, use_remat=False, backbone="resnet50",
    )
    model, _, _ = build_model(cfg)
    B, H, W = 1, 64, 96
    images = jnp.zeros((B, H, W, 3), jnp.float32)
    pad_mask = jnp.zeros((B, H, W), bool)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, train=False)

    exported = build_exported(cfg, params, B, (H, W))
    blob = exported.serialize()
    assert len(blob) > 1000

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
    want_logits, want_boxes = jax.jit(
        lambda p, a, m: (
            model.apply(p, a, m, train=False)["pred_logits"],
            model.apply(p, a, m, train=False)["pred_boxes"],
        )
    )(params, x, pad_mask)

    restored = jexport.deserialize(blob)
    got_logits, got_boxes = restored.call(params, x, pad_mask)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_boxes),
                               np.asarray(want_boxes), atol=1e-6)
