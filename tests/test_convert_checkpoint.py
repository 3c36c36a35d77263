"""Checkpoint-converter test: a synthetic reference-keyed state dict converts
into a tree our DINO model accepts, and the forward runs (weight-level parity
harness for published DATR checkpoints)."""

import sys
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_checkpoint import convert_checkpoint  # noqa: E402


from convert_checkpoint import fake_reference_state_dict as _fake_reference_sd  # noqa: E402,E501


def test_convert_and_forward():
    d, heads, K = 64, 4, 3
    sd = _fake_reference_sd(d=d, heads=heads, K=K)
    tree = convert_checkpoint(sd, enc_layers=1, dec_layers=1, n_heads=heads,
                              d_model=d)

    from datr_tpu.models.dino import DINO

    model = DINO(num_classes=K, num_queries=8, hidden_dim=d, nheads=heads,
                 enc_layers=1, dec_layers=1, dim_feedforward=128,
                 dn_number=2, dn_single_pad=2, dn_labelbook_size=K,
                 use_remat=False)
    x = jnp.zeros((1, 64, 64, 3))
    m = jnp.zeros((1, 64, 64), bool)
    ref_params = model.init(jax.random.PRNGKey(0), x, m, train=False)

    # structural compatibility: every converted leaf matches the model's
    # expected shape (d_img/proto_d are allowed to be missing in eval ckpts)
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_params["params"])[0]
    conv = tree["params"]

    def lookup(tree_, path):
        node = tree_
        for p in path:
            k = p.key
            if k not in node:
                return None
            node = node[k]
        return node

    missing, mismatched = [], []
    for path, leaf in flat_ref:
        got = lookup(conv, path)
        name = "/".join(p.key for p in path)
        if got is None:
            missing.append(name)
        elif tuple(np.shape(got)) != tuple(leaf.shape):
            mismatched.append((name, np.shape(got), leaf.shape))
    allowed_missing = {"d_img", "proto_d"}
    bad_missing = [m_ for m_ in missing
                   if m_.split("/")[0] not in allowed_missing]
    assert not bad_missing, bad_missing[:10]
    assert not mismatched, mismatched[:10]

    # forward runs with converted weights (fill DA heads from init)
    merged = jax.tree_util.tree_map(lambda x_: x_, ref_params)
    merged["params"].update(
        {k: v for k, v in conv.items() if k in ref_params["params"]}
    )
    out = model.apply(merged, x, m, train=False)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
