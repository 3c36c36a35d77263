"""End-to-end smoke: one burn-in DA train step and one self-training step on a
tiny model + synthetic batch (the reference's --debug smoke-run equivalent,
engine.py:125-128)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from datr_tpu.models.dino import DINO
from datr_tpu.train.criterion import CriterionCfg, build_weight_dict
from datr_tpu.train.optim import make_optimizer
from datr_tpu.train.state import create_train_state
from datr_tpu.train.steps import train_step_burnin, train_step_self_training
from datr_tpu.train.ema import ema_update, ramped_decay, cosine_decay

K, HD = 4, 32


@pytest.fixture(scope="module")
def setup():
    model = DINO(
        num_classes=K, num_queries=12, hidden_dim=HD, nheads=4,
        enc_layers=1, dec_layers=2, dim_feedforward=64,
        dn_number=4, dn_single_pad=2, dn_labelbook_size=K,
        use_remat=False,
    )
    B, H, W = 4, 64, 64
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (B, H, W, 3))
    pad_mask = jnp.zeros((B, H, W), bool).at[:, 56:, :].set(True)
    targets = dict(
        boxes=jnp.tile(jnp.array([[0.4, 0.4, 0.2, 0.3]]), (2, 3, 1)),
        labels=jnp.ones((2, 3), jnp.int32),
        valid=jnp.ones((2, 3), bool).at[1, 2].set(False),
    )
    gp = jnp.zeros((K, HD))
    am = jnp.zeros((K,))
    params = model.init(
        jax.random.PRNGKey(1), images, pad_mask, targets=targets,
        dn_rng=jax.random.PRNGKey(2), train=True, self_training=True,
        global_proto=gp, amount=am,
    )
    tx = make_optimizer(params, lr=1e-4, lr_backbone=1e-5)
    state = create_train_state(params, tx, K, HD, jax.random.PRNGKey(3))
    batch = dict(
        images=images, pad_mask=pad_mask, **targets,
        images_strong=images * 0.9,
        real_sizes=jnp.array([[56, 64], [56, 64]], jnp.float32),
    )
    ccfg = CriterionCfg(num_classes=K, dn_single_pad=2, dn_groups=2)
    wd = build_weight_dict(dec_layers=2)
    wd["loss_self_training"] = 1.0
    return model, tx, state, batch, ccfg, wd


def _copy_state(state):
    return jax.tree.map(jnp.copy, state)


def test_burnin_step(setup):
    model, tx, state0, batch, ccfg, wd = setup
    state = _copy_state(state0)  # train_step donates its input state
    new_state, metrics = train_step_burnin(state, batch, model, tx, ccfg, wd)
    state = state0
    assert np.isfinite(float(metrics["loss"]))
    # params actually changed
    d = jax.tree.map(lambda a, b: jnp.abs(a - b).max(), state.params,
                     new_state.params)
    assert max(float(x) for x in jax.tree.leaves(d)) > 0
    # frozen backbone stem must NOT change
    stem = new_state.params["params"]["backbone"]["conv1"]["kernel"]
    stem0 = state.params["params"]["backbone"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(stem), np.asarray(stem0))
    # frozen-BN stats in trainable stages must not change either
    bn = new_state.params["params"]["backbone"]["layer2_block0"]["bn1"]
    bn0 = state.params["params"]["backbone"]["layer2_block0"]["bn1"]
    np.testing.assert_array_equal(
        np.asarray(bn["running_mean"]), np.asarray(bn0["running_mean"])
    )
    np.testing.assert_array_equal(
        np.asarray(bn["weight"]), np.asarray(bn0["weight"])
    )
    # prototype state advanced
    assert float(new_state.amount.sum()) > 0


def test_self_training_step(setup):
    model, tx, state0, batch, ccfg, wd = setup
    state = _copy_state(state0)
    thr = jnp.full((K,), 0.0)  # accept everything -> pseudo labels exist
    new_state, metrics = train_step_self_training(
        state, batch, model, tx, ccfg, wd, thr, canvas_hw=(64, 64),
        num_select=10, max_pseudo=5,
    )
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["num_pseudo"]) > 0


def test_ema_updates(setup):
    model, tx, state, batch, ccfg, wd = setup
    p = state.params
    pert = jax.tree.map(lambda x: x + 1.0, p)
    ema = ema_update(p, pert, 0.9)
    leaf = jax.tree.leaves(ema)[0]
    leaf0 = jax.tree.leaves(p)[0]
    np.testing.assert_allclose(
        np.asarray(leaf), np.asarray(leaf0) * 0.9 + (np.asarray(leaf0) + 1) * 0.1,
        rtol=1e-5,
    )
    assert float(ramped_decay(0.9997, jnp.float32(0.0))) == 0.0
    assert 0.99 < float(ramped_decay(0.9997, jnp.float32(1e9))) <= 0.99971
    assert abs(float(cosine_decay(0.9, 0.9999, 0, 10)) - 0.9) < 1e-6
    assert abs(float(cosine_decay(0.9, 0.9999, 10, 10)) - 0.9999) < 1e-6
