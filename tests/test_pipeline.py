"""Pipeline-parallel (GPipe over a 'pipe' mesh axis) tests on the 8 virtual
CPU devices: the generic gpipe schedule matches a sequential layer stack in
values AND grads, composes with data parallelism, and the DINO encoder_fn
integration reproduces the sequential model forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from datr_tpu.parallel.pipeline import (
    gpipe,
    make_pp_encoder_fn,
    stack_layer_params,
)


def _pipe_mesh(s, dp=1):
    devs = np.asarray(jax.devices()[: s * dp]).reshape(dp, s)
    return Mesh(devs, ("data", "pipe"))


def _toy_stage(p, shared, x, aux):
    # one "layer": residual tanh dense + a per-microbatch additive aux
    return x + jnp.tanh(x @ p["w"] + p["b"]) + aux


def _toy_params(rng, n_layers, d):
    ks = jax.random.split(rng, n_layers)
    return {
        "w": jnp.stack(
            [jax.random.normal(k, (d, d)) * 0.3 for k in ks]
        ),
        "b": jnp.stack(
            [jax.random.normal(k, (d,)) * 0.1 for k in ks]
        ),
    }


def _sequential(stacked, x, aux):
    n = stacked["w"].shape[0]
    for i in range(n):
        p = jax.tree.map(lambda v: v[i], stacked)
        x = _toy_stage(p, (), x, aux)
    return x


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
@pytest.mark.parametrize("stages,n_micro", [(2, 2), (4, 2), (2, 4)])
def test_gpipe_matches_sequential(stages, n_micro):
    d, B, L = 8, 4, 4
    rng = jax.random.PRNGKey(0)
    stacked = _toy_params(rng, L, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, d))
    aux = jax.random.normal(jax.random.PRNGKey(2), (B, d)) * 0.05
    mesh = _pipe_mesh(stages)

    ref = _sequential(stacked, x, aux)
    with mesh:
        out = jax.jit(
            lambda p, xx, aa: gpipe(
                _toy_stage, p, (), xx, aa, mesh=mesh, n_micro=n_micro
            )
        )(stacked, x, aux)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_gpipe_grads_match_sequential():
    """The scan+ppermute pipeline transposes to the reverse pipeline: grads
    w.r.t. stacked layer params and input equal the sequential stack's."""
    d, B, L, S, M = 8, 4, 4, 4, 2
    stacked = _toy_params(jax.random.PRNGKey(0), L, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, d))
    aux = jnp.zeros((B, d))
    mesh = _pipe_mesh(S)

    def loss_seq(p, xx):
        return jnp.sum(_sequential(p, xx, aux) ** 2)

    def loss_pp(p, xx):
        return jnp.sum(
            gpipe(_toy_stage, p, (), xx, aux, mesh=mesh, n_micro=M) ** 2
        )

    g_ref = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
    with mesh:
        g_pp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(stacked, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gpipe_composes_with_dp():
    """PP x DP in one shard_map: batch dim sharded over 'data' while layers
    pipeline over 'pipe' (2x4 mesh)."""
    d, B, L, S, M = 8, 8, 4, 4, 2
    stacked = _toy_params(jax.random.PRNGKey(0), L, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, d))
    aux = jnp.zeros((B, d))
    mesh = _pipe_mesh(S, dp=2)

    ref = _sequential(stacked, x, aux)
    with mesh:
        out = jax.jit(
            lambda p, xx: gpipe(
                _toy_stage, p, (), xx, aux, mesh=mesh, n_micro=M,
                dp_axis="data",
            )
        )(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _tiny_model(**kw):
    from datr_tpu.models.dino import DINO

    return DINO(num_classes=4, num_queries=10, hidden_dim=32, nheads=2,
                enc_layers=4, dec_layers=2, dim_feedforward=64,
                dn_number=2, dn_single_pad=2, dn_labelbook_size=4,
                use_remat=False, **kw)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_pp_encoder_forward_matches_sequential():
    model = _tiny_model()
    B, H, W = 2, 32, 32
    imgs = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 3))
    pad = jnp.zeros((B, H, W), bool)
    params = model.init(jax.random.PRNGKey(1), imgs, pad, train=False)

    ref = model.apply(params, imgs, pad, train=False)

    mesh = _pipe_mesh(2)
    with mesh:
        enc_fn = make_pp_encoder_fn(model, params, mesh=mesh, n_micro=2)
        out = jax.jit(
            lambda p, i, m: model.apply(p, i, m, train=False,
                                        encoder_fn=enc_fn)
        )(params, imgs, pad)
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), np.asarray(ref["pred_boxes"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), np.asarray(ref["pred_logits"]),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_pp_encoder_grads_flow_to_canonical_layers():
    """Grads through the pipelined encoder reach the enc_layer{i} leaves
    (via the in-graph stacking) and match the sequential model's grads."""
    model = _tiny_model()
    B, H, W = 2, 32, 32
    imgs = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 3))
    pad = jnp.zeros((B, H, W), bool)
    params = model.init(jax.random.PRNGKey(1), imgs, pad, train=False)
    mesh = _pipe_mesh(2)

    # differentiate the LOGITS: at init every pred_boxes->encoder grad path
    # runs through the zero-initialized bbox-head last layer (DETR
    # convention) or the detached two-stage refs, so box grads w.r.t.
    # encoder params are exactly zero in the sequential model too
    def loss_seq(p):
        out = model.apply(p, imgs, pad, train=False)
        return jnp.sum(out["pred_logits"] ** 2)

    def loss_pp(p):
        enc_fn = make_pp_encoder_fn(model, p, mesh=mesh, n_micro=2)
        out = model.apply(p, imgs, pad, train=False, encoder_fn=enc_fn)
        return jnp.sum(out["pred_logits"] ** 2)

    g_ref = jax.grad(loss_seq)(params)["params"]
    with mesh:
        g_pp = jax.jit(jax.grad(loss_pp))(params)["params"]
    for i in range(model.enc_layers):
        for a, b in zip(
            jax.tree.leaves(g_ref[f"enc_layer{i}"]),
            jax.tree.leaves(g_pp[f"enc_layer{i}"]),
        ):
            assert np.any(np.asarray(b) != 0.0)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-3, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
@pytest.mark.slow
def test_train_step_burnin_with_pp_matches():
    """Full burn-in train step with the pipelined encoder (pp_mesh/pp_n_micro
    static args, steps.py) produces the same updated params as the
    sequential step — grads reach enc_layer{i} through the in-graph
    stacking."""
    from datr_tpu.train.criterion import CriterionCfg, build_weight_dict
    from datr_tpu.train.optim import make_optimizer
    from datr_tpu.train.state import create_train_state
    from datr_tpu.train.steps import train_step_burnin

    K, HD = 3, 32
    model = _tiny_model()
    B = 4
    images = jax.random.uniform(jax.random.PRNGKey(9), (B, 32, 32, 3))
    pad_mask = jnp.zeros((B, 32, 32), bool)
    targets = dict(
        boxes=jnp.tile(jnp.array([[0.5, 0.5, 0.3, 0.3]]), (B // 2, 2, 1)),
        labels=jnp.ones((B // 2, 2), jnp.int32),
        valid=jnp.ones((B // 2, 2), bool),
    )
    K = model.num_classes
    HD = model.hidden_dim
    params = model.init(jax.random.PRNGKey(0), images, pad_mask,
                        targets=targets, dn_rng=jax.random.PRNGKey(1),
                        train=True, global_proto=jnp.zeros((K, HD)),
                        amount=jnp.zeros((K,)))
    tx = make_optimizer(params)
    ccfg = CriterionCfg(num_classes=K, dn_single_pad=2, dn_groups=1)
    wd = build_weight_dict(dec_layers=model.dec_layers)
    batch = dict(images=images, pad_mask=pad_mask, **targets)
    st0 = create_train_state(params, tx, K, HD, jax.random.PRNGKey(2))

    s_seq, m_seq = train_step_burnin(
        jax.tree.map(jnp.copy, st0), batch, model, tx, ccfg, wd
    )
    mesh = _pipe_mesh(2)
    with mesh:
        s_pp, m_pp = train_step_burnin(
            jax.tree.map(jnp.copy, st0), batch, model, tx, ccfg, wd,
            pp_mesh=mesh, pp_n_micro=2,
        )
    np.testing.assert_allclose(float(m_seq["loss"]), float(m_pp["loss"]),
                               rtol=2e-3)
    flat_a = jax.tree_util.tree_flatten_with_path(s_seq.params)[0]
    flat_b = jax.tree_util.tree_leaves(jax.device_get(s_pp.params))
    for (kp, a), b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-5, rtol=5e-3,
            err_msg=f"param mismatch at {jax.tree_util.keystr(kp)}",
        )


def test_stack_layer_params_roundtrip():
    params = {
        "enc_layer0": {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))},
        "enc_layer1": {"w": 2 * jnp.ones((3, 3)), "b": jnp.ones((3,))},
        "other": {"w": jnp.ones((1,))},
    }
    s = stack_layer_params(params, "enc_layer{}", 2)
    assert s["w"].shape == (2, 3, 3)
    assert float(s["w"][1, 0, 0]) == 2.0
    assert float(s["b"][1, 0]) == 1.0
