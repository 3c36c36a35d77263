"""Cross-architecture distillation: an external teacher (different
sampling-point count than the student) supplies the pseudo labels in the
self-training step — the migration path from parity checkpoints onto the
fast config (configs/DINO/DINO_4scale_fast.py). No reference equivalent;
builds on the reference self-training loop (engine.py:146-259)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datr_tpu.models.dino import DINO
from datr_tpu.train.criterion import CriterionCfg, build_weight_dict
from datr_tpu.train.optim import make_optimizer
from datr_tpu.train.state import create_train_state
from datr_tpu.train.steps import train_step_self_training


def _model(points: int, **kw):
    return DINO(
        num_classes=4, num_queries=8, hidden_dim=64, nheads=4,
        enc_layers=1, dec_layers=1, dim_feedforward=64,
        dn_number=2, dn_single_pad=2, dn_labelbook_size=4,
        enc_n_points=points, dec_n_points=points, use_remat=False, **kw,
    )


@pytest.mark.slow
def test_distill_step_uses_external_teacher():
    K, HD = 4, 64
    student = _model(points=2)   # fast-config-style student
    teacher = _model(points=4)   # parity-style teacher
    B, H, W = 4, 64, 64
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (B, H, W, 3))
    pad = jnp.zeros((B, H, W), bool)
    targets = dict(
        boxes=jnp.tile(jnp.asarray([[0.5, 0.5, 0.25, 0.25]]), (B // 2, 2, 1)),
        labels=jnp.ones((B // 2, 2), jnp.int32),
        valid=jnp.ones((B // 2, 2), bool),
    )
    s_params = student.init(
        rng, images, pad, targets=targets, dn_rng=jax.random.PRNGKey(1),
        train=True, self_training=True,
        global_proto=jnp.zeros((K, HD)), amount=jnp.zeros((K,)),
    )
    t_params = teacher.init(jax.random.PRNGKey(7), images[:1], pad[:1],
                            train=False)
    # the two architectures genuinely differ (teacher has wider sampling
    # offset tables), so EMA-based self-training could not use it
    assert sum(x.size for x in jax.tree.leaves(s_params)) != sum(
        x.size for x in jax.tree.leaves(t_params))

    tx = make_optimizer(s_params)
    state = create_train_state(s_params, tx, K, HD, jax.random.PRNGKey(2))
    ccfg = CriterionCfg(num_classes=K, dn_single_pad=2, dn_groups=1)
    wd = build_weight_dict(dec_layers=1)
    batch = dict(
        images=images, pad_mask=pad, images_strong=images,
        real_sizes=jnp.tile(jnp.asarray([[H, W]], jnp.float32), (B // 2, 1)),
        **targets,
    )
    thr = jnp.full((K,), 0.0, jnp.float32)  # accept everything
    before = jax.device_get(s_params)  # snapshot: the step donates `state`
    new_state, metrics = train_step_self_training(
        state, batch, student, tx, ccfg, wd, thr, canvas_hw=(H, W),
        num_select=8, max_pseudo=4,
        teacher_model=teacher, teacher_params=t_params,
    )
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["num_pseudo"]) > 0  # threshold 0 accepts top-k
    # student params updated
    moved = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        before, jax.device_get(new_state.params))
    assert any(jax.tree.leaves(moved))


def test_distill_cli_flags_parse():
    from datr_tpu.main import get_args_parser

    args = get_args_parser().parse_args([
        "-c", "x.py", "--distill_teacher_ckpt", "/tmp/t",
        "--distill_teacher_config", "configs/DINO/DINO_4scale.py",
    ])
    assert args.distill_teacher_ckpt == "/tmp/t"
    assert args.distill_teacher_config.endswith("DINO_4scale.py")
