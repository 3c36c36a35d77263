"""End-to-end self-training learnability (VERDICT r2 #3).

Exercises the full teacher -> threshold/NMS pseudo-labels -> strong-aug
student loop (reference engine.py:146-259 train_one_epoch_with_self_training)
on synthetic DA data: after burn-in, self-training epochs must produce
nonzero pseudo-labels and improve the student on the TARGET domain relative
to the burn-in-only snapshot.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from datr_tpu.data.loader import make_da_loader, make_eval_loader
from datr_tpu.data.synthetic import (
    SyntheticDetectionDataset,
    synthetic_da_pair,
)
from datr_tpu.data.transforms import DATrainTransform, EvalTransform
from datr_tpu.engine import evaluate, update_emas_per_epoch
from datr_tpu.models.dino import DINO
from datr_tpu.train.criterion import CriterionCfg, build_weight_dict
from datr_tpu.train.optim import make_optimizer
from datr_tpu.train.state import create_train_state
from datr_tpu.train.steps import train_step_burnin, train_step_self_training

CANVAS = (96, 128)
K, HD = 5, 32
EMA_CFG = {"ema_decay_teacher": 0.6, "epochs": 10, "burn_epochs": 4,
           "ema_decay_best_model": 0.5}


@pytest.mark.slow
def test_self_training_improves_target_domain():
    model = DINO(
        num_classes=K, num_queries=16, hidden_dim=HD, nheads=4,
        enc_layers=1, dec_layers=2, dim_feedforward=64,
        dn_number=4, dn_single_pad=4, dn_labelbook_size=K,
        use_remat=False,
    )
    ds = synthetic_da_pair(n_images=8, hw=(80, 112), num_classes=K - 1)
    tf = DATrainTransform(scales=[72, 80], max_size=120,
                          scales2_resize=[64, 72], scales2_crop=[48, 72])

    def one_epoch_loader(epoch):
        return make_da_loader(ds, 2, CANVAS, tf, max_boxes=8, seed=0,
                              epoch=epoch, num_threads=2)

    batch0 = next(iter(one_epoch_loader(0)))
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch0["images"]),
        jnp.asarray(batch0["pad_mask"]),
        targets={k: jnp.asarray(batch0[k]) for k in ("boxes", "labels",
                                                     "valid")},
        dn_rng=jax.random.PRNGKey(1), train=True,
        global_proto=jnp.zeros((K, HD)), amount=jnp.zeros((K,)),
    )
    tx = make_optimizer(params, lr=2e-4, lr_backbone=2e-5)
    state = create_train_state(params, tx, K, HD, jax.random.PRNGKey(2))
    ccfg = CriterionCfg(num_classes=K, dn_single_pad=4, dn_groups=1)
    wd = build_weight_dict(dec_layers=2)

    # --- burn-in (reference burn_epochs phase) ---
    for epoch in range(4):
        for batch in one_epoch_loader(epoch):
            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if k not in ("images_strong", "real_sizes")}
            state, _ = train_step_burnin(state, arrays, model, tx, ccfg, wd)
        state = update_emas_per_epoch(state, epoch, EMA_CFG)

    # target-domain val: the foggy variant the student never saw labels for
    val = SyntheticDetectionDataset(6, hw=(80, 112), num_classes=K - 1,
                                    seed=11, fog=0.35)
    ev_loader = make_eval_loader(val, 2, CANVAS, EvalTransform(80, 120),
                                 max_boxes=8)
    ap_burn = evaluate(state.params, model, ev_loader,
                       val.categories)["ap50"]

    # --- self-training epochs (engine.py:146-259) ---
    thr = jnp.full((K,), 0.2, jnp.float32)
    pseudo_counts = []
    losses_tgt = []
    for epoch in range(4, 10):
        for batch in one_epoch_loader(epoch):
            arrays = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = train_step_self_training(
                state, arrays, model, tx, ccfg, wd, thr,
                canvas_hw=CANVAS, num_select=16, max_pseudo=8,
            )
            pseudo_counts.append(int(metrics["num_pseudo"]))
            losses_tgt.append(float(metrics["loss"]))
        state = update_emas_per_epoch(state, epoch, EMA_CFG)

    assert np.isfinite(losses_tgt).all()
    # the teacher must actually emit pseudo-labels
    assert sum(pseudo_counts) > 0
    assert max(pseudo_counts[-len(pseudo_counts) // 2:]) > 0

    ap_st = evaluate(state.params, model, ev_loader, val.categories)["ap50"]
    # self-training must not hurt, and should measurably improve, the
    # target-domain student (reference north-star mechanism)
    assert ap_st >= ap_burn, (ap_burn, ap_st)
    # teacher track is also evaluable end to end
    ap_teacher = evaluate(state.ema_teacher, model, ev_loader,
                          val.categories)["ap50"]
    assert np.isfinite(ap_teacher)
