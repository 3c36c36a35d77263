"""End-to-end smoke: the synthetic-data loop must learn.

Equivalent of the reference's --debug smoke runs (engine.py:125-128) plus a
learnability check the reference never had: N burn-in steps on synthetic
rectangles must cut the matched-class focal loss, and the data pipeline +
train step + EMA + eval must compose."""

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
from datr_tpu.train.steps import train_step_burnin

CANVAS = (96, 128)
K, HD = 5, 32


@pytest.mark.slow
def test_burnin_learns_on_synthetic():
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

    losses = []
    for epoch in range(6):
        for batch in one_epoch_loader(epoch):
            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if k not in ("images_strong", "real_sizes")}
            state, metrics = train_step_burnin(state, arrays, model, tx,
                                               ccfg, wd)
            losses.append(float(metrics["loss"]))
        state = update_emas_per_epoch(
            state, epoch, {"ema_decay_teacher": 0.9, "epochs": 6,
                           "burn_epochs": 0, "ema_decay_best_model": 0.5},
        )
    assert np.isfinite(losses).all()
    first = np.mean(losses[:4])
    last = np.mean(losses[-4:])
    assert last < first * 0.9, (first, last)

    # eval path end-to-end (AP will be poor; just must run and be sane)
    val = SyntheticDetectionDataset(4, hw=(80, 112), num_classes=K - 1,
                                    seed=3)
    ev_loader = make_eval_loader(val, 2, CANVAS,
                                 EvalTransform(80, 120), max_boxes=8)
    stats = evaluate(state.params, model, ev_loader, val.categories)
    assert len(stats["coco_eval_bbox"]) == 12
