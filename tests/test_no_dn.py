"""use_dn=False path: training forward without CDN (reference: build_dino
sets dn_number=0 when use_dn is off, dino.py:1062)."""

import jax
import jax.numpy as jnp

from datr_tpu.models.dino import DINO
from datr_tpu.train.criterion import CriterionCfg, build_weight_dict, \
    criterion, weighted_total

K, HD = 3, 32


def test_train_forward_without_dn():
    model = DINO(num_classes=K, num_queries=8, hidden_dim=HD, nheads=2,
                 enc_layers=1, dec_layers=1, dim_feedforward=64,
                 dn_number=0, dn_single_pad=2, dn_labelbook_size=K,
                 use_remat=False)
    x = jnp.zeros((2, 32, 32, 3))
    m = jnp.zeros((2, 32, 32), bool)
    tg = dict(boxes=jnp.full((1, 2, 4), 0.5),
              labels=jnp.ones((1, 2), jnp.int32),
              valid=jnp.ones((1, 2), bool))
    p = model.init(jax.random.PRNGKey(0), x, m, targets=tg,
                   dn_rng=jax.random.PRNGKey(1), train=True,
                   global_proto=jnp.zeros((K, HD)), amount=jnp.zeros((K,)))
    out = model.apply(p, x, m, targets=tg, dn_rng=jax.random.PRNGKey(1),
                      train=True, global_proto=jnp.zeros((K, HD)),
                      amount=jnp.zeros((K,)))
    assert "dn_logits" not in out
    assert out["pred_logits"].shape == (1, 8, K)

    cfg = CriterionCfg(num_classes=K, dn_single_pad=2, dn_groups=1)
    losses = criterion(out, tg["labels"], tg["boxes"], tg["valid"], cfg)
    assert "loss_ce_dn" not in losses
    wd = build_weight_dict(dec_layers=1, use_dn=False)
    total = weighted_total(losses, wd)
    assert jnp.isfinite(total)
