"""Criterion unit tests: loss values on hand-checkable fixtures and the
weight-dict key structure (reference: dino.py:1071-1127)."""

import numpy as np
import jax
import jax.numpy as jnp

from datr_tpu.train.criterion import (
    CriterionCfg,
    build_weight_dict,
    criterion,
    da_contrast_loss,
    da_image_loss,
    da_proto_loss,
    detection_losses,
    weighted_total,
)


def test_detection_losses_perfect_prediction():
    K, B, N, T = 4, 1, 6, 2
    gt_boxes = jnp.array([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.1, 0.1]]])
    gt_labels = jnp.array([[1, 2]])
    gt_valid = jnp.ones((B, T), bool)
    boxes = jnp.tile(jnp.array([[[0.5, 0.5, 0.5, 0.5]]]), (1, N, 1))
    boxes = boxes.at[0, 2].set(gt_boxes[0, 0]).at[0, 5].set(gt_boxes[0, 1])
    logits = jnp.full((B, N, K), -10.0)
    logits = logits.at[0, 2, 1].set(10.0).at[0, 5, 2].set(10.0)
    assign = jnp.array([[2, 5]])
    out = detection_losses(
        logits, boxes, gt_labels, gt_boxes, gt_valid, assign,
        jnp.float32(T), 0.25,
    )
    assert float(out["loss_bbox"]) < 1e-6
    assert float(out["loss_giou"]) < 1e-5
    assert float(out["loss_ce"]) < 1e-2
    assert float(out["class_error"]) < 1e-6


def test_weight_dict_structure():
    w = build_weight_dict(dec_layers=6)
    # base + DA
    for k in ["loss_ce", "loss_bbox", "loss_giou", "loss_backbone_DA",
              "loss_proto_DA", "loss_global_proto_DA", "loss_ce_dn",
              "loss_ce_interm", "loss_bbox_interm"]:
        assert k in w, k
    # aux fan-out for 5 intermediate layers, incl dn aux
    for i in range(5):
        assert w[f"loss_ce_{i}"] == 1.0
        assert w[f"loss_bbox_{i}"] == 5.0
        assert w[f"loss_ce_dn_{i}"] == 1.0
    assert "loss_ce_5" not in w
    assert w["loss_backbone_DA"] == 0.1


def test_da_losses_shapes_and_values():
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal((4, 10, 1)).astype(np.float32))
    v = float(da_image_loss(d))
    assert np.isfinite(v) and v > 0

    K, C = 5, 8
    protos = jnp.asarray(rng.standard_normal((2 * K, 1)).astype(np.float32))
    cm_s = jnp.array([1.0, 1, 0, 1, 0])
    cm_t = jnp.array([1.0, 0, 0, 1, 1])
    v2 = float(da_proto_loss(protos, cm_s, cm_t))
    assert np.isfinite(v2)

    qs = jnp.asarray(rng.standard_normal((K, C)).astype(np.float32))
    qt = jnp.asarray(rng.standard_normal((K, C)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((K, C)).astype(np.float32))
    v3 = float(da_contrast_loss(qs, qt, cm_s, cm_t, g))
    assert np.isfinite(v3)
    # class-aligned queries must beat class-permuted queries
    ones = jnp.ones(K)
    aligned = float(da_contrast_loss(g, g, ones, ones, g))
    permuted = float(
        da_contrast_loss(jnp.roll(g, 1, axis=0), jnp.roll(g, 2, axis=0),
                         ones, ones, g)
    )
    assert aligned < permuted


def test_full_criterion_runs_and_is_differentiable():
    rng = np.random.default_rng(1)
    K, B, N, T, n_dec, pad = 4, 2, 12, 3, 3, 8
    cfg = CriterionCfg(num_classes=K, dn_single_pad=2, dn_groups=2)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    outputs = {
        "pred_logits": mk(B, N, K),
        "pred_boxes": jax.nn.sigmoid(mk(B, N, 4)),
        "aux_logits": mk(n_dec - 1, B, N, K),
        "aux_boxes": jax.nn.sigmoid(mk(n_dec - 1, B, N, 4)),
        "interm_logits": mk(B, N, K),
        "interm_boxes": jax.nn.sigmoid(mk(B, N, 4)),
        "dn_logits": mk(n_dec, B, pad, K),
        "dn_boxes": jax.nn.sigmoid(mk(n_dec, B, pad, 4)),
        "dn_valid": jnp.ones((B, pad), bool),
        "da_backbone": mk(B, 20, 1),
        "da_protos": mk(2 * K, 1),
        "da_class_map_source": jnp.ones(K),
        "da_class_map_target": jnp.ones(K),
        "da_query_source": mk(K, 16),
        "da_query_target": mk(K, 16),
        "new_global_proto": mk(K, 16),
    }
    gt_labels = jnp.asarray(rng.integers(0, K, (B, T)).astype(np.int32))
    gt_boxes = jax.nn.sigmoid(mk(B, T, 4)) * 0.4 + 0.3
    gt_valid = jnp.ones((B, T), bool).at[1, 2].set(False)

    losses = criterion(outputs, gt_labels, gt_boxes, gt_valid, cfg)
    w = build_weight_dict(dec_layers=n_dec)
    total = weighted_total(losses, w)
    assert np.isfinite(float(total))

    def f(logits):
        o = dict(outputs, pred_logits=logits)
        return weighted_total(
            criterion(o, gt_labels, gt_boxes, gt_valid, cfg), w
        )

    g = jax.grad(f)(outputs["pred_logits"])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
