"""Visualizer smoke tests (reference util/visualizer.py COCOVisualizer +
self_training_utils.py:show_pesudo_label_with_gt)."""

import numpy as np
import pytest
from PIL import Image

from datr_tpu.utils.visualizer import (
    denormalize_image,
    draw_boxes,
    draw_masks,
    save_pseudo_label_debug,
)


def test_draw_boxes_and_denormalize():
    arr = np.zeros((32, 48, 3), np.float32)
    img = denormalize_image(arr)
    assert img.size == (48, 32)
    out = draw_boxes(img, np.array([[4, 4, 20, 16]]), np.array([1]),
                     np.array([0.9]))
    assert np.asarray(out).sum() > np.asarray(img).sum()  # something drawn


def test_draw_masks_blends_colors():
    img = Image.new("RGB", (40, 30), (0, 0, 0))
    m = np.zeros((2, 30, 40), bool)
    m[0, 5:15, 5:20] = True
    m[1, 18:28, 25:38] = True
    out = np.asarray(draw_masks(img, m, labels=np.array([0, 1])))
    assert out[10, 10].sum() > 0  # inside mask 0 tinted
    assert out[22, 30].sum() > 0  # inside mask 1 tinted
    assert out[0, 0].sum() == 0   # background untouched
    # different classes -> different colors
    assert not np.array_equal(out[10, 10], out[22, 30])
    with pytest.raises(ValueError, match="shape"):
        draw_masks(img, np.zeros((1, 8, 8), bool))


def test_save_pseudo_label_debug(tmp_path):
    img = np.zeros((24, 32, 3), np.float32)
    pseudo = dict(boxes=np.array([[0.5, 0.5, 0.4, 0.4]]),
                  labels=np.array([2]), valid=np.array([True]))
    gt = dict(boxes=np.array([[0.4, 0.4, 0.3, 0.3]]),
              labels=np.array([1]), valid=np.array([True]))
    p = str(tmp_path / "dbg.png")
    canvas = save_pseudo_label_debug(img, pseudo, gt, (24, 32), p)
    assert canvas.width == 32 * 2 + 8
    assert Image.open(p).size == canvas.size


def test_run_inference_with_masks():
    """inference helper returns original-size instance masks when asked."""
    import jax
    import jax.numpy as jnp

    from datr_tpu.inference import run_inference
    from datr_tpu.models.dino import DINO

    model = DINO(
        num_classes=3, num_queries=6, hidden_dim=128, nheads=8,
        enc_layers=1, dec_layers=2, dim_feedforward=32, dn_number=0,
        with_masks=True, use_remat=False,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1, 64, 64), bool))
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (50, 70, 3), np.uint8))
    boxes, labels, scores, masks = run_inference(
        model, params, img, canvas_hw=(64, 64), num_select=4,
        threshold=-1.0, with_masks=True,
    )
    assert masks.shape == (len(boxes), 50, 70)
    assert masks.dtype == bool
