"""Inference helper test: run_inference end-to-end on a synthetic image with
random weights (inference.py equivalent path)."""

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from datr_tpu.inference import run_inference
from datr_tpu.models.dino import DINO


def test_run_inference_shapes_and_threshold():
    K = 4
    model = DINO(num_classes=K, num_queries=12, hidden_dim=32, nheads=2,
                 enc_layers=1, dec_layers=1, dim_feedforward=64,
                 dn_number=2, dn_single_pad=2, dn_labelbook_size=K,
                 use_remat=False)
    img = Image.fromarray(
        (np.random.default_rng(0).random((120, 160, 3)) * 255).astype(
            np.uint8
        )
    )
    x = jnp.zeros((1, 96, 128, 3))
    m = jnp.zeros((1, 96, 128), bool)
    params = model.init(jax.random.PRNGKey(0), x, m, train=False)
    boxes, labels, scores = run_inference(
        model, params, img, canvas_hw=(1216, 2048), num_select=10,
        threshold=0.0,
    )
    assert boxes.shape[1] == 4 and len(boxes) == len(labels) == len(scores)
    assert len(boxes) == 10  # threshold 0 keeps all
    # boxes in original-image pixel space
    assert (boxes[:, 0] <= 160 * 1.5).all()

    b2, l2, s2 = run_inference(model, params, img, canvas_hw=(1216, 2048),
                               num_select=10, threshold=1.1)
    assert len(b2) == 0
