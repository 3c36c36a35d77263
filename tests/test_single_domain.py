"""Single-domain (plain-DINO) training path + sltransform extras
(VERDICT round-1 item #10; reference datasets/coco.py:611-640 dispatch,
sltransform.py:158 Rotate, datasets/random_crop.py IoU-aware crop)."""

import json
import os
import random
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))
from test_coco_ingestion import _write_coco  # noqa: E402

from datr_tpu.data.coco import CocoDetectionDataset, build_dataset  # noqa: E402
from datr_tpu.data.loader import make_single_loader  # noqa: E402
from datr_tpu.data.strong_aug import (  # noqa: E402
    iou_random_crop,
    rotate_with_boxes,
)
from datr_tpu.data.transforms import SingleDomainTrainTransform  # noqa: E402


def test_rotate_with_boxes_90deg():
    img = Image.new("RGB", (100, 60))
    boxes = np.array([[10.0, 20, 30, 40]])
    out, nb = rotate_with_boxes(img, boxes, 90.0)
    assert out.size == (60, 100)  # expanded canvas swaps dims
    # CCW 90° about center: point (x, y) -> (y, W - x) in the new canvas
    # box corners (10,20),(30,40) -> x' in [20,40], y' in [70,90]
    np.testing.assert_allclose(nb[0], [20, 70, 40, 90], atol=1e-4)


def test_rotate_small_angle_grows_box():
    img = Image.new("RGB", (100, 100))
    boxes = np.array([[40.0, 40, 60, 60]])
    _, nb = rotate_with_boxes(img, boxes, 10.0)
    # enclosing box of a rotated square is larger, still centered-ish
    assert nb[0, 2] - nb[0, 0] > 20 and nb[0, 3] - nb[0, 1] > 20


def test_iou_random_crop_keeps_valid_boxes():
    rng = random.Random(0)
    img = Image.new("RGB", (200, 150))
    boxes = np.array([[20.0, 20, 60, 60], [150.0, 100, 190, 140]])
    labels = np.array([1, 2])
    for seed in range(20):
        r = random.Random(seed)
        out, nb, nl = iou_random_crop(img, boxes, labels, r)
        w, h = out.size
        assert len(nb) == len(nl) >= 1
        assert (nb[:, 0] >= 0).all() and (nb[:, 2] <= w + 1e-6).all()
        assert (nb[:, 1] >= 0).all() and (nb[:, 3] <= h + 1e-6).all()
        assert (nb[:, 2] > nb[:, 0]).all() and (nb[:, 3] > nb[:, 1]).all()


def _write_single_domain(root, n=4):
    os.makedirs(root, exist_ok=True)
    _write_coco(os.path.join(root, "train"), n=n)
    _write_coco(os.path.join(root, "val"), n=2)
    # rename annotation files into the expected layout
    for split in ("train", "val"):
        os.replace(
            os.path.join(root, split, "annotations.json"),
            os.path.join(root, split, "annotations.json"),
        )


def test_build_dataset_single_domain_dispatch(tmp_path):
    root = tmp_path / "mycoco"
    _write_single_domain(str(root))
    ds = build_dataset("train", "mycoco", str(tmp_path))
    assert isinstance(ds, CocoDetectionDataset)
    val = build_dataset("val", "mycoco", str(tmp_path))
    assert isinstance(val, CocoDetectionDataset)


def test_single_loader_and_transform(tmp_path):
    root = tmp_path / "mycoco"
    _write_single_domain(str(root))
    ds = build_dataset("train", "mycoco", str(tmp_path))
    tf = SingleDomainTrainTransform([48, 56], 80, [40, 48], [32, 48],
                                    strong_aug=True)
    loader = make_single_loader(ds, 2, (64, 96), tf, max_boxes=8, seed=0,
                                num_threads=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (2, 64, 96, 3)
    assert b["boxes"].shape == (2, 8, 4)
    assert b["valid"].any()


def test_plain_train_step_runs_and_descends():
    from datr_tpu.models.dino import DINO
    from datr_tpu.train.criterion import CriterionCfg, build_weight_dict
    from datr_tpu.train.optim import make_optimizer
    from datr_tpu.train.state import create_train_state
    from datr_tpu.train.steps import train_step_plain

    K, HD = 4, 32
    model = DINO(num_classes=K, num_queries=12, hidden_dim=HD, nheads=4,
                 enc_layers=1, dec_layers=2, dim_feedforward=64,
                 dn_number=4, dn_single_pad=2, dn_labelbook_size=K,
                 use_remat=False)
    B, H, W = 3, 64, 64  # odd batch: plain path has no pairing constraint
    images = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3))
    pad_mask = jnp.zeros((B, H, W), bool)
    targets = dict(
        boxes=jnp.tile(jnp.array([[0.5, 0.5, 0.25, 0.3]]), (B, 2, 1)),
        labels=jnp.ones((B, 2), jnp.int32),
        valid=jnp.ones((B, 2), bool),
    )
    params = model.init(jax.random.PRNGKey(1), images, pad_mask,
                        targets=targets, dn_rng=jax.random.PRNGKey(2),
                        train=True, domain_adapt=False)
    tx = make_optimizer(params, lr=2e-4)
    state = create_train_state(params, tx, K, HD, jax.random.PRNGKey(3))
    ccfg = CriterionCfg(num_classes=K, dn_single_pad=2, dn_groups=2)
    wd = build_weight_dict(dec_layers=2)
    batch = dict(images=images, pad_mask=pad_mask, **targets)

    losses = []
    for _ in range(8):
        state, m = train_step_plain(state, batch, model, tx, ccfg, wd)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[-3:]) < losses[0]
    # no DA losses in the metric dict
    assert not any("DA" in k for k in m)
