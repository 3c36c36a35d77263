"""Data pipeline tests: paired loader static shapes, geometric alignment of
weak/strong views, box normalization, eval loader, checkpoint roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp

from datr_tpu.data.loader import make_da_loader, make_eval_loader
from datr_tpu.data.synthetic import (
    SyntheticDetectionDataset,
    synthetic_da_pair,
)
from datr_tpu.data.transforms import (
    DATrainTransform,
    EvalTransform,
    get_size_with_aspect_ratio,
)

CANVAS = (96, 128)


def test_resize_semantics():
    # shorter side -> size, aspect preserved (da_transforms.py:88-106)
    assert get_size_with_aspect_ratio((640, 480), 100) == (100, 133)
    # max_size cap
    oh, ow = get_size_with_aspect_ratio((2000, 500), 800, 1333)
    assert ow <= 1333 and oh <= 1333
    assert abs(ow / oh - 4.0) < 0.02


def test_da_loader_shapes_and_alignment():
    ds = synthetic_da_pair(n_images=4, hw=(80, 112), num_classes=3)
    tf = DATrainTransform(scales=[72, 80], max_size=120,
                          scales2_resize=[64, 72], scales2_crop=[48, 72])
    batch = next(iter(make_da_loader(ds, 2, CANVAS, tf, max_boxes=8,
                                     num_threads=1)))
    assert batch["images"].shape == (4, 96, 128, 3)
    assert batch["images_strong"].shape == (4, 96, 128, 3)
    assert batch["pad_mask"].shape == (4, 96, 128)
    assert batch["boxes"].shape == (2, 8, 4)
    assert batch["real_sizes"].shape == (2, 2)
    # weak and strong views share geometry: padding masks derived from the
    # same extent, so non-padded pixels of strong are exactly where weak's are
    nonpad = ~batch["pad_mask"]
    strong_active = np.abs(batch["images_strong"]).sum(-1) > 0
    # strong-aug pixels may coincidentally be 0 after normalize; check that
    # no energy exists in the padding region instead
    assert (np.abs(batch["images_strong"][batch["pad_mask"]]).sum() == 0)
    assert (np.abs(batch["images"][batch["pad_mask"]]).sum() == 0)
    # boxes normalized to (0, 1]
    v = batch["valid"]
    assert (batch["boxes"][v] > 0).all() and (batch["boxes"][v] <= 1).all()


def test_strong_batch_source_half_is_weak():
    """The strong batch is [source weak ; target strong]: the reference
    builds the source dataset with strong_transforms=None (DAcoco.py:703)
    and collates source_imgs + target_imgs_strong_aug (util/misc.py:297)."""
    ds = synthetic_da_pair(n_images=4, hw=(80, 112), num_classes=3)
    tf = DATrainTransform(scales=[72, 80], max_size=120,
                          scales2_resize=[64, 72], scales2_crop=[48, 72])
    batch = next(iter(make_da_loader(ds, 2, CANVAS, tf, max_boxes=8,
                                     num_threads=1)))
    b = batch["images"].shape[0] // 2
    np.testing.assert_array_equal(batch["images_strong"][:b],
                                  batch["images"][:b])
    # target halves differ with overwhelming probability (photometric aug)
    assert np.abs(batch["images_strong"][b:] - batch["images"][b:]).max() > 0


def test_eval_loader_tail_padding():
    ds = SyntheticDetectionDataset(5, hw=(80, 112), num_classes=3)
    batches = list(make_eval_loader(ds, 2, CANVAS, EvalTransform(80, 120),
                                    max_boxes=8))
    assert len(batches) == 3
    assert batches[-1]["batch_valid"].tolist() == [True, False]
    ids = [i for b in batches for i, v in zip(b["image_ids"],
                                              b["batch_valid"]) if v]
    assert sorted(ids) == [0, 1, 2, 3, 4]


def test_checkpoint_roundtrip(tmp_path):
    from datr_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree, epoch=7, extra={"ap50": 0.5})
    restored, meta = load_checkpoint(path, tree)
    assert meta["epoch"] == 7 and meta["ap50"] == 0.5
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.arange(4.0))


def test_strong_aug_is_photometric_only():
    import random

    from PIL import Image

    from datr_tpu.data.strong_aug import strong_augment

    rng = random.Random(0)
    img = Image.fromarray(
        (np.random.default_rng(0).random((40, 50, 3)) * 255).astype(np.uint8)
    )
    out = strong_augment(img, rng)
    assert out.size == img.size  # geometry untouched
