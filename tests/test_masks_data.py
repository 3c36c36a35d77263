"""masks=True end-to-end data path (reference ConvertCocoPolysToMask with
return_masks, datasets/coco.py; coco_panoptic.py return_masks):
segmentation decode (polygon + RLE), masks through the geometric transforms,
static-canvas padding, loader batching, and a supervised train step that
actually trains the mask head."""

import json
import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from datr_tpu.data.coco import (
    CocoDetectionDataset,
    build_dataset,
    decode_segmentation,
)
from datr_tpu.data.transforms import (
    _crop_triple,
    _hflip_triple,
    _resize_triple,
    finalize_example,
)


# --- test-only oracle: pycocotools maskApi.c rleToString port -------------
def _counts_colmajor(mask: np.ndarray):
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    counts, val, run = [], 0, 0
    for v in flat:
        if v == val:
            run += 1
        else:
            counts.append(run)
            val, run = int(v), 1
    counts.append(run)
    return counts


def _rle_to_string(counts):
    s = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            s.append(c + 48)
    return bytes(s).decode()


def test_rle_uncompressed_roundtrip():
    rng = np.random.default_rng(0)
    mask = (rng.random((13, 17)) > 0.6).astype(np.uint8)
    seg = {"counts": _counts_colmajor(mask), "size": [13, 17]}
    np.testing.assert_array_equal(decode_segmentation(seg, 13, 17), mask)


def test_rle_compressed_roundtrip():
    rng = np.random.default_rng(1)
    for shape in [(7, 9), (31, 22), (64, 48)]:
        mask = (rng.random(shape) > 0.5).astype(np.uint8)
        counts = _counts_colmajor(mask)
        seg = {"counts": _rle_to_string(counts), "size": list(shape)}
        np.testing.assert_array_equal(
            decode_segmentation(seg, *shape), mask,
            err_msg=f"compressed RLE mismatch at {shape}",
        )


def test_polygon_rasterize():
    # axis-aligned rectangle [4, 2] .. [10, 8]
    seg = [[4.0, 2.0, 10.0, 2.0, 10.0, 8.0, 4.0, 8.0]]
    m = decode_segmentation(seg, 12, 14)
    assert m.shape == (12, 14)
    assert m[5, 7] == 1  # interior
    assert m[0, 0] == 0 and m[11, 13] == 0  # exterior
    # area close to the 6x6 rectangle (boundary convention may differ by
    # one pixel per edge)
    assert 30 <= m.sum() <= 56
    # multi-polygon union
    seg2 = seg + [[0.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 2.0]]
    m2 = decode_segmentation(seg2, 12, 14)
    assert m2.sum() > m.sum()


def _box_of(mask):
    ys, xs = np.nonzero(mask)
    return xs.min(), ys.min(), xs.max(), ys.max()


def test_masks_follow_geometry():
    """hflip / resize / crop keep masks aligned with boxes."""
    h, w = 40, 60
    mask = np.zeros((h, w), np.uint8)
    mask[10:20, 12:30] = 1
    img = Image.new("RGB", (w, h))
    tgt = {
        "boxes": np.array([[12, 10, 30, 20]], np.float32),
        "labels": np.array([1], np.int64),
        "masks": mask[None],
        "size": np.array([h, w], np.int64),
    }

    # hflip: mask extent mirrors with the box
    _, _, t2 = _hflip_triple(img, None, tgt)
    x0, y0, x1, y1 = _box_of(t2["masks"][0])
    b = t2["boxes"][0]
    assert abs(x0 - b[0]) <= 1 and abs(x1 + 1 - b[2]) <= 1
    assert (y0, y1) == (10, 19)

    # resize to short side 20 (2x downscale)
    img2, _, t3 = _resize_triple(img, None, tgt, 20)
    assert t3["masks"].shape == (1, 20, 30)
    x0, y0, x1, y1 = _box_of(t3["masks"][0])
    assert abs(x0 - 6) <= 1 and abs(y0 - 5) <= 1

    # crop region intersecting the box
    _, _, t4 = _crop_triple(img, None, tgt, (12, 15, 20, 30))
    assert t4["masks"].shape == (1, 20, 30)
    x0, y0, x1, y1 = _box_of(t4["masks"][0])
    bb = t4["boxes"][0]
    assert abs(x0 - bb[0]) <= 1 and abs(y1 + 1 - bb[3]) <= 1

    # crop that removes the box entirely drops the mask row too
    _, _, t5 = _crop_triple(img, None, tgt, (0, 35, 8, 20))
    assert t5["boxes"].shape[0] == 0
    assert t5["masks"].shape[0] == 0


def test_finalize_pads_masks_to_canvas():
    h, w = 30, 40
    mask = np.zeros((h, w), np.uint8)
    mask[5:10, 5:15] = 1
    img = Image.new("RGB", (w, h))
    tgt = {
        "boxes": np.array([[5, 5, 15, 10]], np.float32),
        "labels": np.array([1], np.int64),
        "masks": mask[None],
        "image_id": 7,
        "orig_size": np.array([h, w], np.int64),
    }
    # default mask_stride=4: area-averaged soft targets on the stride grid
    out = finalize_example(img, tgt, (48, 64), max_boxes=5)
    assert out["masks"].shape == (5, 12, 16)
    assert out["masks"].dtype == np.float16
    # block means: mask=1 on rows 5:10, cols 5:15
    assert float(out["masks"][0, 1, 2]) == 0.75   # rows 4:8 x cols 8:12
    assert float(out["masks"][0, 2, 3]) == 0.375  # rows 8:12 x cols 12:16
    assert out["masks"][0, 3:].sum() == 0 and out["masks"][1:].sum() == 0
    assert out["valid"][0] and not out["valid"][1:].any()
    # mask_stride=1 reproduces full-resolution canvas masks
    out1 = finalize_example(img, tgt, (48, 64), max_boxes=5, mask_stride=1)
    assert out1["masks"].shape == (5, 48, 64)
    np.testing.assert_array_equal(out1["masks"][0, :h, :w], mask)
    assert out1["masks"][0, h:].sum() == 0 and out1["masks"][1:].sum() == 0


def _write_coco_with_masks(root, n=2, hw=(48, 64)):
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    images, annotations = [], []
    rng = np.random.default_rng(0)
    for i in range(n):
        fn = f"m{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (*hw, 3), np.uint8)
        ).save(os.path.join(root, "images", fn))
        images.append({"id": i + 1, "file_name": fn,
                       "height": hw[0], "width": hw[1]})
        # polygon annotation + compressed-RLE annotation
        annotations.append({
            "id": 10 * i + 1, "image_id": i + 1, "category_id": 1,
            "bbox": [8, 8, 16, 12], "area": 192, "iscrowd": 0,
            "segmentation": [[8.0, 8.0, 24.0, 8.0, 24.0, 20.0, 8.0, 20.0]],
        })
        rle_mask = np.zeros(hw, np.uint8)
        rle_mask[30:40, 30:50] = 1
        annotations.append({
            "id": 10 * i + 2, "image_id": i + 1, "category_id": 2,
            "bbox": [30, 30, 20, 10], "area": 200, "iscrowd": 0,
            "segmentation": {
                "counts": _rle_to_string(_counts_colmajor(rle_mask)),
                "size": list(hw),
            },
        })
    with open(os.path.join(root, "annotations.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "a"},
                                  {"id": 2, "name": "b"}]}, f)


def test_dataset_return_masks(tmp_path):
    root = str(tmp_path / "d")
    _write_coco_with_masks(root)
    ds = CocoDetectionDataset(os.path.join(root, "images"),
                              os.path.join(root, "annotations.json"),
                              return_masks=True)
    img, tgt = ds.load(0)
    assert tgt["masks"].shape == (2, 48, 64)
    # RLE mask decoded where it was drawn
    assert tgt["masks"][1, 35, 40] == 1 and tgt["masks"][1, 5, 5] == 0
    # polygon mask inside its box
    assert tgt["masks"][0, 12, 12] == 1


def test_da_layout_rejects_masks(tmp_path):
    d = tmp_path / "pair"
    for sub in ("source", "target", "val"):
        _write_coco_with_masks(str(d / sub), n=1)
    with pytest.raises(ValueError, match="single-domain"):
        build_dataset("train", "pair", str(tmp_path), return_masks=True)


def test_single_loader_masks_and_train_step(tmp_path):
    """Loader batches masks; the registered builder wires loss_mask /
    loss_dice; train_step_plain trains the mask head (nonzero update)."""
    from datr_tpu.data.loader import make_single_loader
    from datr_tpu.data.transforms import SingleDomainTrainTransform
    from datr_tpu.models.registry import build_model
    from datr_tpu.train.optim import make_optimizer
    from datr_tpu.train.state import create_train_state
    from datr_tpu.train.steps import train_step_plain

    d = tmp_path / "solo" / "train"
    _write_coco_with_masks(str(d), n=2)
    ds = build_dataset("train", "solo", str(tmp_path), return_masks=True)
    assert ds.return_masks

    # hidden_dim + nheads and hidden_dim//16 must divide GroupNorm(8)
    # (same constraint as the reference MaskHeadSmallConv)
    cfg = {
        "modelname": "dino", "num_classes": 4, "num_queries": 8,
        "hidden_dim": 128, "nheads": 8, "enc_layers": 1, "dec_layers": 2,
        "dim_feedforward": 64, "num_feature_levels": 4,
        "dn_number": 2, "dn_single_pad": 2, "dn_labelbook_size": 4,
        "use_remat": False, "masks": True,
    }
    model, ccfg, weight_dict = build_model(cfg)
    assert weight_dict["loss_mask"] > 0 and weight_dict["loss_dice"] > 0

    tf = SingleDomainTrainTransform([48], 64, [48], (32, 48), hflip_prob=1.0)
    loader = make_single_loader(ds, 2, (64, 64), tf, max_boxes=4, seed=0,
                                num_threads=1)
    batch = next(iter(loader))
    # stride-4 soft targets on the 64x64 canvas (finalize_example)
    assert batch["masks"].shape == (2, 4, 16, 16)
    assert batch["masks"].dtype == np.float16
    assert batch["masks"].sum() > 0
    assert float(batch["masks"].max()) <= 1.0

    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(batch["images"])
    pad = jnp.asarray(batch["pad_mask"])
    targets = {k: jnp.asarray(batch[k]) for k in ("boxes", "labels", "valid")}
    params = model.init(rng, images, pad, targets=targets,
                        dn_rng=jax.random.PRNGKey(1), train=True,
                        domain_adapt=False)
    tx = make_optimizer(params)
    state = create_train_state(params, tx, cfg["num_classes"],
                               cfg["hidden_dim"], jax.random.PRNGKey(2))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    # snapshot BEFORE the step: donate_argnums invalidates `state`
    old_head = jax.device_get(jax.tree.leaves(
        {k: v for k, v in state.params["params"].items()
         if "mask_head" in k or "bbox_attention" in k}))
    new_state, metrics = train_step_plain(state, jb, model, tx, ccfg,
                                          weight_dict)
    assert np.isfinite(float(metrics["loss"]))
    assert "loss_mask" in metrics and np.isfinite(float(metrics["loss_mask"]))
    assert "loss_dice" in metrics
    # the mask head actually moved
    new_head = jax.tree.leaves(
        {k: v for k, v in new_state.params["params"].items()
         if "mask_head" in k or "bbox_attention" in k})
    assert old_head and any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(old_head, new_head)
    )


def test_panoptic_empty_segments(tmp_path):
    """segments_info: [] is legal; load() and eval_annotations() handle it
    (empty-list numpy arrays must not default to float64)."""
    from datr_tpu.data.panoptic import CocoPanopticDataset

    img_dir = tmp_path / "imgs"
    ann_dir = tmp_path / "pan"
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    Image.new("RGB", (32, 24)).save(img_dir / "a.jpg")
    Image.new("RGB", (32, 24)).save(ann_dir / "a.png")
    ann = {
        "images": [{"id": 5, "file_name": "a.png",
                    "height": 24, "width": 32}],
        "annotations": [{"image_id": 5, "file_name": "a.png",
                         "segments_info": []}],
        "categories": [{"id": 1, "name": "x"}],
    }
    with open(tmp_path / "ann.json", "w") as f:
        json.dump(ann, f)
    ds = CocoPanopticDataset(str(img_dir), str(ann_dir),
                             str(tmp_path / "ann.json"), return_masks=True)
    img, tgt = ds.load(0)
    assert tgt["boxes"].shape == (0, 4)
    assert tgt["masks"].shape == (0, 24, 32)
    gt = ds.eval_annotations(5)
    assert gt["boxes"].shape == (0, 4)


def test_panoptic_return_masks(tmp_path):
    from datr_tpu.data.panoptic import CocoPanopticDataset

    img_dir = tmp_path / "imgs"
    ann_dir = tmp_path / "pan"
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    Image.new("RGB", (16, 12)).save(img_dir / "b.jpg")
    # segment id 3 occupies a 4x4 block: id = R + 256G + 65536B -> R=3
    id_png = np.zeros((12, 16, 3), np.uint8)
    id_png[2:6, 4:8, 0] = 3
    Image.fromarray(id_png).save(ann_dir / "b.png")
    ann = {
        "images": [{"id": 9, "file_name": "b.png",
                    "height": 12, "width": 16}],
        "annotations": [{"image_id": 9, "file_name": "b.png",
                         "segments_info": [
                             {"id": 3, "category_id": 1, "iscrowd": 0,
                              "area": 16}]}],
        "categories": [{"id": 1, "name": "x"}],
    }
    with open(tmp_path / "ann.json", "w") as f:
        json.dump(ann, f)
    ds = CocoPanopticDataset(str(img_dir), str(ann_dir),
                             str(tmp_path / "ann.json"), return_masks=True)
    _, tgt = ds.load(0)
    assert tgt["masks"].shape == (1, 12, 16)
    assert tgt["masks"][0, 3, 5] == 1 and tgt["masks"][0, 0, 0] == 0
    np.testing.assert_allclose(tgt["boxes"][0], [4, 2, 7, 5])
