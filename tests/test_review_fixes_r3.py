"""Round-3 code-review fix coverage:

- panoptic masks_to_boxes returns the reference's INCLUSIVE max extents
  (util/box_ops.py:108-132 — no +1 inflation).
- CocoPanopticDataset asserts images/annotations file_name alignment
  (coco_panoptic.py:24-26 sanity check).
- every dataset class exposes category_ids() (main.py builds the evaluator
  category list from it — the panoptic/o365 dispatch paths used to crash
  on .index.cats).
- mask_head_forward rounds a non-divisor query_chunk DOWN to a divisor
  instead of silently running the full fan-out.
- the pipeline-parallel encoder refuses active dropout instead of silently
  training a dropout-free encoder.
"""

import json
import os
import types

import numpy as np
import pytest

from datr_tpu.data.panoptic import CocoPanopticDataset, masks_to_boxes


def test_masks_to_boxes_inclusive_max():
    m = np.zeros((1, 10, 12), bool)
    m[0, 3:6, 2:8] = True  # y in [3,5], x in [2,7]
    b = masks_to_boxes(m)
    np.testing.assert_allclose(b[0], [2.0, 3.0, 7.0, 5.0])


def test_masks_to_boxes_matches_torch_reference_semantics():
    """Literal re-execution of util/box_ops.py:108-132 in numpy on random
    masks (x_max = max over mask*x, masked-out pixels contribute 0)."""
    rng = np.random.default_rng(0)
    masks = rng.random((5, 9, 11)) > 0.6
    masks[0] = False
    masks[0, 4, 7] = True  # single-pixel mask
    got = masks_to_boxes(masks)

    h, w = masks.shape[-2:]
    y, x = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing="ij")
    x_mask = masks * x[None]
    x_max = x_mask.reshape(len(masks), -1).max(-1)
    x_min = np.where(masks, x_mask, 1e8).reshape(len(masks), -1).min(-1)
    y_mask = masks * y[None]
    y_max = y_mask.reshape(len(masks), -1).max(-1)
    y_min = np.where(masks, y_mask, 1e8).reshape(len(masks), -1).min(-1)
    want = np.stack([x_min, y_min, x_max, y_max], 1)
    np.testing.assert_allclose(got, want)


def _write_panoptic(tmp_path, ann_order):
    d = tmp_path
    os.makedirs(os.path.join(d, "anns"), exist_ok=True)
    coco = {
        "images": [
            {"id": 2, "file_name": "b.png", "width": 4, "height": 4},
            {"id": 1, "file_name": "a.png", "width": 4, "height": 4},
        ],
        "annotations": [
            {"image_id": i, "file_name": f, "segments_info": []}
            for i, f in ann_order
        ],
        "categories": [{"id": 7, "name": "x"}],
    }
    ann_file = os.path.join(d, "pan.json")
    with open(ann_file, "w") as f:
        json.dump(coco, f)
    return str(d), os.path.join(d, "anns"), ann_file


def test_panoptic_alignment_assert(tmp_path):
    # annotations in id order -> aligned with the id-sorted images list
    img, anns, ann_file = _write_panoptic(
        str(tmp_path / "ok"), [(1, "a.png"), (2, "b.png")])
    ds = CocoPanopticDataset(img, anns, ann_file)
    assert ds.category_ids() == [7]

    img, anns, ann_file = _write_panoptic(
        str(tmp_path / "bad"), [(2, "b.png"), (1, "a.png")])
    with pytest.raises(AssertionError, match="misaligned"):
        CocoPanopticDataset(img, anns, ann_file)


def test_category_ids_uniform(tmp_path):
    from datr_tpu.data.coco import (
        CocoDetectionDataset,
        ConcatDetectionDataset,
    )

    def write_coco(path, cat_ids):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({
                "images": [], "annotations": [],
                "categories": [{"id": c, "name": str(c)} for c in cat_ids],
            }, f)

    a = str(tmp_path / "a/ann.json")
    b = str(tmp_path / "b/ann.json")
    write_coco(a, [3, 1])
    write_coco(b, [5, 3])
    da = CocoDetectionDataset(str(tmp_path / "a"), a)
    db = CocoDetectionDataset(str(tmp_path / "b"), b)
    assert da.category_ids() == [1, 3]
    assert ConcatDetectionDataset([da, db]).category_ids() == [1, 3, 5]


def test_mask_head_query_chunk_rounds_down():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from datr_tpu.models.segmentation import (
        MaskHeadSmallConv,
        MHAttentionMap,
        mask_head_forward,
    )

    B, Q, C, heads = 1, 6, 128, 8
    h32, w32 = 4, 4
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    hs = jax.random.normal(ks[0], (B, Q, C))
    src = jax.random.normal(ks[1], (B, h32, w32, C))
    mem = jax.random.normal(ks[2], (B, h32, w32, C))
    lvl_mask = jnp.zeros((B, h32, w32), bool)
    fpns = [jax.random.normal(k, (B, h32 * s, w32 * s, 8))
            for k, s in zip(ks[3:6], (2, 4, 8))]

    class Wrap(nn.Module):
        chunk: int

        @nn.compact
        def __call__(self):
            return mask_head_forward(
                MHAttentionMap(hidden_dim=C, num_heads=heads, name="attn"),
                MaskHeadSmallConv(dim=C + heads, context_dim=C,
                                  name="head"),
                hs, src, mem, lvl_mask, fpns, query_chunk=self.chunk)

    vs = Wrap(chunk=0).init(ks[6])
    full = Wrap(chunk=0).apply(vs)
    # B*Q = 6; chunk=4 does not divide it -> rounds down to 3 (two chunks)
    chunked = Wrap(chunk=4).apply(vs)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)


def test_pp_encoder_rejects_active_dropout():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from datr_tpu.parallel.pipeline import make_pp_encoder_fn

    # stub model carrying just the attributes make_pp_encoder_fn reads;
    # the dropout refusal fires before any layer math runs
    model = types.SimpleNamespace(
        enc_layers=2, hidden_dim=32, dim_feedforward=64,
        num_feature_levels=2, nheads=4, enc_n_points=4, dropout=0.1,
        msda_impl="quad", msda_bh_mode="loop", msda_table_mode="slice",
        dtype=jnp.float32, fast_norm=False, use_remat=False,
    )
    params = {
        f"enc_layer{i}": {"w": jnp.zeros((3, 3))} for i in range(2)
    }
    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    enc_fn = make_pp_encoder_fn(model, params, mesh=mesh, n_micro=2)
    with pytest.raises(NotImplementedError, match="dropout"):
        enc_fn(jnp.zeros((2, 8, 32)), jnp.zeros((2, 8, 32)),
               jnp.zeros((2, 8, 2, 2)), jnp.zeros((2, 8), bool),
               jnp.array([[2, 2], [2, 2]]), False)
