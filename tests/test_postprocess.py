"""PostProcess + static NMS tests (reference: dino.py:944-996 and
torchvision.ops.batched_nms used by self-training)."""

import numpy as np
import jax.numpy as jnp

from datr_tpu.models.postprocess import batched_nms, postprocess


def test_postprocess_topk_and_scaling():
    B, N, K = 1, 4, 3
    logits = jnp.full((B, N, K), -10.0)
    logits = logits.at[0, 1, 2].set(5.0).at[0, 3, 0].set(3.0)
    boxes = jnp.tile(jnp.array([[[0.5, 0.5, 0.2, 0.4]]]), (1, N, 1))
    sizes = jnp.array([[100.0, 200.0]])  # (h, w)
    res = postprocess(logits, boxes, sizes, num_select=2)
    assert int(res["labels"][0, 0]) == 2 and int(res["labels"][0, 1]) == 0
    # cxcywh(0.5,0.5,0.2,0.4) -> xyxy(0.4,0.3,0.6,0.7) * (w,h,w,h)
    np.testing.assert_allclose(
        np.asarray(res["boxes"][0, 0]), [80.0, 30.0, 120.0, 70.0], atol=1e-3
    )


def test_postprocess_not_to_xyxy():
    logits = jnp.zeros((1, 2, 2))
    boxes = jnp.array([[[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.05, 0.05]]])
    res = postprocess(logits, boxes, jnp.ones((1, 2)), num_select=1,
                      not_to_xyxy=True)
    # stays cxcywh
    assert np.allclose(np.asarray(res["boxes"][0, 0])[2:], [0.2, 0.2]) or \
        np.allclose(np.asarray(res["boxes"][0, 0])[2:], [0.05, 0.05])


def _torch_nms(boxes, scores, labels, thr):
    import torch
    from torchvision.ops import batched_nms as tv_nms

    return tv_nms(torch.tensor(boxes), torch.tensor(scores),
                  torch.tensor(labels), thr).numpy()


def test_nms_matches_torchvision():
    try:
        import torchvision  # noqa: F401
    except Exception:
        import pytest

        pytest.skip("torchvision unavailable")
    rng = np.random.default_rng(0)
    M = 40
    centers = rng.random((M, 2)).astype(np.float32) * 200
    wh = rng.random((M, 2)).astype(np.float32) * 60 + 10
    boxes = np.concatenate([centers, centers + wh], 1)
    scores = rng.random(M).astype(np.float32)
    labels = rng.integers(0, 3, M)
    keep_ref = _torch_nms(boxes, scores, labels, 0.5)

    keep_idx, keep_valid = batched_nms(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
        jnp.asarray(labels)[None], iou_threshold=0.5, max_out=M,
    )
    got = np.asarray(keep_idx[0])[np.asarray(keep_valid[0])]
    np.testing.assert_array_equal(np.sort(got), np.sort(keep_ref))
    # ordering by score descending
    assert (np.diff(scores[got]) <= 1e-6).all()
