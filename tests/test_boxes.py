import numpy as np
import jax.numpy as jnp

from datr_tpu.utils import boxes as B


def test_cxcywh_roundtrip():
    rng = np.random.default_rng(0)
    b = rng.random((7, 4)).astype(np.float32)
    out = B.box_xyxy_to_cxcywh(B.box_cxcywh_to_xyxy(b))
    np.testing.assert_allclose(np.asarray(out), b, rtol=1e-5, atol=1e-6)


def test_iou_known_values():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0], [0.0, 0.0, 2.0, 2.0],
                   [5.0, 5.0, 6.0, 6.0]])
    iou, _ = B.box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou)[0], [1 / 7, 1.0, 0.0], atol=1e-6)


def test_giou_identity_and_disjoint():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    g_same = B.generalized_box_iou(a, a)
    assert abs(float(g_same[0, 0]) - 1.0) < 1e-6
    far = jnp.array([[10.0, 0.0, 11.0, 1.0]])
    g_far = B.generalized_box_iou(a, far)
    # iou=0, enclosing area 11; giou = 0 - (11-2)/11
    np.testing.assert_allclose(float(g_far[0, 0]), -9.0 / 11.0, atol=1e-6)


def test_elementwise_matches_pairwise_diag():
    rng = np.random.default_rng(1)
    cx = rng.random((5, 4)).astype(np.float32)
    b1 = B.box_cxcywh_to_xyxy(jnp.asarray(cx))
    cx2 = rng.random((5, 4)).astype(np.float32)
    b2 = B.box_cxcywh_to_xyxy(jnp.asarray(cx2))
    pair = B.generalized_box_iou(b1, b2)
    elem = B.generalized_box_iou_elementwise(b1, b2)
    np.testing.assert_allclose(np.diag(np.asarray(pair)), np.asarray(elem),
                               rtol=1e-5, atol=1e-6)
