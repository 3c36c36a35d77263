"""CDN construction tests: static layout, attention-mask block structure
(reference semantics: dn_components.py:112-124), noise bounds, validity."""

import numpy as np
import jax
import jax.numpy as jnp

from datr_tpu.models.cdn import (
    build_cdn_queries,
    cdn_layout,
    cdn_self_attn_mask,
)


def test_layout():
    assert cdn_layout(100, 20) == (5, 200)
    assert cdn_layout(4, 2) == (2, 8)
    assert cdn_layout(1, 20) == (1, 40)


def test_attn_mask_blocks():
    nq, sp, g = 6, 2, 2
    m = cdn_self_attn_mask(nq, sp, g)  # True = may attend
    pad = 2 * sp * g  # 8
    assert m.shape == (pad + nq, pad + nq)
    # matching queries cannot see DN slots
    assert not m[pad:, :pad].any()
    # matching queries see each other
    assert m[pad:, pad:].all()
    # group 0 sees itself, not group 1
    assert m[0:4, 0:4].all()
    assert not m[0:4, 4:8].any()
    assert not m[4:8, 0:4].any()
    # DN slots can see matching queries (reference leaves these unblocked)
    assert m[0:4, pad:].all()


def test_build_queries_positive_negative_bands():
    K, C = 4, 16
    rng = jax.random.PRNGKey(0)
    table = jax.random.normal(jax.random.PRNGKey(1), (K + 1, C))
    boxes = jnp.array([[[0.5, 0.5, 0.2, 0.2], [0.3, 0.7, 0.1, 0.1]]])
    labels = jnp.array([[1, 2]], jnp.int32)
    valid = jnp.ones((1, 2), bool)
    out = build_cdn_queries(
        rng, boxes, labels, valid, table, K, dn_number=4, single_pad=2,
        label_noise_ratio=0.0, box_noise_scale=0.2,
    )
    groups, pad = cdn_layout(4, 2)
    assert out.query_label_embed.shape == (1, pad, C)
    assert out.query_bbox_unsig.shape == (1, pad, 4)
    # with zero label noise, noised labels == originals on valid slots
    lbl = np.asarray(out.noised_labels).reshape(groups, 2, 2)
    for g in range(groups):
        for pn in range(2):
            np.testing.assert_array_equal(lbl[g, pn], [1, 2])
    # all slots valid here
    assert np.asarray(out.dn_valid).all()
    # positive jitter keeps the box near the original; negative pushes the
    # corners at least the box extent away (scaled band 1..2)
    sig = jax.nn.sigmoid(out.query_bbox_unsig).reshape(groups, 2, 2, 4)
    pos_err = np.abs(np.asarray(sig[:, 0, 0]) - np.asarray(boxes[0, 0]))
    assert pos_err.max() < 0.15  # noise_scale 0.2 * half-extent 0.1


def test_invalid_slots_zeroed():
    K, C = 3, 8
    table = jnp.ones((K + 1, C))
    boxes = jnp.zeros((1, 2, 4))
    labels = jnp.zeros((1, 2), jnp.int32)
    valid = jnp.zeros((1, 2), bool)  # no GT at all
    out = build_cdn_queries(jax.random.PRNGKey(0), boxes, labels, valid,
                            table, K, dn_number=2, single_pad=2)
    assert not np.asarray(out.dn_valid).any()
    np.testing.assert_allclose(np.asarray(out.query_label_embed), 0.0)
    np.testing.assert_allclose(np.asarray(out.query_bbox_unsig), 0.0)
