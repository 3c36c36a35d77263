"""Segmentation head + mask losses: torch parity vs the LIVE reference
modules (models/dino/segmentation.py) and model-level smoke tests.

The reference's segmentation path is dead code in every shipped DATR config
(masks=False), but it is part of the surface build_dino exposes
(dino.py:1067-1068, 1099-1101, 1136-1139); coverage here proves capability
parity: MHAttentionMap, MaskHeadSmallConv (FPN + torch-nearest upsampling),
dice/mask-focal losses, the criterion 'masks' term, and panoptic assembly.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_stubs  # noqa: E402

reference_stubs.install()

import models.dino.segmentation as ref_seg  # noqa: E402

from datr_tpu.models.segmentation import (  # noqa: E402
    MaskHeadSmallConv,
    MHAttentionMap,
    dice_loss,
    loss_masks,
    mask_focal_loss,
    nearest_resize_torch,
    postprocess_panoptic,
)


def test_nearest_resize_matches_torch():
    rng = np.random.default_rng(0)
    for (h, w), (oh, ow) in [((7, 9), (13, 17)), ((5, 5), (10, 10)),
                             ((13, 21), (25, 43))]:
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        ours = np.asarray(nearest_resize_torch(jnp.asarray(x), (oh, ow)))
        ref = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2), size=(oh, ow),
                mode="nearest",
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_array_equal(ours, ref)


def test_mh_attention_map_torch_parity():
    """MHAttentionMap vs reference segmentation.py:152-181 with converted
    weights, including the padding-mask -inf fill."""
    torch.manual_seed(0)
    C, heads, B, Q, h, w = 32, 4, 2, 5, 6, 9
    ref = ref_seg.MHAttentionMap(C, C, heads, dropout=0.0)
    ref.eval()
    q = torch.randn(B, Q, C)
    k = torch.randn(B, C, h, w)
    mask = torch.zeros(B, h, w, dtype=torch.bool)
    mask[:, :, -2:] = True  # padded columns
    with torch.no_grad():
        ref_out = ref(q, k, mask=mask)  # [B, Q, heads, h, w]

    mod = MHAttentionMap(hidden_dim=C, num_heads=heads)
    params = {
        "q_linear": {
            "kernel": jnp.asarray(ref.q_linear.weight.detach().numpy().T),
            "bias": jnp.asarray(ref.q_linear.bias.detach().numpy()),
        },
        "k_linear": {
            "kernel": jnp.asarray(ref.k_linear.weight.detach().numpy().T),
            "bias": jnp.asarray(ref.k_linear.bias.detach().numpy()),
        },
    }
    ours = mod.apply(
        {"params": params},
        jnp.asarray(q.numpy()),
        jnp.asarray(k.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(mask.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref_out.numpy(), rtol=1e-5, atol=1e-6
    )


def _convert_mask_head(ref):
    """torch MaskHeadSmallConv state -> flax params (OIHW -> HWIO)."""
    p = {}
    for i in range(1, 6):
        conv = getattr(ref, f"lay{i}")
        gn = getattr(ref, f"gn{i}")
        p[f"lay{i}"] = {
            "kernel": jnp.asarray(
                conv.weight.detach().numpy().transpose(2, 3, 1, 0)
            ),
            "bias": jnp.asarray(conv.bias.detach().numpy()),
        }
        p[f"gn{i}"] = {
            "scale": jnp.asarray(gn.weight.detach().numpy()),
            "bias": jnp.asarray(gn.bias.detach().numpy()),
        }
    for i in range(1, 4):
        conv = getattr(ref, f"adapter{i}")
        p[f"adapter{i}"] = {
            "kernel": jnp.asarray(
                conv.weight.detach().numpy().transpose(2, 3, 1, 0)
            ),
            "bias": jnp.asarray(conv.bias.detach().numpy()),
        }
    p["out_lay"] = {
        "kernel": jnp.asarray(
            ref.out_lay.weight.detach().numpy().transpose(2, 3, 1, 0)
        ),
        "bias": jnp.asarray(ref.out_lay.bias.detach().numpy()),
    }
    return p


def test_mask_head_torch_parity():
    """MaskHeadSmallConv vs reference segmentation.py:81-149 with converted
    weights on odd (non-power-of-two) FPN sizes."""
    torch.manual_seed(1)
    # GroupNorm(8) constrains dim and C//2..C//16 to multiples of 8
    # (same constraint as the reference head at its real dims 264/256)
    C, heads = 128, 8
    dim = C + heads
    fpn_dims = [24, 16, 8]  # C4, C3, C2 channels (tiny)
    ref = ref_seg.MaskHeadSmallConv(dim, fpn_dims, C)
    ref.eval()

    N, h, w = 3, 5, 7
    x = torch.randn(N, dim, h, w)
    fpns = [
        torch.randn(N, fpn_dims[0], 9, 13),
        torch.randn(N, fpn_dims[1], 17, 27),
        torch.randn(N, fpn_dims[2], 33, 55),
    ]
    with torch.no_grad():
        # reference forward takes (x, bbox_mask, fpns) but only concats
        # bbox_mask into x before lay1; pre-fuse here to test the conv stack
        ref_out = ref.lay1(x)
        ref_out = torch.relu(ref.gn1(ref_out))
        ref_out = torch.relu(ref.gn2(ref.lay2(ref_out)))
        cur = ref.adapter1(fpns[0])
        ref_out = cur + torch.nn.functional.interpolate(
            ref_out, size=cur.shape[-2:], mode="nearest")
        ref_out = torch.relu(ref.gn3(ref.lay3(ref_out)))
        cur = ref.adapter2(fpns[1])
        ref_out = cur + torch.nn.functional.interpolate(
            ref_out, size=cur.shape[-2:], mode="nearest")
        ref_out = torch.relu(ref.gn4(ref.lay4(ref_out)))
        cur = ref.adapter3(fpns[2])
        ref_out = cur + torch.nn.functional.interpolate(
            ref_out, size=cur.shape[-2:], mode="nearest")
        ref_out = torch.relu(ref.gn5(ref.lay5(ref_out)))
        ref_out = ref.out_lay(ref_out)[:, 0]

    mod = MaskHeadSmallConv(dim=dim, context_dim=C)
    params = _convert_mask_head(ref)
    ours = mod.apply(
        {"params": params},
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        [jnp.asarray(f.permute(0, 2, 3, 1).numpy()) for f in fpns],
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref_out.numpy(), rtol=1e-4, atol=1e-4
    )


def test_mask_losses_torch_parity():
    """dice_loss / mask_focal_loss vs reference segmentation.py:184-227."""
    rng = np.random.default_rng(2)
    P, n = 6, 40
    logits = rng.standard_normal((P, n)).astype(np.float32) * 3
    targets = (rng.random((P, n)) > 0.6).astype(np.float32)
    num_boxes = 4.0

    ref_dice = ref_seg.dice_loss(
        torch.from_numpy(logits), torch.from_numpy(targets), num_boxes
    ).item()
    ref_focal = ref_seg.sigmoid_focal_loss(
        torch.from_numpy(logits), torch.from_numpy(targets), num_boxes
    ).item()
    np.testing.assert_allclose(
        float(dice_loss(jnp.asarray(logits), jnp.asarray(targets),
                        num_boxes)),
        ref_dice, rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(mask_focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                              num_boxes)),
        ref_focal, rtol=1e-5,
    )

    # padded pairs are excluded exactly: masking the last two pairs equals
    # the reference on the first P-2 alone
    pv = np.array([1, 1, 1, 1, 0, 0], bool)
    ref_dice2 = ref_seg.dice_loss(
        torch.from_numpy(logits[:4]), torch.from_numpy(targets[:4]),
        num_boxes).item()
    np.testing.assert_allclose(
        float(dice_loss(jnp.asarray(logits), jnp.asarray(targets),
                        num_boxes, jnp.asarray(pv))),
        ref_dice2, rtol=1e-5,
    )
    ref_focal2 = ref_seg.sigmoid_focal_loss(
        torch.from_numpy(logits[:4]), torch.from_numpy(targets[:4]),
        num_boxes).item()
    np.testing.assert_allclose(
        float(mask_focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                              num_boxes, jnp.asarray(pv))),
        ref_focal2, rtol=1e-5,
    )


def test_loss_masks_matched_gather():
    """loss_masks gathers the matched query's mask and upsamples to GT
    resolution (reference dino.py:576-604): a perfect prediction for the
    matched query drives the dice term toward zero."""
    B, N, T = 1, 4, 2
    h, w, Hm, Wm = 8, 8, 16, 16
    gt = np.zeros((B, T, Hm, Wm), np.float32)
    gt[0, 0, :8, :8] = 1.0
    gt[0, 1, 8:, 8:] = 1.0
    pred = np.full((B, N, h, w), -20.0, np.float32)
    pred[0, 2, :4, :4] = 20.0  # matches gt 0 upsampled
    pred[0, 1, 4:, 4:] = 20.0  # matches gt 1
    assign = np.array([[2, 1]], np.int32)
    valid = np.ones((B, T), bool)
    out = loss_masks(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(valid),
        jnp.asarray(assign), jnp.float32(2.0),
    )
    assert float(out["loss_dice"]) < 0.05
    assert float(out["loss_mask"]) < 0.05
    # swapped assignment must be much worse
    bad = loss_masks(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(valid),
        jnp.asarray(np.array([[1, 2]], np.int32)), jnp.float32(2.0),
    )
    assert float(bad["loss_dice"]) > 0.5


def test_dino_with_masks_forward():
    """DINO with_masks=True emits stride-4 pred_masks on eval and train
    paths; chunked fan-out equals single-pass."""
    from datr_tpu.models.dino import DINO

    kw = dict(
        num_classes=4, num_queries=6, hidden_dim=128, nheads=8,
        num_feature_levels=4, enc_layers=1, dec_layers=2,
        dim_feedforward=32, dn_number=0, with_masks=True, use_remat=False,
    )
    model = DINO(**kw)
    B, H, W = 2, 64, 96
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (B, H, W, 3))
    pad = jnp.zeros((B, H, W), bool)
    params = model.init(rng, images, pad)
    out = model.apply(params, images, pad)
    assert out["pred_masks"].shape == (B, 6, H // 4, W // 4)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()

    chunked = DINO(**{**kw, "mask_query_chunk": 3})
    out2 = chunked.apply(params, images, pad)
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), np.asarray(out2["pred_masks"]),
        rtol=1e-5, atol=1e-5,
    )

    # train path (single-domain supervised): masks for the supervised batch
    targets = {
        "boxes": jnp.tile(jnp.asarray([[0.5, 0.5, 0.2, 0.2]]), (B, 3, 1)),
        "labels": jnp.zeros((B, 3), jnp.int32),
        "valid": jnp.ones((B, 3), bool),
    }
    out_t = model.apply(
        params, images, pad, targets=targets,
        dn_rng=jax.random.PRNGKey(1), train=True, domain_adapt=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out_t["pred_masks"].shape == (B, 6, H // 4, W // 4)


def test_criterion_masks_term():
    """criterion() computes loss_mask/loss_dice when gt_masks are given and
    the weight dict carries the reference coefficients (dino.py:1099-1101)."""
    from datr_tpu.train.criterion import (
        CriterionCfg, build_weight_dict, criterion,
    )

    B, N, K, T = 2, 5, 4, 3
    rng = np.random.default_rng(3)
    outputs = {
        "pred_logits": jnp.asarray(
            rng.standard_normal((B, N, K)), jnp.float32),
        "pred_boxes": jax.nn.sigmoid(jnp.asarray(
            rng.standard_normal((B, N, 4)), jnp.float32)),
        "aux_logits": jnp.asarray(
            rng.standard_normal((1, B, N, K)), jnp.float32),
        "aux_boxes": jax.nn.sigmoid(jnp.asarray(
            rng.standard_normal((1, B, N, 4)), jnp.float32)),
        "interm_logits": jnp.asarray(
            rng.standard_normal((B, N, K)), jnp.float32),
        "interm_boxes": jax.nn.sigmoid(jnp.asarray(
            rng.standard_normal((B, N, 4)), jnp.float32)),
        "pred_masks": jnp.asarray(
            rng.standard_normal((B, N, 8, 8)), jnp.float32),
    }
    gt_masks = jnp.asarray((rng.random((B, T, 16, 16)) > 0.5), jnp.float32)
    losses = criterion(
        outputs,
        jnp.zeros((B, T), jnp.int32),
        jnp.asarray(rng.random((B, T, 4)), jnp.float32),
        jnp.ones((B, T), bool),
        CriterionCfg(num_classes=K),
        gt_masks=gt_masks,
    )
    assert np.isfinite(float(losses["loss_mask"]))
    assert float(losses["loss_dice"]) > 0
    w = build_weight_dict(dec_layers=2, masks=True)
    assert w["loss_mask"] == 1.0 and w["loss_dice"] == 1.0


def test_postprocess_panoptic():
    """Panoptic assembly: argmax id map, stuff merging, tiny-segment drop
    (reference segmentation.py:268-375)."""
    Q, K, h, w = 4, 5, 16, 16
    logits = np.full((Q, K), -8.0, np.float32)
    logits[0, 1] = 8.0   # thing
    logits[1, 3] = 8.0   # stuff
    logits[2, 3] = 8.0   # same stuff class -> merged into segment 1
    logits[3, K - 1] = 8.0  # no-object -> dropped
    masks = np.full((Q, h, w), -10.0, np.float32)
    masks[0, :8] = 10.0
    masks[1, 8:, :8] = 10.0
    masks[2, 8:, 8:] = 10.0
    out = postprocess_panoptic(
        logits, masks, is_thing_map={1: True, 3: False},
        processed_size=(h, w), threshold=0.5,
    )
    ids = out["id_map"]
    assert ids.shape == (h, w)
    segs = out["segments_info"]
    # the stuff merge empties segment 2 (area 0 <= 4), so the reference's
    # small-segment refilter drops it and reassembles WITHOUT dedup
    # (segmentation.py:358, get_ids_area(dedup=False)): the freed
    # bottom-right quadrant falls to argmax winner 0 — reference quirk, kept
    assert len(segs) == 2
    assert segs[0]["isthing"] and segs[0]["category_id"] == 1
    assert not segs[1]["isthing"] and segs[1]["category_id"] == 3
    assert (ids == 2).sum() == 0
    assert segs[0]["area"] == 192  # top half + absorbed quadrant
    assert segs[1]["area"] == 64
