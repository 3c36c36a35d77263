"""Swin backbone numerical parity vs the LIVE reference swin_transformer.py.

Complements test_torch_parity.py (which proves the full DINO-R50 pipeline):
here the reference SwinTransformer (random init) is converted with
tools/convert_checkpoint.convert_swin and both backbones run the same input,
exercising shifted windows, relative position bias, window padding at
non-divisible sizes, and patch merging (reference
models/dino/swin_transformer.py:435-727)."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_stubs  # noqa: E402

reference_stubs.install()

pytestmark = pytest.mark.parity  # heavy live-torch fixtures

from convert_checkpoint import convert_swin  # noqa: E402

from datr_tpu.models.swin import SWIN_CONFIGS, SwinTransformer  # noqa: E402

# 160x224: stride-4 grid 40x56 — 40 % 7 != 0 exercises window padding
H, W = 160, 224


@pytest.fixture(scope="module")
def swin_pair():
    from models.dino.swin_transformer import SwinTransformer as RefSwin

    torch.manual_seed(0)
    ref = RefSwin(pretrain_img_size=224, embed_dim=96, depths=[2, 2, 6, 2],
                  num_heads=[3, 6, 12, 24], window_size=7,
                  out_indices=(1, 2, 3))
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree = {"params": convert_swin(sd, prefix="")}

    ours = SwinTransformer(**SWIN_CONFIGS["swin_T_224_1k"])
    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    return ref, ours, tree, img


def test_converted_tree_structure_matches_init(swin_pair):
    _, ours, tree, img = swin_pair
    init = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    )
    paths_a = {jax.tree_util.keystr(k)
               for k, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}
    paths_b = {jax.tree_util.keystr(k)
               for k, _ in jax.tree_util.tree_flatten_with_path(init)[0]}
    assert paths_a == paths_b, (
        f"missing: {sorted(paths_b - paths_a)[:6]} "
        f"extra: {sorted(paths_a - paths_b)[:6]}"
    )


def test_swin_feature_parity(swin_pair):
    ref, ours, tree, img = swin_pair
    from util.misc import NestedTensor

    nt = NestedTensor(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
                      torch.zeros(1, H, W, dtype=torch.bool))
    with torch.no_grad():
        ref_outs = ref(nt)
    got = jax.jit(lambda p, x: ours.apply(p, x))(tree, jnp.asarray(img))
    assert len(got) == len(ref_outs) == 3
    for ours_f, ref_f in zip(got, ref_outs.values()):
        t = ref_f.tensors if hasattr(ref_f, "tensors") else ref_f
        ref_np = np.transpose(t.numpy(), (0, 2, 3, 1))  # NCHW -> NHWC
        assert ours_f.shape == ref_np.shape
        # f32 accumulation-order noise through 12 blocks: abs tol dominates
        np.testing.assert_allclose(
            np.asarray(ours_f), ref_np, rtol=5e-3, atol=2e-3
        )
