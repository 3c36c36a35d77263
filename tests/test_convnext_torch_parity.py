"""ConvNeXt backbone numerical parity vs the LIVE reference convnext.py
(models/dino/convnext.py): stem, LN+conv downsamples, blocks with layer
scale (gamma), channels-first out norms."""

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

from convert_checkpoint import convert_convnext  # noqa: E402

from datr_tpu.models.convnext import ConvNeXt  # noqa: E402

H, W = 160, 224


@pytest.fixture(scope="module")
def pair():
    from models.dino.convnext import ConvNeXt as RefConvNeXt

    torch.manual_seed(0)
    depths, dims = [2, 2, 4, 2], [48, 96, 192, 384]
    ref = RefConvNeXt(depths=depths, dims=dims, out_indices=(1, 2, 3))
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree = {"params": convert_convnext(sd, prefix="")}
    ours = ConvNeXt(depths=tuple(depths), dims=tuple(dims))
    rng = np.random.default_rng(5)
    img = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    return ref, ours, tree, img


def test_converted_tree_structure_matches_init(pair):
    _, ours, tree, img = pair
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


def test_convnext_feature_parity(pair):
    ref, ours, tree, img = pair
    from util.misc import NestedTensor

    nt = NestedTensor(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
                      torch.zeros(1, H, W, dtype=torch.bool))
    with torch.no_grad():
        ref_outs = ref(nt)
    got = jax.jit(lambda p, x: ours.apply(p, x))(tree, jnp.asarray(img))
    ref_list = list(ref_outs.values()) if isinstance(ref_outs, dict) \
        else list(ref_outs)
    assert len(got) == len(ref_list) == 3
    for ours_f, ref_f in zip(got, ref_list):
        t = ref_f.tensors if hasattr(ref_f, "tensors") else ref_f
        ref_np = np.transpose(t.numpy(), (0, 2, 3, 1))
        assert ours_f.shape == ref_np.shape
        np.testing.assert_allclose(
            np.asarray(ours_f), ref_np, rtol=5e-3, atol=2e-3
        )
