"""End-to-end numerical parity vs the LIVE reference PyTorch model.

The reference model at /root/reference is imported unmodified (CUDA ext and
torchvision replaced by test stubs, see reference_stubs.py), built from the
reference's own C2F config, its random-init state dict converted with
tools/convert_checkpoint.py, and both models run on the same input image.
This verifies backbone -> encoder -> two-stage -> decoder -> heads ->
PostProcess compute the same function (reference: models/dino/dino.py:236-475,
deformable_transformer.py:256-431, dino.py:944-996).
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

pytestmark = pytest.mark.parity  # heavy live-torch fixtures

from convert_checkpoint import convert_checkpoint  # noqa: E402

from datr_tpu.config import load_config  # noqa: E402
from datr_tpu.models.dino import build_dino_from_config  # noqa: E402

H, W = 320, 480
REF_CFG = (
    "/root/reference/config/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F.py"
)


@pytest.fixture(scope="module")
def parity_setup():
    from types import SimpleNamespace

    import models.dino.dino as ref_dino

    cfg = dict(load_config(REF_CFG))
    cfg.setdefault("device", "cpu")
    args = SimpleNamespace(**cfg)
    torch.manual_seed(0)
    ref_model, _, ref_post = ref_dino.build_dino(args)
    ref_model.eval()

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    tree = convert_checkpoint(sd)

    our_cfg = dict(cfg)
    our_cfg["use_remat"] = False
    model = build_dino_from_config(our_cfg)

    rng = np.random.default_rng(7)
    img = rng.standard_normal((1, H, W, 3)).astype(np.float32)

    from util.misc import NestedTensor

    nt = NestedTensor(
        torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
        torch.zeros(1, H, W, dtype=torch.bool),
    )
    with torch.no_grad():
        ref_out = ref_model(nt)

    our_out = jax.jit(
        lambda p, x, m: model.apply(p, x, m, train=False)
    )(tree, jnp.asarray(img), jnp.zeros((1, H, W), bool))
    our_out = jax.device_get(our_out)
    return ref_out, our_out, ref_post, ref_model, tree, model


def test_forward_parity_logits_boxes(parity_setup):
    ref_out, our_out, *_ = parity_setup
    ref_logits = ref_out["pred_logits"].numpy()
    ref_boxes = ref_out["pred_boxes"].numpy()
    np.testing.assert_allclose(
        our_out["pred_logits"], ref_logits, rtol=0, atol=2e-3
    )
    np.testing.assert_allclose(
        our_out["pred_boxes"], ref_boxes, rtol=0, atol=1e-4
    )


def test_forward_parity_aux_and_interm(parity_setup):
    ref_out, our_out, *_ = parity_setup
    for i, aux in enumerate(ref_out["aux_outputs"]):
        np.testing.assert_allclose(
            our_out["aux_logits"][i], aux["pred_logits"].numpy(),
            rtol=0, atol=2e-3,
        )
        np.testing.assert_allclose(
            our_out["aux_boxes"][i], aux["pred_boxes"].numpy(),
            rtol=0, atol=1e-4,
        )
    np.testing.assert_allclose(
        our_out["interm_logits"][0],
        ref_out["interm_outputs"]["pred_logits"].numpy()[0],
        rtol=0, atol=2e-3,
    )
    np.testing.assert_allclose(
        our_out["interm_boxes"][0],
        ref_out["interm_outputs"]["pred_boxes"].numpy()[0],
        rtol=0, atol=1e-4,
    )


def test_postprocess_parity(parity_setup):
    """Our PostProcess vs the reference's on the REFERENCE outputs
    (dino.py:944-996; inference.py:133 uses target size (1,1))."""
    ref_out, _, ref_post, *_ = parity_setup
    from datr_tpu.models.postprocess import postprocess

    sizes = torch.tensor([[1.0, 1.0]])
    with torch.no_grad():
        ref_res = ref_post["bbox"](ref_out, sizes)[0]

    res = postprocess(
        jnp.asarray(ref_out["pred_logits"].numpy()),
        jnp.asarray(ref_out["pred_boxes"].numpy()),
        jnp.asarray([[1.0, 1.0]]),
        num_select=300,
    )
    np.testing.assert_allclose(
        np.asarray(res["scores"])[0], ref_res["scores"].numpy(), atol=1e-5
    )
    assert (np.asarray(res["labels"])[0] == ref_res["labels"].numpy()).all()
    np.testing.assert_allclose(
        np.asarray(res["boxes"])[0], ref_res["boxes"].numpy(), atol=1e-5
    )


def test_converted_tree_structure_matches_init(parity_setup):
    """The converted tree has exactly the structure our init produces."""
    *_, tree, model = parity_setup
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, H, W, 3))
    m = jnp.zeros((2, H, W), bool)
    targets = dict(
        boxes=jnp.zeros((1, 8, 4)),
        labels=jnp.zeros((1, 8), jnp.int32),
        valid=jnp.zeros((1, 8), bool),
    )
    K, C = model.num_classes, model.hidden_dim
    init_tree = jax.eval_shape(
        lambda: model.init(
            rng, x, m, targets=targets, dn_rng=rng, train=True,
            global_proto=jnp.zeros((K, C)), amount=jnp.zeros((K,)),
        )
    )
    flat_a = jax.tree_util.tree_flatten_with_path(tree)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(init_tree)[0]
    paths_a = {jax.tree_util.keystr(k) for k, _ in flat_a}
    paths_b = {jax.tree_util.keystr(k) for k, _ in flat_b}
    assert paths_a == paths_b, (
        f"missing: {sorted(paths_b - paths_a)[:8]} "
        f"extra: {sorted(paths_a - paths_b)[:8]}"
    )
