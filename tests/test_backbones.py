"""Backbone smoke tests: shapes and stride structure for ResNet, Swin,
ConvNeXt (reference backbone families, backbone.py:147-219)."""

import jax
import jax.numpy as jnp
import pytest

from datr_tpu.models.convnext import ConvNeXt
from datr_tpu.models.resnet import ResNet
from datr_tpu.models.swin import SwinTransformer


@pytest.mark.parametrize(
    "module,channels",
    [
        (ResNet(stage_sizes=(1, 1, 1, 1)), (512, 1024, 2048)),
        (SwinTransformer(embed_dim=32, depths=(1, 1, 1, 1),
                         num_heads=(1, 2, 4, 8), window_size=4),
         (64, 128, 256)),
        (ConvNeXt(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128)),
         (32, 64, 128)),
    ],
)
def test_backbone_strides_and_channels(module, channels):
    x = jnp.zeros((1, 64, 96, 3))
    params = module.init(jax.random.PRNGKey(0), x)
    outs = module.apply(params, x)
    assert len(outs) == 3
    for i, (o, c) in enumerate(zip(outs, channels)):
        stride = 8 * 2 ** i
        assert o.shape == (1, 64 // stride, 96 // stride, c), (
            i, o.shape, stride, c,
        )


def test_swin_shifted_window_path():
    """Depth-2 stages exercise shift = window//2 blocks + the additive
    shifted-window mask."""
    m = SwinTransformer(embed_dim=32, depths=(2, 2, 2, 2),
                        num_heads=(1, 2, 4, 8), window_size=4)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(1), x)
    outs = m.apply(params, x)
    import numpy as np

    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
    # deterministic
    outs2 = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs2[0]))


def test_dino_with_swin_backbone_forward():
    from datr_tpu.models.dino import DINO

    model = DINO(
        num_classes=3, num_queries=10, hidden_dim=32, nheads=2,
        enc_layers=1, dec_layers=1, dim_feedforward=64,
        dn_number=2, dn_single_pad=2, dn_labelbook_size=3,
        backbone_name="swin_T_224_1k", use_remat=False,
    )
    # patch a tiny swin via monkey config is heavy; just check init+apply
    x = jnp.zeros((1, 64, 64, 3))
    m = jnp.zeros((1, 64, 64), bool)
    params = model.init(jax.random.PRNGKey(0), x, m, train=False)
    out = model.apply(params, x, m, train=False)
    assert out["pred_logits"].shape == (1, 10, 3)
