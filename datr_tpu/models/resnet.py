"""ResNet backbones with frozen batch-norm, channels-last (NHWC — TPU native).

Capability match for the reference backbone stack
(models/dino/backbone.py:36-128: FrozenBatchNorm2d, BackboneBase with
IntermediateLayerGetter over torchvision resnet50/101). Weights convert 1:1
from torchvision/DATR checkpoints via tools/convert_checkpoint.py.

Frozen BN is an affine transform with pretrained statistics; its variables
live in the 'params' tree but are masked out of the optimizer
(datr_tpu/train/optim.py), matching torch buffers that never receive grads.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """y = (x - mean) / sqrt(var + eps) * weight + bias with frozen stats."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight / jnp.sqrt(var + self.eps)
        return (x.astype(jnp.float32) - mean) * scale + bias


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck block with identity/projection shortcut."""

    features: int  # bottleneck width; output is features * 4
    strides: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(self.dilation, self.dilation)] * 2,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBatchNorm(self.features * 4, name="bn3")(y)

        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = FrozenBatchNorm(self.features * 4, name="downsample_bn")(
                residual
            )
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet-50/101 trunk returning the requested intermediate stages.

    return_stages indexes stages as the reference's return_interm_indices:
    0 = layer1 (stride 4) ... 3 = layer4 (stride 32). Default [1, 2, 3] gives
    strides (8, 16, 32) for the 4-scale configs (DINO_4scale_C2F.py:32).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # resnet50; 101 = (3, 4, 23, 3)
    return_stages: Sequence[int] = (1, 2, 3)
    dilation_last_stage: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        y = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = FrozenBatchNorm(64, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        widths = (64, 128, 256, 512)
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            dilate = self.dilation_last_stage and stage == 3
            for b in range(blocks):
                strides = 2 if (b == 0 and stage > 0 and not dilate) else 1
                y = Bottleneck(
                    width, strides=strides, dilation=2 if dilate else 1,
                    dtype=self.dtype, name=f"layer{stage + 1}_block{b}",
                )(y)
            if stage in self.return_stages:
                outs.append(y)
        return tuple(outs)
