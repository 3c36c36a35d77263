"""ConvNeXt backbone (channels-last, static shapes).

Capability match for the reference's models/dino/convnext.py (251 LoC,
ConvNeXt :55, build :234): 4x4 patchify stem, stages of depthwise-7x7 +
pointwise-MLP blocks with LayerScale, LayerNorm downsampling between stages,
per-stage output LayerNorm, stages 1..3 returned for the detector.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        # depthwise 7x7
        x = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init),
            (self.dim,),
        )
        return shortcut + gamma * x


class ConvNeXt(nn.Module):
    """Returns features of stages 1..3 (strides 8/16/32)."""

    depths: Sequence[int] = (3, 3, 9, 3)  # tiny
    dims: Sequence[int] = (96, 192, 384, 768)
    return_stages: Sequence[int] = (1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)

        outs = []
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"down{stage}_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down{stage}_conv")(x)
            for b in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype,
                                  name=f"stage{stage}_block{b}")(x)
            if stage in self.return_stages:
                outs.append(
                    nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"out_norm{stage}")(x)
                )
        return tuple(outs)


CONVNEXT_CONFIGS = {
    "convnext_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "convnext_small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "convnext_base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "convnext_large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
    "convnext_xlarge_22k": dict(depths=(3, 3, 27, 3),
                                dims=(256, 512, 1024, 2048)),
}
