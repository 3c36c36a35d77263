"""Swin Transformer backbone (channels-last, static shapes).

Capability match for the reference's models/dino/swin_transformer.py (727
LoC, SwinTransformer :435, build at backbone.py:147-219): patch embed,
shifted-window attention with relative position bias, patch merging between
stages, returning stages 1..3 features for the detector. Weights convert from
timm/reference checkpoints via tools/convert_checkpoint.py extensions.

TPU notes: window partition is pure reshape/transpose (free under XLA);
attention over 49-token windows batches thousands of windows onto the MXU at
once; the shift is a jnp.roll (cheap HBM-local permute).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x, ws: int):
    """[B, H, W, C] -> [B*nH*nW, ws*ws, C] (H, W divisible by ws)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows, ws: int, B: int, H: int, W: int):
    C = windows.shape[-1]
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H, W, C)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, n, n]
    rel = rel.transpose(1, 2, 0) + np.array([ws - 1, ws - 1])
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        """x: [nW, N, C]; mask: [nGroups, N, N] additive or None."""
        nW, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(nW, N, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [nW, N, h, hd]
        q = q * (hd ** -0.5)
        attn = jnp.einsum("wnhd,wmhd->whnm", q, k,
                          preferred_element_type=jnp.float32)

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = relative_position_index(self.window_size)
        bias = rpb_table[idx.reshape(-1)].reshape(N, N, h)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None]

        if mask is not None:
            g = mask.shape[0]
            attn = attn.reshape(nW // g, g, h, N, N) + mask[None, :, None]
            attn = attn.reshape(nW, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("whnm,wmhd->wnhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(nW, N, C).astype(self.dtype)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


def shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Additive mask [nW, N, N] for shifted windows (built statically)."""
    img = np.zeros((1, H, W, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wslice in (slice(0, -ws), slice(-ws, -shift),
                       slice(-shift, None)):
            img[:, hs, wslice, :] = cnt
            cnt += 1
    # numpy-only partition (same math as window_partition) so the mask can
    # be built under abstract tracing (jax.eval_shape)
    win = (
        img.reshape(1, H // ws, ws, W // ws, ws, 1)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(-1, ws * ws, 1)
    )[:, :, 0]
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)

        pad_h = (ws - H % ws) % ws
        pad_w = (ws - W % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        mask = None
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            # [n_img_windows, N, N] additive mask — every image in the batch
            # shares the same window layout (static shapes)
            mask = jnp.asarray(shift_attn_mask(Hp, Wp, ws, self.shift))

        win = window_partition(x, ws)  # [B * n_img_windows, N, C]
        win_attn = WindowAttention(
            self.dim, self.num_heads, ws, self.dtype, name="attn"
        )(win, mask=mask)
        x = window_reverse(win_attn, ws, B, Hp, Wp)

        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x[:, :H, :W]
        x = shortcut + x

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        pad_h, pad_w = H % 2, W % 2
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2],
             x[:, 1::2, 1::2]], axis=-1,
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    """Returns features of stages 1..3 (strides 8/16/32), like ResNet's
    return_stages=(1, 2, 3)."""

    embed_dim: int = 96  # tiny; small=96, base=128, large=192
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    return_stages: Sequence[int] = (1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        # patch embed 4x4
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4),
                    dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        outs = []
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            for b in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[stage], self.window_size,
                    shift=0 if b % 2 == 0 else self.window_size // 2,
                    dtype=self.dtype, name=f"stage{stage}_block{b}",
                )(x)
            if stage in self.return_stages:
                outs.append(
                    nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"out_norm{stage}")(x)
                )
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"merge{stage}")(x)
                dim *= 2
        return tuple(outs)


SWIN_CONFIGS = {
    "swin_T_224_1k": dict(embed_dim=96, depths=(2, 2, 6, 2),
                          num_heads=(3, 6, 12, 24)),
    "swin_S_224_1k": dict(embed_dim=96, depths=(2, 2, 18, 2),
                          num_heads=(3, 6, 12, 24)),
    "swin_B_384_22k": dict(embed_dim=128, depths=(2, 2, 18, 2),
                           num_heads=(4, 8, 16, 32), window_size=12),
    "swin_L_384_22k": dict(embed_dim=192, depths=(2, 2, 18, 2),
                           num_heads=(6, 12, 24, 48), window_size=12),
}
