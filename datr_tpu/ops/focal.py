"""Sigmoid focal loss (reference: models/dino/dino.py sigmoid_focal_loss import
chain, used at dino.py:526 with alpha=0.25, gamma=2)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Elementwise focal loss; caller reduces/normalizes.

    logits, targets: same shape; targets are {0,1} one-hot (float).
    """
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * ((1.0 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable sigmoid binary cross-entropy with logits."""
    return jnp.clip(logits, 0, None) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
