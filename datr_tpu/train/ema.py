"""EMA model tracks as pure pytree lerps (reference: models/dino/EMA.py).

Three policies, matching the reference classes:
- ramped   : decay * (1 - exp(-updates / 2000))      (ModelEMA :21-54)
- fixed    : constant decay                           (SemiSupModelEMA :56-90)
- cosine   : decay annealed per epoch from decay_start to decay_end
             (CosineEMA :92-135, update_decay :129-131)

A torch state_dict EMA covers params and buffers; here the pytree lerp covers
the full params tree (frozen-BN stats included — they never change, so the
lerp is a no-op on them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, decay):
    """ema <- decay * ema + (1 - decay) * params (elementwise, any pytree)."""
    return jax.tree.map(
        lambda e, p: e * decay + (1.0 - decay) * p.astype(e.dtype),
        ema_params, params,
    )


def ramped_decay(base_decay: float, updates) -> jnp.ndarray:
    """Exponential warm-up of the decay (ModelEMA, EMA.py:37)."""
    return base_decay * (1.0 - jnp.exp(-updates / 2000.0))


def cosine_decay(
    decay_start: float, decay_end: float, cur_epoch, total_epochs: int
) -> jnp.ndarray:
    """CosineEMA.update_decay (EMA.py:129-131)."""
    return decay_end - (decay_end - decay_start) * (
        jnp.cos(jnp.pi * cur_epoch / total_epochs) + 1.0
    ) / 2.0
