"""Training state: everything the reference keeps as module attributes /
separate objects (optimizer, three EMA copies, global prototypes) lives in one
explicit pytree.

Reference equivalents: optimizer + lr_scheduler (main.py), EMA teacher
(main.py:292), CosineEMA best model (main_teacher.py / main.py:382-386),
model.global_proto/Amount buffers (dino.py:106-107).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_teacher: Any  # ModelEMA(0.9997) track — pseudo-label teacher
    best_ema: Any  # CosineEMA track of the teacher
    model_ema: Any  # --use_ema per-step ModelEma of the student
    # (reference util/utils.py:373-397 + main.py:149-152, saved as the
    # checkpoint_best_ema family, main.py:448-457)
    global_proto: jnp.ndarray  # [K, C]
    amount: jnp.ndarray  # [K]
    ema_updates: jnp.ndarray  # int32 counter for the ramped decay
    step: jnp.ndarray  # int32 optimizer step counter
    rng: jax.Array


def create_train_state(params, tx, num_classes: int, hidden_dim: int, rng):
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        ema_teacher=jax.tree.map(jnp.copy, params),
        best_ema=jax.tree.map(jnp.copy, params),
        model_ema=jax.tree.map(jnp.copy, params),
        global_proto=jnp.zeros((num_classes, hidden_dim)),
        amount=jnp.zeros((num_classes,)),
        ema_updates=jnp.int32(0),
        step=jnp.int32(0),
        rng=rng,
    )
