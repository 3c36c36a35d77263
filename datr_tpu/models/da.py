"""Domain-adaptation components: gradient-reversal, image discriminator,
class prototypes.

Capability match for the reference's models/dino/DA_utils.py:
- grad_reverse (:33-43)      -> custom_vjp that negates the cotangent
- FCDiscriminator_img (:61-79) -> 4-conv patch discriminator (channels-last)
- get_prototype_class_wise (:82-120) -> pure function over explicit
  (global_proto, amount) state instead of module attribute mutation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@jax.custom_vjp
def grad_reverse(x):
    return x


def _gr_fwd(x):
    return x, None


def _gr_bwd(_, g):
    return (jax.tree.map(lambda t: -t, g),)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


class ImageDiscriminator(nn.Module):
    """Patch-level domain discriminator over backbone features (GRL input)."""

    ndf1: int = 256
    ndf2: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, H, W, C] -> [B, H, W, 1] domain logits."""
        y = nn.Conv(self.ndf1, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.ndf2, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.ndf2, (3, 3), padding=1, dtype=self.dtype,
                    name="conv3")(y)
        y = nn.leaky_relu(y, 0.2)
        return nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                       name="classifier")(y)


class PrototypeResult(NamedTuple):
    prototypes: jnp.ndarray  # [num_classes, C] batch prototypes
    valid_class_map: jnp.ndarray  # [num_classes] 1.0 where class present
    new_global_proto: jnp.ndarray  # [num_classes, C]
    new_amount: jnp.ndarray  # [num_classes]


def class_prototypes(
    queries: jnp.ndarray,  # [B, N, C] last decoder-layer query features
    logits: jnp.ndarray,  # [B, N, K] class logits for those queries
    global_proto: jnp.ndarray,  # [K, C] running prototypes (stop-graded)
    amount: jnp.ndarray,  # [K] running per-class counts
) -> PrototypeResult:
    """Masked per-class mean of query features by argmax class + momentum
    update of the running global prototype, weighted by sample counts
    (reference: DA_utils.py:82-120). One-hot mask -> a single matmul on MXU
    instead of the reference's [B*N, K, C] materialized expansion."""
    B, N, C = queries.shape
    K = logits.shape[-1]
    q = queries.reshape(B * N, C)
    pred = jnp.argmax(jax.nn.sigmoid(logits), axis=-1).reshape(B * N)
    onehot = jax.nn.one_hot(pred, K, dtype=q.dtype)  # [BN, K]

    class_count = onehot.sum(axis=0)  # [K]
    valid = (class_count != 0).astype(q.dtype)
    denom = jnp.where(class_count == 0, 1.0, class_count)
    protos = (onehot.T @ q) / denom[:, None]  # [K, C]

    g = jax.lax.stop_gradient(global_proto)
    weight = class_count / (class_count + amount)
    weight = jnp.where(class_count == 0, 0.0, weight)[:, None]
    new_global = jax.lax.stop_gradient(g * (1.0 - weight) + protos * weight)
    new_amount = amount + class_count
    return PrototypeResult(protos, valid, new_global, new_amount)
