"""Sharded (no-host-gather) checkpoint save/restore for >HBM models:
leaves are written as distributed jax.Arrays and restored straight into
the target shardings — including a DIFFERENT mesh layout than the one
they were saved under."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from datr_tpu.parallel.mesh import make_mesh
from datr_tpu.train.checkpoint import (
    load_checkpoint_sharded,
    save_checkpoint_sharded,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_save_restore_roundtrip(tmp_path):
    mesh = make_mesh(8, tp=2)  # data=4 x model=2
    tree = {
        "kernel": jax.device_put(
            jnp.arange(64 * 32, dtype=jnp.float32).reshape(64, 32),
            NamedSharding(mesh, P("data", "model")),
        ),
        "bias": jax.device_put(
            jnp.arange(32, dtype=jnp.float32), NamedSharding(mesh, P())
        ),
        "step": jax.device_put(jnp.int32(7), NamedSharding(mesh, P())),
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint_sharded(path, tree, epoch=3, extra={"best": {"a": 1.0}})

    # restore into the same shardings
    target = jax.tree.map(jnp.zeros_like, tree)
    target = {
        k: jax.device_put(v, tree[k].sharding) for k, v in target.items()
    }
    restored, meta = load_checkpoint_sharded(path, target)
    assert meta["epoch"] == 3 and meta["best"] == {"a": 1.0}
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(restored["kernel"])),
        np.arange(64 * 32, dtype=np.float32).reshape(64, 32),
    )
    assert restored["kernel"].sharding.spec == P("data", "model")
    # each device holds a strict shard, not the full array
    shard = restored["kernel"].sharding.shard_shape(restored["kernel"].shape)
    assert np.prod(shard) == 64 * 32 // 8

    # restore under a DIFFERENT mesh layout (resharding restore)
    mesh2 = make_mesh(8, tp=4)  # data=2 x model=4
    target2 = {
        "kernel": jax.device_put(
            jnp.zeros((64, 32)), NamedSharding(mesh2, P("model", "data"))
        ),
        "bias": jax.device_put(jnp.zeros((32,)),
                               NamedSharding(mesh2, P())),
        "step": jax.device_put(jnp.int32(0), NamedSharding(mesh2, P())),
    }
    restored2, _ = load_checkpoint_sharded(path, target2)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(restored2["kernel"])),
        np.arange(64 * 32, dtype=np.float32).reshape(64, 32),
    )
    assert restored2["kernel"].sharding.spec == P("model", "data")
