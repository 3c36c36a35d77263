"""Device-mesh parallelism: data parallel + tensor parallel via jax.sharding.

The reference's only strategy is DDP over NCCL (main.py:156,
DistributedSampler main.py:177-186, init_distributed_mode misc.py:487-530).
The TPU-native equivalent needs no process bootstrap: one jit over a
Mesh('data', 'model') with

- batch axis sharded over 'data'  (== DDP; gradient psum inserted by XLA),
- Megatron-style tensor parallelism over 'model': FFN linear1 column-split /
  linear2 row-split, attention value/output projections head-split — XLA
  places the all-reduces on ICI automatically.

reduce_dict/metric sync (misc.py:139-163) comes for free: metrics out of a
jit over the global batch are already global.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: int = 1,
              devices=None, sp: int = 1) -> Mesh:
    """Mesh('data', 'seq', 'model'): batch DP x encoder-sequence SP x
    Megatron TP. 'seq' shards the encoder's flattened ~22k-token query axis
    (DINO(sp_axis='seq')) — the per-chip MSDA gather row count, the measured
    single-chip wall (ROADMAP.md), drops by the sp factor."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % (tp * sp) == 0, f"{n} devices not divisible by tp*sp={tp*sp}"
    arr = np.asarray(devices).reshape(n // (tp * sp), sp, tp)
    return Mesh(arr, ("data", "seq", "model"))


# --- tensor-parallel rules -------------------------------------------------
# (path regex, {ndim: PartitionSpec}). Column-split layers shard their bias
# too; row-split layer outputs are all-reduced by XLA.
_TP_RULES = [
    # FFN: column-parallel then row-parallel (classic Megatron MLP)
    (re.compile(r"ffn/linear1/kernel$"), {2: P(None, "model")}),
    (re.compile(r"ffn/linear1/bias$"), {1: P("model")}),
    (re.compile(r"ffn/linear2/kernel$"), {2: P("model", None)}),
    # MSDeformAttn: head-split value/output projections; the sampling-offset
    # and attention-weight projections flatten [H, L, P, ...] H-major, so a
    # column split by 'model' is exactly a head split — the whole per-head
    # MSDA pipeline (value rows, sampling locations, weights) is then
    # chip-local (pair with msda_bh_mode='flat' so the gather is batched
    # over b*h instead of a sequential lax.map, which SPMD cannot split)
    (re.compile(r"attn/value_proj/kernel$"), {2: P(None, "model")}),
    (re.compile(r"attn/value_proj/bias$"), {1: P("model")}),
    (re.compile(r"attn/output_proj/kernel$"), {2: P("model", None)}),
    (re.compile(r"attn/sampling_offsets/kernel$"), {2: P(None, "model")}),
    (re.compile(r"attn/sampling_offsets/bias$"), {1: P("model")}),
    (re.compile(r"attn/attention_weights/kernel$"), {2: P(None, "model")}),
    (re.compile(r"attn/attention_weights/bias$"), {1: P("model")}),
    # decoder MHA head-split (flax kernels: [in, heads, hd]; out [heads, hd,
    # out])
    (re.compile(r"self_attn/(query|key|value)/kernel$"),
     {3: P(None, "model", None)}),
    (re.compile(r"self_attn/(query|key|value)/bias$"), {2: P("model", None)}),
    (re.compile(r"self_attn/out/kernel$"), {3: P("model", None, None)}),
]


def _spec_for_path(path_str: str, ndim: int) -> P:
    for rx, by_ndim in _TP_RULES:
        if rx.search(path_str) and ndim in by_ndim:
            return by_ndim[ndim]
    return P()  # replicated


# FSDP/ZeRO: leaves smaller than this stay replicated — sharding tiny
# biases/norm scales buys nothing and costs an all-gather dispatch each.
FSDP_MIN_SIZE = 2 ** 14


def _add_fsdp_axis(ps: P, shape, mesh: Mesh,
                   min_size: int = FSDP_MIN_SIZE) -> P:
    """Extend a (possibly TP-sharded) spec with 'data'-axis sharding on the
    largest free dim (ZeRO-3 / jax fully_sharded_data_parallel idiom: params
    and their optimizer moments live sharded over the data axis; XLA inserts
    the all-gather before use and the reduce-scatter on the gradient)."""
    dp = mesh.shape["data"]
    if dp == 1 or int(np.prod(shape)) < min_size:
        return ps
    names = list(ps) + [None] * (len(shape) - len(ps))
    free = [i for i, n in enumerate(names)
            if n is None and shape[i] % dp == 0]
    if not free:
        return ps
    ax = max(free, key=lambda i: shape[i])
    names[ax] = "data"
    return P(*names)


def param_sharding_tree(params: Any, mesh: Mesh, fsdp: bool = False,
                        fsdp_min_size: int = FSDP_MIN_SIZE) -> Any:
    """NamedSharding tree for a params(-like) pytree: TP rules by path, plus
    optional FSDP sharding over 'data'. Works on any tree whose leaf paths
    END with parameter names (so optimizer moment trees, whose paths are the
    param paths with a prefix, get identical specs)."""

    def one(path, leaf):
        keys = [str(getattr(p, "key", p)) for p in path]
        ps = _spec_for_path("/".join(keys), np.ndim(leaf))
        # guard: dims must divide the tp size
        tp = mesh.shape["model"]
        for ax, name in enumerate(ps):
            if name == "model" and leaf.shape[ax] % tp != 0:
                ps = P()
                break
        if fsdp and np.ndim(leaf) > 0:
            ps = _add_fsdp_axis(ps, np.shape(leaf), mesh, fsdp_min_size)
        return NamedSharding(mesh, ps)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_train_state(state: Any, mesh: Mesh, fsdp: bool = False,
                      fsdp_min_size: int = FSDP_MIN_SIZE) -> Any:
    """Place a TrainState: params + all EMA trees TP-sharded, scalars
    replicated. With fsdp=True (ZeRO-3) every large leaf — params, EMA
    copies, AND optimizer moments — is additionally sharded over 'data', so
    per-chip state memory drops ~linearly with dp size (the >HBM-model
    enabler; reference has no equivalent, DDP replicates everything)."""
    from ..train.state import TrainState

    p_shard = param_sharding_tree(state.params, mesh, fsdp=fsdp,
                                  fsdp_min_size=fsdp_min_size)

    def like_params(tree):
        return jax.device_put(tree, p_shard)

    repl = NamedSharding(mesh, P())
    if fsdp:
        # moment trees mirror params (their leaf paths end with the param
        # path), so the same path-based rules place them shard-identically
        opt_state = jax.device_put(
            state.opt_state, param_sharding_tree(state.opt_state, mesh,
                                                 fsdp=True,
                                                 fsdp_min_size=fsdp_min_size)
        )
    else:
        opt_state = jax.tree.map(
            lambda x: jax.device_put(x, repl) if np.ndim(x) == 0 else x,
            jax.device_put(state.opt_state, repl),
        )
    return TrainState(
        params=like_params(state.params),
        opt_state=opt_state,
        ema_teacher=like_params(state.ema_teacher),
        best_ema=like_params(state.best_ema),
        model_ema=like_params(state.model_ema),
        global_proto=jax.device_put(state.global_proto, repl),
        amount=jax.device_put(state.amount, repl),
        ema_updates=jax.device_put(state.ema_updates, repl),
        step=jax.device_put(state.step, repl),
        rng=jax.device_put(state.rng, repl),
    )


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every batch array on the leading (batch) axis over 'data'."""

    def one(x):
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(one, batch)
