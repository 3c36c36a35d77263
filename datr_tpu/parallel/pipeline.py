"""Pipeline parallelism: GPipe microbatch scheduling over a 'pipe' mesh axis.

The reference has no pipeline strategy (its only parallelism is DDP,
main.py:156); this is the TPU-native scale-out for models whose layer stack
does not fit one chip (Swin-L + 6-layer encoder at high resolution): layers
are split into contiguous stages, one stage per device along the 'pipe' mesh
axis, and microbatches stream through the stages with `lax.ppermute`
transfers that ride ICI.

Design (the standard JAX SPMD pipeline, cf. the scaling-book recipe):
- Stage s holds layers [s*L/S, (s+1)*L/S): the stacked layer params carry a
  leading layer axis sharded over 'pipe' (each device sees its own group).
- One `lax.scan` over T = M + S - 1 ticks. At tick t, stage s applies its
  layer group to microbatch (t - s); activations move s -> s+1 through a
  single ring `ppermute` per tick. All devices run the identical program
  (SPMD), selecting their input with `where(stage == 0, fresh, received)`.
- The backward pipeline needs no code: `scan` + `ppermute` are linear-
  transposable, so `jax.grad` of the pipelined forward IS the reverse
  pipeline (ppermute transposes to the opposite ring direction).
- Write-index clamping makes every tick's output store unconditionally safe:
  junk writes (warm-up ticks clamped to slot 0, stage-0 overrun clamped to
  slot M-1) always happen BEFORE the real write to that slot, so they are
  overwritten inside the scan.

Static-shape contract: M (n_micro) must divide the batch; activations,
like everything under jit here, are fixed-shape (CLAUDE.md conventions).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 re-export
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older toolchains
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=check_rep)


def stack_layer_params(params: Any, name_fmt: str, n_layers: int) -> Any:
    """Stack per-layer param subtrees (e.g. 'enc_layer{}') on a new leading
    layer axis. `params` is the inner params dict ({'enc_layer0': ..., ...});
    layers must be shape-identical (they are: the model builds them from one
    module class)."""
    subs = [params[name_fmt.format(i)] for i in range(n_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *subs)


def _microbatch(tree: Any, n_micro: int) -> Any:
    def one(x):
        b = x.shape[0]
        assert b % n_micro == 0, (
            f"batch {b} not divisible by n_micro {n_micro}"
        )
        return x.reshape(n_micro, b // n_micro, *x.shape[1:])

    return jax.tree.map(one, tree)


def gpipe(
    stage_apply: Callable[[Any, Any, Any, Any], Any],
    stacked_params: Any,
    shared: Any,
    x: Any,
    aux: Any,
    *,
    mesh: Mesh,
    n_micro: int,
    axis: str = "pipe",
    dp_axis: Optional[str] = None,
) -> Any:
    """Run `x` through a pipelined layer stack.

    stage_apply(layer_group_params, shared, x_mb, aux_mb) -> y_mb applies one
    stage's group of layers (leading dim of layer_group_params = L/S) to one
    microbatch. `shared` is any pytree of stage-invariant values (replicated
    over 'pipe'). `x` is the [B, ...] pipelined activation (pytree allowed);
    `aux` a pytree of [B, ...] per-sample side inputs consumed by every
    stage (positions, reference points, masks).

    dp_axis: optionally shard the microbatch batch dim over a data axis of
    the same mesh, composing PP x DP in one shard_map (the body is manual
    over both axes; per-device programs stay identical).
    """
    S = mesh.shape[axis]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    assert n_layers % S == 0, (
        f"{n_layers} layers not divisible by {S} pipeline stages"
    )
    per_stage = n_layers // S

    # [L, ...] -> [S, L/S, ...]; leading dim sharded over 'pipe'
    grouped = jax.tree.map(
        lambda p: p.reshape(S, per_stage, *p.shape[1:]), stacked_params
    )
    x_mb = _microbatch(x, n_micro)
    aux_mb = _microbatch(aux, n_micro)

    def batch_spec(extra_lead: int):
        # [M, b, ...] — microbatch axis replicated, batch dim optionally DP
        def one(v):
            spec = [None] * v.ndim
            if dp_axis is not None:
                spec[extra_lead] = dp_axis
            return P(*spec)

        return one

    params_spec = jax.tree.map(lambda _: P(axis), grouped)
    shared_spec = jax.tree.map(lambda _: P(), shared)
    x_spec = jax.tree.map(batch_spec(1), x_mb)
    aux_spec = jax.tree.map(batch_spec(1), aux_mb)
    out_spec = jax.tree.map(batch_spec(1), x_mb)

    M = n_micro
    T = M + S - 1
    ring = [(i, (i + 1) % S) for i in range(S)]

    def body(params_loc, shared_loc, x_loc, aux_loc):
        # params_loc: [1, L/S, ...] (this device's stage group)
        params_loc = jax.tree.map(lambda p: p[0], params_loc)
        stage = jax.lax.axis_index(axis)
        zero_state = jax.tree.map(lambda v: jnp.zeros_like(v[0]), x_loc)
        out_buf = jax.tree.map(jnp.zeros_like, x_loc)

        def tick(carry, t):
            recv, out_buf = carry
            m = jnp.clip(t - stage, 0, M - 1)
            fresh = jax.tree.map(
                lambda v: jax.lax.dynamic_index_in_dim(v, m, 0, False), x_loc
            )
            inp = jax.tree.map(
                lambda f, r: jnp.where(stage == 0, f, r), fresh, recv
            )
            aux_t = jax.tree.map(
                lambda v: jax.lax.dynamic_index_in_dim(v, m, 0, False),
                aux_loc,
            )
            y = inp
            for i in range(per_stage):
                p_i = jax.tree.map(lambda p: p[i], params_loc)
                y = stage_apply(p_i, shared_loc, y, aux_t)
            sent = jax.tree.map(
                lambda v: jax.lax.ppermute(v, axis, ring), y
            )
            w = jnp.clip(t - (S - 1), 0, M - 1)
            out_buf = jax.tree.map(
                lambda buf, v: jax.lax.dynamic_update_index_in_dim(
                    buf, v, w, 0
                ),
                out_buf, y,
            )
            return (sent, out_buf), None

        (_, out_buf), _ = jax.lax.scan(
            tick, (zero_state, out_buf), jnp.arange(T)
        )
        # only the last stage's buffer holds the final layers' outputs;
        # one psum over 'pipe' replicates it (the consumers — two-stage
        # select, decoder memory — need the full tensor everywhere anyway)
        is_last = (stage == S - 1).astype(jax.tree.leaves(out_buf)[0].dtype)
        return jax.tree.map(
            lambda v: jax.lax.psum(v * is_last, axis), out_buf
        )

    out_mb = shard_map(
        body, mesh,
        in_specs=(params_spec, shared_spec, x_spec, aux_spec),
        out_specs=out_spec,
    )(grouped, shared, x_mb, aux_mb)
    return jax.tree.map(
        lambda v: v.reshape(v.shape[0] * v.shape[1], *v.shape[2:]), out_mb
    )


def make_pp_encoder_fn(
    model,
    params: Any,
    *,
    mesh: Mesh,
    n_micro: int,
    axis: str = "pipe",
    dp_axis: Optional[str] = None,
) -> Callable:
    """Build an `encoder_fn` for DINO.__call__/_transformer_pass that runs
    the 6 identical deformable encoder layers (reference
    deformable_transformer.py:765-820 stack) as a GPipe pipeline over
    `axis`.

    `params` is the model's params dict (variables['params']); the stacked
    per-layer copies are rebuilt in-graph each step (a relayout, cheap next
    to the layers themselves), so gradients flow to the canonical
    enc_layer{i} leaves and checkpoints keep the sequential layout.
    """
    from ..models.transformer import DeformableEncoderLayer

    if "params" in params and isinstance(params["params"], dict):
        params = params["params"]
    stacked = stack_layer_params(params, "enc_layer{}", model.enc_layers)
    layer = DeformableEncoderLayer(
        model.hidden_dim, model.dim_feedforward, model.num_feature_levels,
        model.nheads, model.enc_n_points, model.dropout, model.msda_impl,
        model.msda_bh_mode, model.msda_table_mode, model.dtype,
        model.fast_norm,
    )

    def encoder_fn(src, pos, ref, mask, spatial_shapes,
                   deterministic=True):
        # Dropout needs a per-layer/per-microbatch rng threaded through the
        # shard_map schedule — not supported; refuse rather than silently
        # training a dropout-free encoder that diverges from the
        # sequential path (reference trains with dropout=0.0 anyway).
        if not deterministic and model.dropout > 0.0:
            raise NotImplementedError(
                "pipeline-parallel encoder does not support active dropout "
                "(dropout={}) — set dropout=0.0 or disable pp_n_micro"
                .format(model.dropout)
            )

        def stage_apply(p, shared, y, aux_t):
            pos_t, ref_t, mask_t = aux_t
            apply = lambda yy: layer.apply(  # noqa: E731
                {"params": p}, yy, pos_t, ref_t, spatial_shapes, mask_t,
                True,
            )
            if model.use_remat:
                apply = jax.checkpoint(apply)
            return apply(y)

        return gpipe(
            stage_apply, stacked, (), src, (pos, ref, mask),
            mesh=mesh, n_micro=n_micro, axis=axis, dp_axis=dp_axis,
        )

    return encoder_fn
