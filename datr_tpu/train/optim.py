"""Optimizer with parameter groups (reference: util/get_param_dicts.py:15-32
'default' type + main.py AdamW) via optax.multi_transform:

- 'frozen'   : frozen-BN statistics + backbone stem/layer1 (the reference
               marks these requires_grad=False, backbone.py:79-81) -> zero.
- 'backbone' : backbone layer2..4 -> lr_backbone (1e-5).
- 'main'     : everything else -> lr (1e-4).

Both trainable groups use AdamW with the config weight decay and global-norm
gradient clipping (main.py clip_max_norm 0.1).
"""

from __future__ import annotations

from typing import Any

import optax


def _label_for_path(path: tuple) -> str:
    keys = [str(getattr(p, "key", p)) for p in path]
    try:
        b = keys.index("backbone")
    except ValueError:
        return "main"
    sub = keys[b + 1] if len(keys) > b + 1 else ""
    # stem + layer1 are frozen (backbone.py:79-81)
    if sub in ("conv1", "bn1") or sub.startswith("layer1_"):
        return "frozen"
    # frozen-BN variables (affine + running stats) never update anywhere
    # (torch registers them as buffers / requires_grad=False)
    leaf_parent = keys[-2] if len(keys) >= 2 else ""
    if leaf_parent.startswith(("bn", "downsample_bn")):
        return "frozen"
    return "backbone"


def param_labels(params) -> Any:
    import jax

    return jax.tree_util.tree_map_with_path(
        lambda path, _: _label_for_path(path), params
    )


def zero_frozen(tree):
    """Zero the leaves of the frozen param group. The reference's frozen
    params are requires_grad=False, so their .grad is None and
    torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm)
    (engine.py:110) skips them — both the clip norm and the logged
    grad_total_norm are over TRAINABLE grads only. JAX autodiff produces
    real gradients for every leaf, so parity requires masking them out
    before any global-norm computation."""
    import jax
    import jax.numpy as jnp

    labels = param_labels(tree)
    return jax.tree.map(
        lambda g, l: jnp.zeros_like(g) if l == "frozen" else g, tree, labels
    )


def make_optimizer(
    params,
    lr: float = 1e-4,
    lr_backbone: float = 1e-5,
    weight_decay: float = 1e-4,
    clip_max_norm: float = 0.1,
    lr_drop_factor: float = 0.1,
    lr_drop_step: int | None = None,
    schedule_type: str = "step",  # 'step' | 'multistep' | 'onecycle'
    lr_drop_steps: list | None = None,  # for 'multistep' (lr_drop_list)
    total_steps: int | None = None,  # for 'onecycle' (main.py onecyclelr)
    return_schedule: bool = False,
):
    """Param-group optimizer (reference util/get_param_dicts.py 'default'
    groups + main.py schedules). With return_schedule=True, returns
    (tx, lr_schedule) where lr_schedule(step) is this instance's main-group
    lr — so the driver can log lr(step) like the reference's metric_logger
    lr meter (engine.py:43,122) without shared mutable state between
    optimizer instances."""

    def make_schedule(learning_rate):
        if schedule_type == "onecycle" and total_steps:
            return optax.cosine_onecycle_schedule(
                total_steps, peak_value=learning_rate
            )
        if schedule_type == "multistep" and lr_drop_steps:
            return optax.piecewise_constant_schedule(
                learning_rate, {s: lr_drop_factor for s in lr_drop_steps}
            )
        if lr_drop_step is not None:
            return optax.piecewise_constant_schedule(
                learning_rate, {lr_drop_step: lr_drop_factor}
            )
        return learning_rate

    def adamw(learning_rate):
        return optax.adamw(make_schedule(learning_rate),
                           weight_decay=weight_decay)

    sched = make_schedule(lr)
    lr_schedule = sched if callable(sched) else (lambda step: lr)
    labels = param_labels(params)
    tx = optax.multi_transform(
        {
            "main": adamw(lr),
            "backbone": adamw(lr_backbone),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if clip_max_norm > 0:
        # Zero frozen-group grads BEFORE the clip: the reference's clip norm
        # is over trainable grads only (clip_grad_norm_ skips grad-None
        # frozen params, engine.py:110) — including them would deflate every
        # clipped update. The zeroing is folded INTO the clip transform
        # (not a separate chain stage) so the opt_state pytree keeps the
        # 2-element (clip, multi_transform) structure — orbax restores of
        # checkpoints saved before this fix still match.
        clip = optax.clip_by_global_norm(clip_max_norm)

        def _clip_update(updates, state, params=None):
            return clip.update(zero_frozen(updates), state, params)

        tx = optax.chain(
            optax.GradientTransformation(clip.init, _clip_update),
            tx,
        )
    if return_schedule:
        return tx, lr_schedule
    return tx
