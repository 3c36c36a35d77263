"""Checkpoint save/restore via orbax, including the best-model families.

Capability match for the reference checkpointing (main.py:395-412 per-epoch +
interval saves; :425-515 best families keyed on AP50: checkpoint_best_regular,
checkpoint_best_ema, best_ema_teacher, best_ema_model; auto-resume
:226-245). One orbax PyTreeCheckpointer stores the full TrainState pytree
(params, optimizer, all EMA tracks, prototype state, counters).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _ckptr():
    return ocp.PyTreeCheckpointer()


_async_ckptr = None
# meta.json contents for async saves still in flight: flushed only after
# wait_until_finished confirms the orbax write committed, so a crash mid-save
# can never leave an epoch-N meta next to an epoch-N-1 checkpoint (the stale
# pair would make auto-resume silently skip an epoch).
_pending_meta: dict = {}


def _write_meta(path: str, meta: dict):
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def _flush_pending_meta():
    while _pending_meta:
        p, m = _pending_meta.popitem()
        _write_meta(p, m)


def _get_async_ckptr():
    """Singleton orbax AsyncCheckpointer: the host->disk write happens on a
    background thread so the train loop keeps stepping (the reference's
    torch.save blocks; async saves are the TPU-scale norm). Flushed before
    re-saving the same path and at interpreter exit."""
    global _async_ckptr
    if _async_ckptr is None:
        import atexit

        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        atexit.register(wait_for_async_saves)
    return _async_ckptr


def wait_for_async_saves():
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()
    _flush_pending_meta()


def save_checkpoint(path: str, state: Any, epoch: int,
                    extra: Optional[dict] = None, use_async: bool = False):
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    state = jax.device_get(state)
    meta = {"epoch": epoch, **(extra or {})}
    if use_async:
        ck = _get_async_ckptr()
        ck.wait_until_finished()  # serialize saves to the same path
        _flush_pending_meta()  # previous saves are now committed
        ck.save(path, state, force=True)
        _pending_meta[path] = meta
    else:
        _ckptr().save(path, state, force=True)
        _write_meta(path, meta)


def save_checkpoint_sharded(path: str, state: Any, epoch: int,
                            extra: Optional[dict] = None):
    """Save a mesh-sharded state WITHOUT gathering it to one host.

    For models whose TrainState exceeds host/chip memory (FSDP-sharded over
    Mesh 'data', parallel/mesh.py:shard_train_state(fsdp=True)), the leaves
    are passed to orbax as live sharded jax.Arrays: every process writes
    only its own shards. The reference's torch.save (main.py:395-412) has no
    equivalent — DDP replicates, rank 0 serializes the full model.
    """
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    _ckptr().save(path, state, force=True)
    if jax.process_index() == 0:
        _write_meta(path, {"epoch": epoch, **(extra or {})})


def load_checkpoint_sharded(path: str, target: Any):
    """Restore directly into the target's shardings (no host round-trip).

    `target` is a sharded state (e.g. freshly shard_train_state'd): each
    leaf is restored distributed, laid out per its NamedSharding — works
    across mesh-layout changes (save on dp4xtp2, restore on dp2xtp4).
    """
    wait_for_async_saves()
    path = os.path.abspath(path)
    restore_args = ocp.checkpoint_utils.construct_restore_args(target)
    state = _ckptr().restore(path, item=target, restore_args=restore_args)
    meta = {}
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def update_checkpoint_meta(path: str, extra: dict):
    """Merge fields into a checkpoint's meta.json after the fact (used to
    record the BestTracker state, which is only known after the post-save
    evals). Works whether the save's meta write is still pending (async) or
    already on disk."""
    path = os.path.abspath(path)
    if path in _pending_meta:
        _pending_meta[path].update(extra)
        return
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    meta.update(extra)
    _write_meta(path, meta)


def load_checkpoint(path: str, target: Any):
    wait_for_async_saves()
    path = os.path.abspath(path)
    state = _ckptr().restore(path, item=jax.device_get(target))
    meta = {}
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def load_pretrain_params(path: str, params_target: Any):
    """Load a pretrain checkpoint into a params tree.

    Accepts either a full TrainState tree (saved by save_checkpoint on
    `checkpoint`/`checkpointNNNN`) or a params-only tree (saved by
    BestTracker for the best families: best_ema_teacher, best_ema_model,
    checkpoint_best_regular). The reference analogue is main.py:247-271
    (--pretrain_model_path state-dict load) and main_teacher.py:234,311
    (resume student from the ema_model entry).
    """
    path = os.path.abspath(path)
    raw = _ckptr().restore(path)  # structure as stored, no target
    if isinstance(raw, dict) and "params" in raw and "opt_state" in raw:
        raw = raw["params"]
    # published EVAL checkpoints may lack the train-only DA heads (the
    # reference creates D_img/Proto_D only when training, dino.py:102-108;
    # tools/convert_checkpoint.py emits them only if present). Fill exactly
    # these from the freshly initialized target — everything else stays
    # strictly checked.
    if (isinstance(raw, dict) and "params" in raw
            and isinstance(raw["params"], dict)
            and isinstance(params_target, dict)
            and "params" in params_target):
        for da_head in ("d_img", "proto_d"):
            if (da_head not in raw["params"]
                    and da_head in params_target["params"]):
                raw = dict(raw, params=dict(raw["params"]))
                raw["params"][da_head] = jax.device_get(
                    params_target["params"][da_head])
    flat_t, treedef = jax.tree_util.tree_flatten(params_target)
    flat_r = jax.tree_util.tree_leaves(raw)
    if len(flat_t) != len(flat_r):
        raise ValueError(
            f"pretrain checkpoint at {path} has {len(flat_r)} leaves, "
            f"model expects {len(flat_t)}"
        )
    paths = jax.tree_util.tree_flatten_with_path(params_target)[0]
    leaves = []
    for (kp, t), r in zip(paths, flat_r):
        r = np.asarray(r)
        # exact shape match required: a transposed / mis-laid-out kernel of
        # the right SIZE (e.g. from a foreign converter) must fail loudly,
        # not silently reshape into a broken model
        if r.shape != tuple(t.shape):
            raise ValueError(
                f"pretrain checkpoint at {path}: param "
                f"{jax.tree_util.keystr(kp)} has shape {r.shape}, model "
                f"expects {tuple(t.shape)} — wrong config or a mis-converted "
                f"checkpoint?"
            )
        leaves.append(r.astype(t.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def maybe_auto_resume(output_dir: str, state: Any):
    """Resume from <output_dir>/checkpoint if present (main.py:226-245).

    Returns (state, start_epoch, meta) — meta carries the persisted
    BestTracker `best` dict so a resumed run cannot let a mediocre
    post-resume epoch overwrite a better pre-crash best family
    (util/utils.py BestMetricHolder resume semantics)."""
    path = os.path.join(output_dir, "checkpoint")
    if os.path.isdir(path):
        state, meta = load_checkpoint(path, state)
        return state, int(meta.get("epoch", -1)) + 1, meta
    return state, 0, {}


def load_resume(path: str, state: Any):
    """Explicit --resume load (reference main.py:226-245 args.resume branch).

    Accepts a full TrainState checkpoint (resume training where it left
    off) or a params-only best-family checkpoint (e.g. best_ema_teacher for
    --eval --ema, scripts/DINO_eval_ema.sh) — in the latter case params and
    every EMA track start from the loaded weights.
    Returns (state, start_epoch, meta)."""
    path = os.path.abspath(path)
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    # Structure probe WITHOUT materializing the tree (a multi-GB TrainState
    # would otherwise be read twice: once here, once in load_checkpoint).
    try:
        struct = _ckptr().metadata(path)
        # orbax StepMetadata wraps the tree in .item_metadata (keys() works
        # there); older orbax returned the tree metadata directly
        struct = getattr(struct, "item_metadata", struct)
        top_keys = set(struct.keys()) if hasattr(struct, "keys") else set()
    except Exception:  # older layouts: fall back to a data restore
        struct = _ckptr().restore(path)
        top_keys = set(struct.keys()) if isinstance(struct, dict) else set()
    if {"params", "opt_state"} <= top_keys:
        state, meta = load_checkpoint(path, state)
        return state, int(meta.get("epoch", -1)) + 1, meta
    import jax.numpy as jnp

    loaded = load_pretrain_params(path, state.params)
    state = state.replace(
        params=loaded,
        ema_teacher=jax.tree.map(jnp.copy, loaded),
        best_ema=jax.tree.map(jnp.copy, loaded),
        model_ema=jax.tree.map(jnp.copy, loaded),
    )
    # params-only checkpoint: do NOT advance start_epoch — the reference only
    # sets start_epoch when optimizer+lr_scheduler+epoch are all present in
    # the checkpoint (main.py:239-245); a fresh opt_state with a skipped-ahead
    # epoch counter would misalign the step-based lr schedule
    return state, 0, meta


class BestTracker:
    """Track the best AP50 per family and save on improvement
    (util/utils.py BestMetricHolder :398-470 + main.py best families).

    `best` persists across restarts via the main checkpoint's meta.json
    (pass the resumed dict as `initial_best`). With `write_enabled=False`
    (non-zero process_index on a pod) the tracker still tracks — so every
    process agrees on what is best — but only process 0 writes files."""

    def __init__(self, output_dir: str, initial_best: Optional[dict] = None,
                 write_enabled: bool = True):
        self.output_dir = output_dir
        self.best: dict = dict(initial_best or {})
        self.write_enabled = write_enabled

    def update(self, family: str, ap50: float, tree: Any, epoch: int) -> bool:
        prev = self.best.get(family, -1.0)
        if ap50 > prev:
            self.best[family] = float(ap50)
            if self.write_enabled:
                save_checkpoint(
                    os.path.join(self.output_dir, family), tree, epoch,
                    {"ap50": float(ap50)},
                )
                with open(os.path.join(self.output_dir, "log_best.txt"),
                          "a") as f:
                    f.write(json.dumps(
                        {"family": family, "epoch": epoch,
                         "ap50": float(ap50)}
                    ) + "\n")
            return True
        return False
