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


def _get_async_ckptr():
    """Singleton orbax AsyncCheckpointer: the host->disk write happens on a
    background thread so the train loop keeps stepping (the reference's
    torch.save blocks; async saves are the TPU-scale norm). Flushed before
    re-saving the same path and at interpreter exit."""
    global _async_ckptr
    if _async_ckptr is None:
        import atexit

        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        atexit.register(_async_ckptr.wait_until_finished)
    return _async_ckptr


def wait_for_async_saves():
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint(path: str, state: Any, epoch: int,
                    extra: Optional[dict] = None, use_async: bool = False):
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    state = jax.device_get(state)
    if use_async:
        ck = _get_async_ckptr()
        ck.wait_until_finished()  # serialize saves to the same path
        ck.save(path, state, force=True)
    else:
        _ckptr().save(path, state, force=True)
    meta = {"epoch": epoch, **(extra or {})}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


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
        if r.size != t.size:
            raise ValueError(
                f"pretrain checkpoint at {path}: param "
                f"{jax.tree_util.keystr(kp)} has shape {r.shape}, model "
                f"expects {t.shape} — wrong config for this checkpoint?"
            )
        leaves.append(r.astype(t.dtype).reshape(t.shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def maybe_auto_resume(output_dir: str, state: Any):
    """Resume from <output_dir>/checkpoint if present (main.py:226-245)."""
    path = os.path.join(output_dir, "checkpoint")
    if os.path.isdir(path):
        state, meta = load_checkpoint(path, state)
        return state, int(meta.get("epoch", -1)) + 1
    return state, 0


class BestTracker:
    """Track the best AP50 per family and save on improvement
    (util/utils.py BestMetricHolder :398-470 + main.py best families)."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        self.best: dict = {}

    def update(self, family: str, ap50: float, tree: Any, epoch: int) -> bool:
        prev = self.best.get(family, -1.0)
        if ap50 > prev:
            self.best[family] = float(ap50)
            save_checkpoint(
                os.path.join(self.output_dir, family), tree, epoch,
                {"ap50": float(ap50)},
            )
            with open(os.path.join(self.output_dir, "log_best.txt"), "a") as f:
                f.write(json.dumps(
                    {"family": family, "epoch": epoch, "ap50": float(ap50)}
                ) + "\n")
            return True
        return False
