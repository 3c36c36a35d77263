"""Capture jax.profiler device traces of the flagship model (inference
forward + full DA train step) and print an op-category breakdown.

The relay returns from block_until_ready early, but jax.profiler traces are
honest device timelines (CLAUDE.md). Run on the real TPU:
  python tools/profile_model.py [--train] [--trace-dir /tmp/trace]

Prints per-category totals parsed from the trace's XLA-op events.
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(train: bool):
    from datr_tpu.config import load_config
    from datr_tpu.models.registry import build_model

    cfg = load_config("configs/DA/Cityscapes2FoggyCityscapes/"
                      "DINO_4scale_C2F.py")
    cfg["amp_dtype"] = "bfloat16"  # match bench.py conditions
    if os.environ.get("PROFILE_REMAT"):
        cfg["use_remat"] = os.environ["PROFILE_REMAT"] == "1"
    model, ccfg, wd = build_model(cfg)
    B, Hc, Wc = 2, 800, 1344
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((B, Hc, Wc, 3), jnp.float32)
    pad_mask = jnp.zeros((B, Hc, Wc), bool)

    if not train:
        params = jax.jit(lambda: model.init(rng, images[:1], pad_mask[:1],
                                            train=False))()

        @jax.jit
        def fwd(p, x, m):
            return model.apply(p, x, m, train=False)

        return fwd, (params, images, pad_mask)

    from datr_tpu.train.optim import make_optimizer
    from datr_tpu.train.state import create_train_state
    from datr_tpu.train.steps import train_step_burnin

    max_boxes = 32
    K, C = cfg.num_classes, cfg.hidden_dim
    half = B // 2  # DA batches: targets cover the source half only
    targets = dict(
        boxes=jnp.tile(jnp.asarray([[0.5, 0.5, 0.2, 0.2]], jnp.float32),
                       (half, max_boxes, 1)),
        labels=jnp.zeros((half, max_boxes), jnp.int32),
        valid=jnp.ones((half, max_boxes), bool),
    )
    params = jax.jit(lambda: model.init(
        rng, images, pad_mask, targets=targets, dn_rng=rng, train=True,
        global_proto=jnp.zeros((K, C)), amount=jnp.zeros((K,)),
    ))()
    tx = make_optimizer(params, lr=cfg.lr, lr_backbone=cfg.lr_backbone)
    state = create_train_state(params, tx, K, C, rng)
    batch = dict(
        images=images, pad_mask=pad_mask,
        boxes=jnp.tile(jnp.asarray([[0.5, 0.5, 0.2, 0.2]]),
                       (half, max_boxes, 1)).astype(jnp.float32),
        labels=jnp.zeros((half, max_boxes), jnp.int32),
        valid=jnp.ones((half, max_boxes), bool),
    )

    def step(state, batch):
        return train_step_burnin(state, batch, model, tx, ccfg, wd)

    return step, (state, batch)


CATEGORIES = (
    ("gather", ("gather",)),
    ("scatter", ("scatter",)),
    ("conv", ("convolution",)),
    ("matmul", ("dot", "einsum")),
    ("reduce", ("reduce",)),
    ("sort/topk", ("sort", "top-k", "topk")),
    ("copy/transpose", ("copy", "transpose", "bitcast")),
    ("fusion-other", ("fusion", "loop_")),
)


def summarize(trace_dir):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files found under", trace_dir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # keep only TensorCore op events (pid names containing 'TPU' lanes)
    pid_names = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    tot = defaultdict(float)
    count = defaultdict(int)
    top = defaultdict(float)
    for e in events:
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "").lower()
        dur = e["dur"]  # us
        if name.startswith("thread") or "stream" in name:
            continue
        cat = "other"
        for c, keys in CATEGORIES:
            if any(k in name for k in keys):
                cat = c
                break
        tot[cat] += dur
        count[cat] += 1
        top[e.get("name", "")] += dur
    print("=== category totals (ms, device ops) ===")
    for c, v in sorted(tot.items(), key=lambda kv: -kv[1]):
        print(f"{c:16s} {v/1e3:9.2f} ms  ({count[c]} events)")
    print("=== top 25 ops ===")
    for n, v in sorted(top.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v/1e3:9.2f} ms  {n[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/datr_trace")
    ap.add_argument("--summarize-only", default="")
    args = ap.parse_args()

    if args.summarize_only:
        summarize(args.summarize_only)
        return

    fn, fargs = build(args.train)
    # compile + warm up (first fetch pays the tunnel warm-up)
    out = fn(*fargs)
    if args.train:
        # the step donates its input state — continue from the returned one
        fargs = (out[0],) + fargs[1:]
        _ = float(np.asarray(out[1]["loss"]))
    else:
        _ = float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))

    with jax.profiler.trace(args.trace_dir):
        out = fn(*fargs)
        if args.train:
            _ = float(np.asarray(out[1]["loss"]))
        else:
            _ = float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
    summarize(args.trace_dir)


if __name__ == "__main__":
    main()
