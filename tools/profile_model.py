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

    dev = []
    for e in events:
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        if name.lower().startswith("thread") or "stream" in name.lower():
            continue
        dev.append(e)

    # parent intervals: jit entry + while loops (the MSDA gather maps).
    # Everything else is a leaf op; leaves sum to the device step time.
    whiles = [(e["ts"], e["ts"] + e["dur"]) for e in dev
              if e["name"].startswith("while")]
    leaves = [e for e in dev
              if not e["name"].startswith(("while", "jit_", "jit("))]

    def in_while(e):
        mid = e["ts"] + e["dur"] / 2
        return any(a <= mid <= b for a, b in whiles)

    tot = defaultdict(float)
    count = defaultdict(int)
    top = defaultdict(float)
    topc = defaultdict(int)
    in_w = defaultdict(float)
    for e in leaves:
        name = e["name"].lower()
        dur = e["dur"]  # us
        cat = "other"
        for c, keys in CATEGORIES:
            if any(k in name for k in keys):
                cat = c
                break
        where = "IN-gather-loop" if in_while(e) else "outside"
        tot[(cat, where)] += dur
        count[(cat, where)] += 1
        # collapse numeric suffixes so repeated per-layer ops aggregate
        base = e["name"].split(".")[0]
        top[(base, where)] += dur
        topc[(base, where)] += 1
        in_w[where] += dur

    total = sum(in_w.values())
    print(f"=== leaf device time: {total/1e3:.2f} ms "
          f"(inside gather loops {in_w.get('IN-gather-loop', 0)/1e3:.2f}, "
          f"outside {in_w.get('outside', 0)/1e3:.2f}) ===")
    print("=== category x location (ms) ===")
    for (c, wh), v in sorted(tot.items(), key=lambda kv: -kv[1]):
        print(f"{c:16s} {wh:15s} {v/1e3:9.2f} ms  ({count[(c, wh)]} events)")
    print("=== top 40 op groups (name-prefix aggregated) ===")
    for (n, wh), v in sorted(top.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v/1e3:9.2f} ms  x{topc[(n, wh)]:4d}  {wh:14s} {n[:80]}")


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
