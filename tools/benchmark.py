"""Model benchmark: params / GFLOPs / latency / FPS.

Capability match for the reference tools/benchmark.py (:587-671): parameter
count, FLOPs (XLA compiled-cost analysis instead of torch jit-trace op
handlers), and timed inference (warmup + mean). Writes a log line compatible
with the reference's flops/log.txt output.

Usage:
  python tools/benchmark.py -c configs/DA/Cityscapes2FoggyCityscapes/\
DINO_4scale_C2F.py [--batch 1] [--iters 20] [--hw 800 1344]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", "-c", required=True)
    ap.add_argument("--options", nargs="+", default=[])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--hw", type=int, nargs=2, default=[800, 1344])
    ap.add_argument("--out", default="flops/log.txt")
    args = ap.parse_args()

    from datr_tpu.config import apply_overrides, load_config
    from datr_tpu.models import build_model

    cfg = apply_overrides(load_config(args.config_file), args.options)
    model, _, _ = build_model(cfg)

    H, W = args.hw
    images = jax.random.uniform(jax.random.PRNGKey(0),
                                (args.batch, H, W, 3), jnp.float32)
    pad_mask = jnp.zeros((args.batch, H, W), bool)
    params = model.init(jax.random.PRNGKey(1), images[:1], pad_mask[:1],
                        train=False)
    n_params = sum(x.size for x in jax.tree.leaves(params))

    @jax.jit
    def fwd(params, images, pad_mask):
        out = model.apply(params, images, pad_mask, train=False)
        return out["pred_logits"], out["pred_boxes"]

    lowered = fwd.lower(params, images, pad_mask)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    flops = cost.get("flops", float("nan"))

    r = compiled(params, images, pad_mask)
    jax.block_until_ready(r)
    for _ in range(args.warmup):
        r = compiled(params, images, pad_mask)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        r = compiled(params, images, pad_mask)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / args.iters

    result = {
        "nparam_M": round(n_params / 1e6, 2),
        "gflops_per_image": round(flops / 1e9 / args.batch, 2)
        if flops == flops else None,
        "latency_ms": round(dt * 1e3, 2),
        "fps": round(args.batch / dt, 2),
        "batch": args.batch,
        "hw": [H, W],
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
