"""Model benchmark: params / GFLOPs / latency / FPS.

Capability match for the reference tools/benchmark.py (:587-671): parameter
count, FLOPs (XLA compiled-cost analysis instead of torch jit-trace op
handlers), and timed inference. Writes a log line compatible with the
reference's flops/log.txt output, plus derived TFLOP/s and MFU vs the
chip's bf16 peak.

Timing uses the two-point chained-fori_loop method (utils/profiling.py):
this environment's TPU relay returns from block_until_ready before device
execution finishes, so plain wall-clock loops over-report (CLAUDE.md).

Usage:
  python tools/benchmark.py -c configs/DA/Cityscapes2FoggyCityscapes/\
DINO_4scale_C2F.py [--batch 1] [--iters 20] [--hw 800 1344]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", "-c", required=True)
    ap.add_argument("--options", nargs="+", default=[])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--n1", type=int, default=2,
                    help="short trip count of the two-point measurement")
    ap.add_argument("--n2", type=int, default=10,
                    help="long trip count of the two-point measurement")
    ap.add_argument("--hw", type=int, nargs=2, default=[800, 1344])
    ap.add_argument("--peak_tflops", type=float, default=197.0,
                    help="bf16 peak of the chip for MFU (v5e: 197; the "
                         "bench harness itself measures 186 achievable "
                         "on an 8192^3 matmul, bench.py docstring)")
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

    from datr_tpu.utils.profiling import measure_throughput

    def step(params, images, pad_mask, eps):
        return model.apply(params, images + eps, pad_mask, train=False)

    dt = measure_throughput(
        step, (params, images, pad_mask, jnp.float32(0.0)),
        batch=args.batch, n1=args.n1, n2=args.n2)

    gflops_img = flops / 1e9 / args.batch if flops == flops else None
    fps = args.batch / dt
    result = {
        "nparam_M": round(n_params / 1e6, 2),
        "gflops_per_image": round(gflops_img, 2) if gflops_img else None,
        "latency_ms": round(dt * 1e3, 2),
        "fps": round(fps, 2),
        "tflops_per_s": round(gflops_img * fps / 1e3, 2)
        if gflops_img else None,
        "mfu_pct": round(100.0 * gflops_img * fps / 1e3
                         / args.peak_tflops, 2) if gflops_img else None,
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
