"""Benchmark: DINO-R50 4-scale inference throughput at 1333x800 on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the
driver. Baseline north-star (BASELINE.md): >= 250 images/sec/chip.

Equivalent of the reference's tools/benchmark.py measure_time (:587-595,
warmup + mean) — with the whole model under one jit in bfloat16.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    # canvas 800x1344 (multiples of 128 >= 800x1333 eval size)
    H, W = 800, 1344

    from datr_tpu.models.dino import DINO

    model = DINO(
        num_classes=9, num_queries=900, hidden_dim=256, nheads=8,
        enc_layers=6, dec_layers=6, dim_feedforward=2048,
        dn_number=100, dn_single_pad=20, dn_labelbook_size=9,
        use_remat=False, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (batch, H, W, 3), jnp.float32)
    pad_mask = jnp.zeros((batch, H, W), bool)

    params = model.init(rng, images[:1], pad_mask[:1], train=False)

    from datr_tpu.models.postprocess import postprocess

    @jax.jit
    def infer(params, images, pad_mask):
        out = model.apply(params, images, pad_mask, train=False)
        sizes = jnp.tile(jnp.array([[1024.0, 2048.0]]), (images.shape[0], 1))
        return postprocess(out["pred_logits"], out["pred_boxes"], sizes,
                           num_select=300)

    # warmup / compile
    r = infer(params, images, pad_mask)
    jax.block_until_ready(r)

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = infer(params, images, pad_mask)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    print(json.dumps({
        "metric": "images/sec/chip DINO-R50 4-scale inference 800x1344 bf16",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / 250.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
