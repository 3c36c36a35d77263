"""Training-step throughput: burn-in DA step s/step on the real chip.

Same two-point chained-iteration methodology as bench.py (the relay makes
naive wall-clock lie). Run: python tools/train_bench.py [--self-training]
Prints one JSON line {"metric", "value", "unit"}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--self-training", action="store_true")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--points", type=int, default=0,
                    help="override enc/dec_n_points (the opt-in fast "
                         "variant, configs/DINO/DINO_4scale_fast.py)")
    args = ap.parse_args()

    from datr_tpu.config import load_config
    from datr_tpu.models.registry import build_model
    from datr_tpu.train.optim import make_optimizer
    from datr_tpu.train.state import create_train_state
    from datr_tpu.train.steps import (
        train_step_burnin,
        train_step_self_training,
    )

    cfg = load_config("configs/DA/Cityscapes2FoggyCityscapes/"
                      "DINO_4scale_C2F.py")
    cfg["amp_dtype"] = "bfloat16"
    if args.no_remat:
        cfg["use_remat"] = False
    if args.points:
        cfg["enc_n_points"] = cfg["dec_n_points"] = args.points
    model, ccfg, wd = build_model(cfg)
    B, Hc, Wc = args.batch, 800, 1344
    half = B // 2
    max_boxes = 32
    K, C = cfg.num_classes, cfg.hidden_dim
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (B, Hc, Wc, 3), jnp.float32)
    pad_mask = jnp.zeros((B, Hc, Wc), bool)
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
    batch = dict(images=images, pad_mask=pad_mask, **targets)
    if args.self_training:
        # self-training batches carry strong-aug images + real sizes
        batch["images_strong"] = images
        # one row per TARGET-half image (loader contract)
        batch["real_sizes"] = jnp.tile(
            jnp.asarray([[float(Hc), float(Wc)]], jnp.float32), (B // 2, 1)
        )

    if args.self_training:
        thr = jnp.full((K,), 0.3)

        def one_step(s):
            s, m = train_step_self_training(
                s, batch, model, tx, ccfg, wd, thr, canvas_hw=(Hc, Wc))
            return s, m
    else:
        def one_step(s):
            return train_step_burnin(state=s, batch=batch, model=model,
                                     tx=tx, ccfg=ccfg, weight_dict=wd)

    # chained N-step loop: state threads through, so steps serialize
    def run_n(n):
        s = jax.tree.map(jnp.copy, state)
        t_loss = jnp.float32(0.0)
        for _ in range(n):
            s, m = one_step(s)
            t_loss = t_loss + m["loss"]
        return float(np.asarray(t_loss))

    _ = run_n(1)  # compile + tunnel warmup
    times = {}
    for n in (1, 5):
        _ = run_n(n)
        t0 = time.perf_counter()
        _ = run_n(n)
        times[n] = time.perf_counter() - t0
    s_per_step = (times[5] - times[1]) / 4
    name = "self_training_s_per_step" if args.self_training \
        else "burnin_s_per_step"
    print(json.dumps({
        "metric": name, "value": round(s_per_step, 4), "unit": "s/step",
        "batch": B, "remat": not args.no_remat,
    }))


if __name__ == "__main__":
    main()
