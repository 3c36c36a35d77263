"""MSDA op-level bench at encoder scale: current op vs variants.

Establishes where the current quad op sits vs the measured gather floor
(~0.44 Grows/s; rows/layer = B*S*H*L*P) and which reduction strategy is
cheapest. Run on the real TPU: python tools/msda_bench.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from datr_tpu.ops.msda import ms_deform_attn_quad, ms_deform_attn_xla

SHAPES_4SCALE = ((100, 168), (50, 84), (25, 42), (13, 21))


def measure(fn, args, n1=2, n2=6):
    def make(n):
        @jax.jit
        def run(*a):
            def body(i, c):
                out = fn(*a, c)
                return jnp.sum(out.astype(jnp.float32)[::499, ::37]) * 1e-20 + c

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    times = {}
    for n in (n1, n2):
        f = make(n)
        _ = float(np.asarray(f(*args)))
        t0 = time.perf_counter()
        _ = float(np.asarray(f(*args)))
        times[n] = time.perf_counter() - t0
    return (times[n2] - times[n1]) / (n2 - n1)


def main():
    B, H, D, L, P = 2, 8, 32, 4, 4
    S = sum(h * w for h, w in SHAPES_4SCALE)
    Lq = S
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    loc = jnp.asarray(rng.random((B, Lq, H, L, P, 2)), jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, Lq, H, L, P)), jnp.float32)
        .reshape(B, Lq, H, L * P), -1
    ).reshape(B, Lq, H, L, P)

    rows = B * H * Lq * L * P
    print(f"S={S} rows/layer={rows/1e6:.2f}M floor@0.435G/s="
          f"{rows/0.435e9*1e3:.1f}ms", flush=True)

    def cur(value, loc, attn, c):
        return ms_deform_attn_quad(value, SHAPES_4SCALE, loc + c * 1e-12,
                                   attn)

    dt = measure(cur, (value, loc, attn))
    print(f"quad current:        {dt*1e3:8.2f} ms", flush=True)

    # pure gather at identical shapes: the floor including table build
    T = S + sum(w + 1 for _, w in SHAPES_4SCALE)

    def pure_gather(table, idx, cw, c):
        def one(args):
            t, ix, w_ = args
            g = jnp.take(t, ix, axis=0)
            return (g * w_).reshape(Lq, L * P, 128).sum(axis=1)

        return jax.lax.map(one, (table, idx + (c * 1e-12).astype(jnp.int32),
                                 cw))

    table = jnp.asarray(rng.standard_normal((B * H, T, 128)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, T, (B * H, Lq * L * P)), jnp.int32)
    cw128 = jnp.asarray(rng.standard_normal((B * H, Lq * L * P, 128)),
                        jnp.bfloat16)
    dt = measure(pure_gather, (table, idx, cw128))
    print(f"gather+mul+reduce (prebuilt w128): {dt*1e3:8.2f} ms", flush=True)

    # variant: weights as [N, 4] expanded in-fusion via broadcast-reshape
    cw4 = jnp.asarray(rng.standard_normal((B * H, Lq * L * P, 4)),
                      jnp.bfloat16)

    def gather_bcast(table, idx, cw, c):
        def one(args):
            t, ix, w_ = args
            g = jnp.take(t, ix, axis=0)  # [N, 128]
            w_lane = jnp.repeat(w_, D, axis=-1)  # [N, 128] in-fusion
            return (g * w_lane).reshape(Lq, L * P, 128).sum(axis=1)

        return jax.lax.map(one, (table, idx + (c * 1e-12).astype(jnp.int32),
                                 cw))

    dt = measure(gather_bcast, (table, idx, cw4))
    print(f"gather+bcast4+reduce:              {dt*1e3:8.2f} ms", flush=True)

    # gather only (no weighting) to isolate the reduce cost
    def gather_only(table, idx, c):
        def one(args):
            t, ix = args
            g = jnp.take(t, ix, axis=0)
            return g.reshape(Lq, L * P, 128).sum(axis=1)

        return jax.lax.map(one, (table, idx + (c * 1e-12).astype(jnp.int32)))

    dt = measure(gather_only, (table, idx))
    print(f"gather+reduce only:                {dt*1e3:8.2f} ms", flush=True)

    # batch-4 scaling of the current op
    value4 = jnp.concatenate([value, value])
    loc4 = jnp.concatenate([loc, loc])
    attn4 = jnp.concatenate([attn, attn])
    dt = measure(cur, (value4, loc4, attn4))
    print(f"quad current batch4: {dt*1e3:8.2f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()


def extra():
    B, H, D, L, P = 2, 8, 32, 4, 4
    S = sum(h * w for h, w in SHAPES_4SCALE)
    Lq = S
    rng = np.random.default_rng(0)
    T = S + sum(w + 1 for _, w in SHAPES_4SCALE)
    table = jnp.asarray(rng.standard_normal((B * H, T, 128)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, T, (B * H, Lq * L * P)), jnp.int32)
    cw4 = jnp.asarray(rng.standard_normal((B * H, Lq * L * P, 4)),
                      jnp.bfloat16)
    fold = jnp.asarray(np.tile(np.eye(D), (4, 1)), jnp.float32)

    # lane-iota corner select: w_lane built INSIDE the multiply+reduce
    # fusion — no MXU dot, no relayout, single pass over g
    def gather_lanesel(table, idx, cw, c):
        cid = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // D

        def one(args):
            t, ix, w_ = args
            g = jnp.take(t, ix, axis=0)  # [N, 128]
            w_lane = jnp.where(
                cid == 0, w_[:, 0:1],
                jnp.where(cid == 1, w_[:, 1:2],
                          jnp.where(cid == 2, w_[:, 2:3], w_[:, 3:4])))
            r = (g * w_lane).reshape(Lq, L * P, 128).sum(axis=1)
            return jnp.dot(r, fold, preferred_element_type=jnp.float32)

        return jax.lax.map(one, (table, idx + (c * 1e-12).astype(jnp.int32),
                                 cw))

    dt = measure(gather_lanesel, (table, idx, cw4))
    print(f"gather+lanesel+reduce+fold:        {dt*1e3:8.2f} ms", flush=True)

    # same but f32 accumulate in the reduce
    def gather_lanesel_f32(table, idx, cw, c):
        cid = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // D

        def one(args):
            t, ix, w_ = args
            g = jnp.take(t, ix, axis=0)
            w_lane = jnp.where(
                cid == 0, w_[:, 0:1],
                jnp.where(cid == 1, w_[:, 1:2],
                          jnp.where(cid == 2, w_[:, 2:3], w_[:, 3:4])))
            r = (g.astype(jnp.float32) * w_lane.astype(jnp.float32)).reshape(
                Lq, L * P, 128).sum(axis=1)
            return jnp.dot(r, fold, preferred_element_type=jnp.float32)

        return jax.lax.map(one, (table, idx + (c * 1e-12).astype(jnp.int32),
                                 cw))

    dt = measure(gather_lanesel_f32, (table, idx, cw4))
    print(f"gather+lanesel f32 reduce:         {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    extra()
