"""Gather rate vs table size + reduction formulation variants.

Run: python tools/msda_bench3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SHAPES_4SCALE = ((100, 168), (50, 84), (25, 42), (13, 21))


def measure(fn, args, n1=4, n2=20):
    def make(n):
        @jax.jit
        def run(*a):
            def body(i, c):
                out = fn(*a, c)
                out = jnp.atleast_1d(jnp.asarray(out))
                return jnp.sum(out.astype(jnp.float32).ravel()[::499]) * 1e-20 + c

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
    rng = np.random.default_rng(0)
    N = 357_168

    # --- gather rate vs table size (128-lane bf16 rows) ---
    for T in (300, 1200, 4500, 17000, 23040, 46080):
        table = jnp.asarray(rng.standard_normal((T, 128)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, T, (N,)), jnp.int32)

        def fn(t, ix, c):
            g = jnp.take(t, ix + (c * 1e-12).astype(jnp.int32), axis=0)
            return g.reshape(-1, 16, 128).sum(axis=1)

        dt = measure(fn, (table, idx))
        print(f"T={T:6d}: {dt*1e3:7.2f} ms  {N/dt/1e9:6.3f} Grows/s",
              flush=True)

    # --- per-level split: 4 gathers of N/4 rows each from per-level tables
    level_rows = [h * w + w + 1 for h, w in SHAPES_4SCALE]
    BH = 16
    Nl = N // 4

    def per_level(tables, idxs, c):
        outs = []
        for t, ix in zip(tables, idxs):
            def one(args):
                tt, ii = args
                g = jnp.take(tt, ii, axis=0)
                return g.reshape(-1, 4, 128).sum(axis=1)

            outs.append(jax.lax.map(
                one, (t, ix + (c * 1e-12).astype(jnp.int32))
            ))
        return sum(o.sum() for o in outs)

    tables = tuple(
        jnp.asarray(rng.standard_normal((BH, tr, 128)), jnp.bfloat16)
        for tr in level_rows
    )
    idxs = tuple(
        jnp.asarray(rng.integers(0, tr, (BH, Nl)), jnp.int32)
        for tr in level_rows
    )
    dt = measure(per_level, (tables, idxs))
    print(f"per-level 4x split (16 bh):   {dt*1e3:7.2f} ms "
          f"(vs one-table baseline ~13-16)", flush=True)

    # --- reduction formulations on prebuilt gathered data ---
    Lq = 22323
    g = jnp.asarray(rng.standard_normal((Lq * 16, 128)), jnp.bfloat16)
    cw = jnp.asarray(rng.standard_normal((Lq * 16, 4)), jnp.bfloat16)
    expand = jnp.asarray(np.kron(np.eye(4), np.ones((1, 32))), jnp.bfloat16)
    fold = jnp.asarray(np.tile(np.eye(32), (4, 1)), jnp.float32)

    def red_dot(g, cw, c):
        w_lane = jnp.dot(cw + (c * 1e-12).astype(cw.dtype), expand,
                         preferred_element_type=jnp.bfloat16)
        r = (g * w_lane).reshape(Lq, 16, 128).sum(axis=1)
        return jnp.dot(r, fold, preferred_element_type=jnp.float32)

    dt = measure(red_dot, (g, cw))
    print(f"reduce: dot-expand (1 bh):    {dt*1e3:7.2f} ms", flush=True)

    def red_einsum(g, cw, c):
        gg = g.reshape(Lq, 16, 4, 32)
        return jnp.einsum(
            "qscd,qsc->qd", gg, (cw + (c * 1e-12).astype(cw.dtype))
            .reshape(Lq, 16, 4),
            preferred_element_type=jnp.float32,
        )

    dt = measure(red_einsum, (g, cw))
    print(f"reduce: einsum qscd (1 bh):   {dt*1e3:7.2f} ms", flush=True)

    def red_f32(g, cw, c):
        w_lane = jnp.dot(cw + (c * 1e-12).astype(cw.dtype), expand,
                         preferred_element_type=jnp.float32)
        r = (g.astype(jnp.float32) * w_lane).reshape(Lq, 16, 128).sum(axis=1)
        return jnp.dot(r, fold, preferred_element_type=jnp.float32)

    dt = measure(red_f32, (g, cw))
    print(f"reduce: f32 dot-expand:       {dt*1e3:7.2f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
