"""MSDA reduction-strategy bench: chunked gather+reduce variants.

The gather's output ([357k, 128] bf16 = 91 MB per (b,h)) is HBM-resident, so
the weight-multiply and segment-reduce each cost a full HBM pass (~8.5 ms of
the 22.8 ms/layer). If the work is chunked so each gather output is a few MB,
XLA may keep the intermediates in VMEM and the passes become ~free.

Run: python tools/msda_bench2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SHAPES_4SCALE = ((100, 168), (50, 84), (25, 42), (13, 21))


def measure(fn, args, n1=2, n2=6):
    def make(n):
        @jax.jit
        def run(*a):
            def body(i, c):
                out = fn(*a, c)
                return jnp.sum(out.astype(jnp.float32)[::499, ::7]) * 1e-20 + c

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
    LP = L * P
    T = S + sum(w + 1 for _, w in SHAPES_4SCALE)
    BH = B * H
    N = Lq * LP  # rows per (b,h) = 357168
    rng = np.random.default_rng(0)

    table = jnp.asarray(rng.standard_normal((BH, T, 128)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, T, (BH, N)), jnp.int32)
    cw = jnp.asarray(rng.standard_normal((BH, N, 4)), jnp.bfloat16)
    expand = jnp.asarray(np.kron(np.eye(4), np.ones((1, D))), jnp.bfloat16)
    fold = jnp.asarray(np.tile(np.eye(D), (4, 1)), jnp.float32)

    print(f"rows/(b,h)={N} total={BH*N/1e6:.2f}M floor={BH*N/0.435e9*1e3:.1f}"
          "ms", flush=True)

    # baseline: per-bh full gather + separate passes
    def base(table, idx, cw, c):
        def one(args):
            t, ix, w_ = args
            g = jnp.take(t, ix, axis=0)
            w_lane = jnp.dot(w_, expand, preferred_element_type=jnp.bfloat16)
            r = (g * w_lane).reshape(Lq, LP, 128).sum(axis=1)
            return jnp.dot(r, fold, preferred_element_type=jnp.float32)

        return jax.lax.map(one, (table, idx + (c * 1e-12).astype(jnp.int32),
                                 cw))

    dt = measure(base, (table, idx, cw))
    print(f"baseline per-bh:      {dt*1e3:8.2f} ms", flush=True)

    # chunked: per (b,h), lax.map over row-chunks
    for n_chunks in (4, 8, 16, 32):
        Q = Lq // n_chunks  # queries per chunk (Lq divisible? pad below)
        Qpad = -(-Lq // n_chunks)
        pad_rows = Qpad * n_chunks * LP - N

        def chunked(table, idx, cw, c, n_chunks=n_chunks, Qpad=Qpad,
                    pad_rows=pad_rows):
            idx_p = jnp.pad(idx, ((0, 0), (0, pad_rows)))
            cw_p = jnp.pad(cw, ((0, 0), (0, pad_rows), (0, 0)))
            idx_c = idx_p.reshape(BH, n_chunks, Qpad * LP)
            cw_c = cw_p.reshape(BH, n_chunks, Qpad * LP, 4)

            def one_bh(args):
                t, ixs, ws = args

                def one_chunk(args2):
                    ix, w_ = args2
                    g = jnp.take(t, ix, axis=0)  # [Qpad*LP, 128]
                    w_lane = jnp.dot(w_, expand,
                                     preferred_element_type=jnp.bfloat16)
                    r = (g * w_lane).reshape(Qpad, LP, 128).sum(axis=1)
                    return jnp.dot(r, fold,
                                   preferred_element_type=jnp.float32)

                return jax.lax.map(one_chunk, (ixs, ws))

            return jax.lax.map(
                one_bh,
                (table, idx_c + (c * 1e-12).astype(jnp.int32), cw_c),
            )

        dt = measure(chunked, (table, idx, cw))
        print(f"chunked x{n_chunks:3d} (rows/chunk {Qpad*LP}): "
              f"{dt*1e3:8.2f} ms", flush=True)

    # flattened chunk grid: one lax.map over BH*n_chunks steps, table
    # re-sliced per step (dynamic index into the bh axis)
    for n_chunks in (8, 16):
        Qpad = -(-Lq // n_chunks)
        pad_rows = Qpad * n_chunks * LP - N

        def flat_chunks(table, idx, cw, c, n_chunks=n_chunks, Qpad=Qpad,
                        pad_rows=pad_rows):
            idx_p = jnp.pad(idx, ((0, 0), (0, pad_rows)))
            cw_p = jnp.pad(cw, ((0, 0), (0, pad_rows), (0, 0)))
            idx_c = idx_p.reshape(BH * n_chunks, Qpad * LP)
            cw_c = cw_p.reshape(BH * n_chunks, Qpad * LP, 4)
            bh_of = jnp.repeat(jnp.arange(BH, dtype=jnp.int32), n_chunks)

            def one(args):
                bh, ix, w_ = args
                t = jax.lax.dynamic_index_in_dim(table, bh, 0,
                                                 keepdims=False)
                g = jnp.take(t, ix, axis=0)
                w_lane = jnp.dot(w_, expand,
                                 preferred_element_type=jnp.bfloat16)
                r = (g * w_lane).reshape(Qpad, LP, 128).sum(axis=1)
                return jnp.dot(r, fold, preferred_element_type=jnp.float32)

            return jax.lax.map(
                one, (bh_of, idx_c + (c * 1e-12).astype(jnp.int32), cw_c)
            )

        dt = measure(flat_chunks, (table, idx, cw))
        print(f"flat chunks x{n_chunks:3d}: {dt*1e3:8.2f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
