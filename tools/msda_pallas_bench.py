"""Mosaic row-gather rate microbench — can a hand kernel beat XLA's gather?

XLA's TPU gather is issue-bound at ~0.25-0.42 Grows/s for 128-lane rows
(tools/msda_bench3.py). The fused-MSDA kernel question is whether a Mosaic
scalar loop of dynamic row loads from a VMEM-resident table sustains a
better rate, with the bilinear weight FMA fused in (saving the separate
weight/reduce HBM passes entirely).

Variants:
  A. copy-only:  out[i] = table[idx[i]]            (pure row-load rate)
  B. fused-fma:  acc[q] = sum_k w[k] * table[idx]  (the real MSDA inner op)

Indices arrive via scalar prefetch (SMEM). Run on the real TPU:
  python tools/msda_pallas_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
import jax.experimental.pallas.tpu as pltpu


def measure(fn, args, n1=4, n2=20):
    def make(n):
        @jax.jit
        def run(*a):
            def body(i, c):
                out = fn(*a, c)
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


T = 22528  # quad-table rows (≈ encoder 4-scale), 128 lanes bf16 = 5.5 MB
NBLK = 2048  # samples per grid step
NGRID = 16  # grid steps; total rows = NBLK * NGRID


def copy_kernel(idx_ref, table_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = table_ref[idx_ref[i], :]
        return 0

    jax.lax.fori_loop(0, NBLK, body, 0)


def run_copy(table, idx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NGRID,),
        in_specs=[pl.BlockSpec((T, 128), lambda g, idx: (0, 0))],
        out_specs=pl.BlockSpec((NBLK, 128), lambda g, idx: (g, 0)),
    )
    return pl.pallas_call(
        copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NBLK * NGRID, 128), table.dtype),
    )(idx, table)


def fma_kernel(idx_ref, table_ref, w_ref, out_ref, acc_ref):
    # one output row per K=16 samples (the MSDA L*P fan-in)
    K = 16

    def body(q, _):
        acc = jnp.zeros((1, 128), jnp.float32)
        for k in range(K):
            s = q * K + k
            row = table_ref[idx_ref[s], :]
            acc = acc + row.astype(jnp.float32)[None, :] * w_ref[s, 0]
        acc_ref[q, :] = acc[0]
        return 0

    jax.lax.fori_loop(0, NBLK // K, body, 0)
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def run_fma(table, idx, w):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NGRID,),
        in_specs=[
            pl.BlockSpec((T, 128), lambda g, idx: (0, 0)),
            pl.BlockSpec((NBLK, 1), lambda g, idx: (g, 0)),
        ],
        out_specs=pl.BlockSpec((NBLK // 16, 128), lambda g, idx: (g, 0)),
        scratch_shapes=[pltpu.VMEM((NBLK // 16, 128), jnp.float32)],
    )
    return pl.pallas_call(
        fma_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (NBLK * NGRID // 16, 128), table.dtype
        ),
    )(idx, table, w)


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((T, 128)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, T, (NBLK * NGRID,)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((NBLK * NGRID, 1)), jnp.float32)
    n_rows = NBLK * NGRID

    def f_copy(t, ix, c):
        return run_copy(t, ix + (c * 1e-12).astype(jnp.int32))

    dt = measure(f_copy, (table, idx))
    print(f"pallas copy : {dt*1e3:7.3f} ms  {n_rows/dt/1e9:6.3f} Grows/s",
          flush=True)

    def f_fma(t, ix, w_, c):
        return run_fma(t, ix + (c * 1e-12).astype(jnp.int32), w_)

    dt = measure(f_fma, (table, idx, w))
    print(f"pallas fma  : {dt*1e3:7.3f} ms  {n_rows/dt/1e9:6.3f} Grows/s",
          flush=True)

    # XLA take baseline on identical shapes
    def f_take(t, ix, c):
        return jnp.take(t, ix + (c * 1e-12).astype(jnp.int32), axis=0)

    dt = measure(f_take, (table, idx))
    print(f"xla take    : {dt*1e3:7.3f} ms  {n_rows/dt/1e9:6.3f} Grows/s",
          flush=True)


if __name__ == "__main__":
    main()
