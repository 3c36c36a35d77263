"""Microbenchmark: XLA TPU gather row-rate vs (dtype, row width, table size).

Round-1 established the MSDA encoder cost is issue-rate-bound on the gather
unit (~0.4e9 rows/s at bf16 128-lane rows). This probes whether wider rows
gather at the same ROW rate — if so, packing 2/4 consecutive quad-rows per
gathered row divides the row count (and MSDA time) by 2/4 at the cost of
on-chip selection. Also probes narrower dtypes and sortedness.

Run on the real TPU:  python tools/gather_bench.py
"""

import time
import functools

import jax
import jax.numpy as jnp
import numpy as np


def measure(fn, args, n1=2, n2=8):
    def make(n):
        @jax.jit
        def run(*a):
            def body(i, c):
                out = fn(*a, c)
                return jnp.sum(out.astype(jnp.float32)[::997, :1]) * 1e-20 + c

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
    N = 357_168  # Lq*L*P at encoder scale (one (b,h))
    rng = np.random.default_rng(0)

    print(f"devices: {jax.devices()}", flush=True)
    results = []

    def bench_take(T, lanes, dtype, sorted_idx=False, note=""):
        table = jnp.asarray(
            rng.standard_normal((T, lanes)), dtype=dtype
        )
        idx_np = rng.integers(0, T, size=(N,)).astype(np.int32)
        if sorted_idx:
            idx_np = np.sort(idx_np)
        idx = jnp.asarray(idx_np)

        def fn(table, idx, c):
            return jnp.take(table, idx + (c * 1e-12).astype(jnp.int32), axis=0)

        dt = measure(fn, (table, idx))
        rate = N / dt / 1e9
        gbs = N * lanes * np.dtype(dtype).itemsize / dt / 1e9
        tag = f"take T={T} lanes={lanes} {np.dtype(dtype).name}" + (
            " sorted" if sorted_idx else "") + (f" {note}" if note else "")
        print(f"{tag:55s} {dt*1e3:8.2f} ms  {rate:6.3f} Grows/s  "
              f"{gbs:7.1f} GB/s", flush=True)
        results.append((tag, dt, rate))

    T = 23_040  # quad-table rows for the 4-level 800x1344 pyramid
    # --- row width sweep, bf16 ---
    for lanes in (128, 256, 512, 1024):
        bench_take(T, lanes, jnp.bfloat16)
    # --- f32 ---
    for lanes in (128, 256):
        bench_take(T, lanes, jnp.float32)
    # --- int8 ---
    for lanes in (128, 256, 512):
        bench_take(T, lanes, jnp.int8)
    # --- fp8 ---
    try:
        bench_take(T, 256, jnp.float8_e4m3fn)
        bench_take(T, 512, jnp.float8_e4m3fn)
    except Exception as e:
        print("fp8 failed:", e, flush=True)
    # --- sortedness ---
    bench_take(T, 128, jnp.bfloat16, sorted_idx=True)
    # --- table-size sensitivity (wider rows => bigger table) ---
    bench_take(T // 2, 256, jnp.bfloat16, note="halftable")
    bench_take(T // 4, 512, jnp.bfloat16, note="quartertable")
    # --- big table falloff check ---
    bench_take(8 * T, 128, jnp.bfloat16, note="8x-table")

    print("done", flush=True)


if __name__ == "__main__":
    main()
