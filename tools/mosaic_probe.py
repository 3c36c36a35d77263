"""Standing toolchain watch: can Mosaic lower the gathers MSDA needs yet?

The single-chip exact-MSDA ceiling (~13 img/s, ROADMAP.md "ceiling
analysis") is set by XLA's gather issue rate; the unlock is a Pallas kernel
with a VECTORIZED in-kernel gather (the TPU analogue of the reference's
im2col inner loop, ms_deform_im2col_cuda.cuh:238-300). On the round-2/3
toolchain, three independent blockers were measured:

  1. vectorized gather (jnp.take_along_axis on a VMEM ref) — 500s the
     remote Mosaic compile service
  2. dynamic single-sublane vector load (table[i, :] with traced i) — the
     scalar-loop form below lowers (it is the existing msda_pallas.py
     prototype) but its issue rate never beat XLA's gather; inside the
     FUSED kernel layouts Mosaic demanded indices statically provable
     mod-8. A regression here would kill the prototype too.
  3. strided fori_loop unroll — only unroll=1 or full supported

Run on every toolchain change (python tools/mosaic_probe.py); it prints one
JSON line per blocker plus a verdict, and appends to tools/mosaic_probe.log
(tracked in git) so the history of probes is auditable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, D, N = 1024, 128, 256  # table rows, lanes, gather count


def _attempt(name, build):
    t0 = time.time()
    try:
        out = build()
        np.asarray(out)  # force the remote compile + execution
        r = {"probe": name, "ok": True}
    except Exception as e:  # noqa: BLE001 — any lowering/compile failure
        msg = str(e).replace("\n", " ")[:220] or type(e).__name__
        r = {"probe": name, "ok": False, "error": msg}
    r["seconds"] = round(time.time() - t0, 1)
    print(json.dumps(r), flush=True)
    return r


def probe_vectorized_gather():
    def kernel(idx_ref, table_ref, out_ref):
        idx2d = jnp.broadcast_to(idx_ref[...][:, None], (N, D))
        out_ref[...] = jnp.take_along_axis(table_ref[...], idx2d, axis=0)

    def build():
        table = jnp.arange(T * D, dtype=jnp.float32).reshape(T, D)
        idx = jnp.arange(N, dtype=jnp.int32) % T
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        )(idx, table)

    return _attempt("vectorized_in_kernel_gather", build)


def probe_dynamic_sublane_load():
    def kernel(idx_ref, table_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = table_ref[idx_ref[i] + 1, :]  # not provably mod-8
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    def build():
        table = jnp.arange(T * D, dtype=jnp.float32).reshape(T, D)
        idx = jnp.arange(N, dtype=jnp.int32) % (T - 1)
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((T, D), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((N, D), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        )(idx, table)

    return _attempt("dynamic_sublane_vector_load", build)


def probe_partial_unroll():
    def kernel(idx_ref, table_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = table_ref[idx_ref[i], :]
            return 0

        jax.lax.fori_loop(0, N, body, 0, unroll=4)

    def build():
        table = jnp.arange(T * D, dtype=jnp.float32).reshape(T, D)
        idx = (jnp.arange(N, dtype=jnp.int32) * 8) % T  # mod-8 provable
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((T, D), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((N, D), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        )(idx, table)

    return _attempt("fori_loop_partial_unroll", build)


def main():
    import jaxlib

    header = {
        "date": time.strftime("%Y-%m-%d"),
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(header), flush=True)
    vec = probe_vectorized_gather()
    scalar = probe_dynamic_sublane_load()
    unroll = probe_partial_unroll()
    results = [vec, scalar, unroll]
    # the scalar per-row load has always lowered (the existing
    # ops/msda_pallas.py prototype); only the other two are real unlocks
    unlocked = [r["probe"] for r in (vec, unroll) if r["ok"]]
    verdict = {
        "verdict": "UNLOCK CANDIDATE — rebench ops/msda_pallas.py"
        if unlocked else
        "still blocked — exact-MSDA stays on the XLA gather path",
        "unlocked": unlocked,
        "scalar_loop_regressed": not scalar["ok"],
    }
    print(json.dumps(verdict), flush=True)
    # appended next to the tool (NOT the gitignored flops/ scratch dir) so
    # the probe history is checked-in evidence, not a cited-but-absent file
    log = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mosaic_probe.log")
    with open(log, "a") as f:
        f.write(json.dumps({**header, "results": results, **verdict}) + "\n")


if __name__ == "__main__":
    main()
