"""Dump the optimized HLO of the flagship inference forward and rank
copy/transpose/convert ops by byte size (XLA_FLAGS dump dirs don't work here
— compiles happen on the remote axon service — but compiled.as_text() does,
CLAUDE.md). Guides layout work: big copies are transposes the model code can
fold into adjacent dots."""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f16": 2, "s64": 8}


def shape_bytes(shape_str):
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def main():
    from datr_tpu.config import load_config
    from datr_tpu.models.registry import build_model

    cfg = load_config("configs/DA/Cityscapes2FoggyCityscapes/"
                      "DINO_4scale_C2F.py")
    cfg["amp_dtype"] = "bfloat16"
    model, _, _ = build_model(cfg)
    B, H, W = 2, 800, 1344
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((B, H, W, 3), jnp.float32)
    pad_mask = jnp.zeros((B, H, W), bool)
    params = jax.eval_shape(
        lambda: model.init(rng, images[:1], pad_mask[:1], train=False))

    def fwd(p, x, m):
        return model.apply(p, x, m, train=False)

    lowered = jax.jit(fwd).lower(params, images, pad_mask)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out_path = "/tmp/fwd_hlo.txt"
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"HLO written to {out_path} ({len(txt)/1e6:.1f} MB)")

    # rank copies / transposes / converts by output bytes
    ops = []
    for line in txt.splitlines():
        m = re.match(r"\s*%?([\w.-]+) = (\S+) (copy|transpose|convert|"
                     r"concatenate|pad|reshape|bitcast-convert)\(", line)
        if m:
            name, shape, kind = m.groups()
            ops.append((shape_bytes(shape), kind, shape, name))
    ops.sort(reverse=True)
    agg = defaultdict(lambda: [0, 0])
    for b, kind, shape, _ in ops:
        agg[(kind, shape)][0] += b
        agg[(kind, shape)][1] += 1
    print("=== top copy-ish ops by total bytes (kind, shape, count) ===")
    for (kind, shape), (b, c) in sorted(agg.items(),
                                        key=lambda kv: -kv[1][0])[:40]:
        print(f"{b/1e6:10.1f} MB  x{c:3d}  {kind:12s} {shape[:90]}")


if __name__ == "__main__":
    main()
