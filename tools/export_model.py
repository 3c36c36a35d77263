"""AOT-export the eval forward (backbone -> ... -> postprocess inputs) as a
serialized StableHLO artifact for serving.

The reference has no serving story beyond torch checkpoints; on TPU the
natural deployment unit is a `jax.export` artifact: traced once at a fixed
canvas, serialized with its VJP-free eval graph, loadable in any
same-or-newer JAX runtime without the model code.

Usage:
  python tools/export_model.py -c configs/DA/.../DINO_4scale_C2F.py \
      --ckpt runs/c2f/checkpoint_best_regular --out model.stablehlo \
      [--batch 1 --canvas 800 1344]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import export as jexport


def build_exported(cfg, params, batch: int, canvas):
    from datr_tpu.models.registry import build_model

    model, _, _ = build_model(cfg)
    Hc, Wc = canvas

    def fwd(p, images, pad_mask):
        out = model.apply(p, images, pad_mask, train=False)
        return out["pred_logits"], out["pred_boxes"]

    args = (
        params,
        jax.ShapeDtypeStruct((batch, Hc, Wc, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, Hc, Wc), jnp.bool_),
    )
    return jexport.export(jax.jit(fwd))(
        jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            params,
        ),
        args[1],
        args[2],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", "-c", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--canvas", type=int, nargs=2, default=[800, 1344])
    args = ap.parse_args()

    from datr_tpu.config import load_config

    import orbax.checkpoint as ocp

    cfg = load_config(args.config_file)
    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.ckpt))
    params = restored.get("params", restored) if isinstance(restored, dict) \
        else restored

    exported = build_exported(cfg, params, args.batch, tuple(args.canvas))
    with open(args.out, "wb") as f:
        f.write(exported.serialize())
    print(f"exported {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
