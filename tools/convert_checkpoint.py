"""Convert a reference DATR/DINO PyTorch checkpoint into a datr_tpu params
pytree (enables weight-level parity checks and serving published models).

Maps the reference module tree (models/dino/dino.py + deformable_transformer
+ torchvision resnet) onto our flax parameter layout. Conv kernels transpose
OIHW -> HWIO; Linear kernels transpose [out,in] -> [in,out].

Usage:
  python tools/convert_checkpoint.py --torch_ckpt checkpoint.pth \
      --config configs/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F.py \
      --out converted_params  [--key model|ema_model]
"""

from __future__ import annotations

import argparse
import re
import sys
from typing import Dict

import numpy as np


def _t_conv(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _t_lin(w):  # [out, in] -> [in, out]
    return np.transpose(w, (1, 0))


def fake_reference_state_dict(enc=1, dec=1, d=64, heads=4, K=3, ffn=128,
                       labelbook=3, nq=8):
    """Random-weight state dict in the reference's exact key layout
    (dino.py / deformable_transformer.py modules, 4 levels x 4 points,
    shared heads) — used by conversion tests and the repro kit's
    offline dry run (tools/repro_c2f.py)."""
    rng = np.random.default_rng(0)

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    sd = {}
    # torchvision resnet50 (stem + all blocks)
    pre = "backbone.0.body."
    sd[pre + "conv1.weight"] = t(64, 3, 7, 7)
    for s in ("weight", "bias", "running_mean", "running_var"):
        sd[pre + f"bn1.{s}"] = t(64)
    layers = {1: (3, 64, 256), 2: (4, 128, 512), 3: (6, 256, 1024),
              4: (3, 512, 2048)}
    in_ch = 64
    for li, (blocks, width, out_ch) in layers.items():
        for b in range(blocks):
            p = f"{pre}layer{li}.{b}"
            cin = in_ch if b == 0 else out_ch
            sd[p + ".conv1.weight"] = t(width, cin, 1, 1)
            sd[p + ".conv2.weight"] = t(width, width, 3, 3)
            sd[p + ".conv3.weight"] = t(out_ch, width, 1, 1)
            for ci, c in ((1, width), (2, width), (3, out_ch)):
                for s in ("weight", "bias", "running_mean", "running_var"):
                    sd[p + f".bn{ci}.{s}"] = t(c)
            if b == 0:
                sd[p + ".downsample.0.weight"] = t(out_ch, cin, 1, 1)
                for s in ("weight", "bias", "running_mean", "running_var"):
                    sd[p + f".downsample.1.{s}"] = t(out_ch)
        in_ch = out_ch

    for i, cin in enumerate((512, 1024, 2048, 2048)):
        sd[f"input_proj.{i}.0.weight"] = t(d, cin, 3 if i == 3 else 1,
                                           3 if i == 3 else 1)
        sd[f"input_proj.{i}.0.bias"] = t(d)
        sd[f"input_proj.{i}.1.weight"] = t(d)
        sd[f"input_proj.{i}.1.bias"] = t(d)

    sd["transformer.level_embed"] = t(4, d)
    sd["transformer.tgt_embed.weight"] = t(nq, d)
    sd["label_enc.weight"] = t(labelbook + 1, d)

    def msda(p):
        sd[p + ".sampling_offsets.weight"] = t(heads * 4 * 4 * 2, d)
        sd[p + ".sampling_offsets.bias"] = t(heads * 4 * 4 * 2)
        sd[p + ".attention_weights.weight"] = t(heads * 4 * 4, d)
        sd[p + ".attention_weights.bias"] = t(heads * 4 * 4)
        for m in ("value_proj", "output_proj"):
            sd[p + f".{m}.weight"] = t(d, d)
            sd[p + f".{m}.bias"] = t(d)

    def ln(p, dim=d):
        sd[p + ".weight"] = t(dim)
        sd[p + ".bias"] = t(dim)

    for l in range(enc):
        p = f"transformer.encoder.layers.{l}"
        msda(p + ".self_attn")
        ln(p + ".norm1")
        sd[p + ".linear1.weight"] = t(ffn, d)
        sd[p + ".linear1.bias"] = t(ffn)
        sd[p + ".linear2.weight"] = t(d, ffn)
        sd[p + ".linear2.bias"] = t(d)
        ln(p + ".norm2")
    for l in range(dec):
        p = f"transformer.decoder.layers.{l}"
        msda(p + ".cross_attn")
        ln(p + ".norm1")
        sd[p + ".self_attn.in_proj_weight"] = t(3 * d, d)
        sd[p + ".self_attn.in_proj_bias"] = t(3 * d)
        sd[p + ".self_attn.out_proj.weight"] = t(d, d)
        sd[p + ".self_attn.out_proj.bias"] = t(d)
        ln(p + ".norm2")
        sd[p + ".linear1.weight"] = t(ffn, d)
        sd[p + ".linear1.bias"] = t(ffn)
        sd[p + ".linear2.weight"] = t(d, ffn)
        sd[p + ".linear2.bias"] = t(d)
        ln(p + ".norm3")
    ln("transformer.decoder.norm")
    # running_var must be positive (FrozenBN takes sqrt)
    for k in list(sd):
        if k.endswith("running_var"):
            sd[k] = np.abs(sd[k]) + 0.5
    for i in range(2):
        sd[f"transformer.decoder.ref_point_head.layers.{i}.weight"] = (
            t(d, 2 * d if i == 0 else d)
        )
        sd[f"transformer.decoder.ref_point_head.layers.{i}.bias"] = t(d)
    sd["class_embed.0.weight"] = t(K, d)
    sd["class_embed.0.bias"] = t(K)
    for i in range(3):
        out = 4 if i == 2 else d
        sd[f"bbox_embed.0.layers.{i}.weight"] = t(out, d)
        sd[f"bbox_embed.0.layers.{i}.bias"] = t(out)
    sd["transformer.enc_output.weight"] = t(d, d)
    sd["transformer.enc_output.bias"] = t(d)
    ln("transformer.enc_output_norm")
    sd["transformer.enc_out_class_embed.weight"] = t(K, d)
    sd["transformer.enc_out_class_embed.bias"] = t(K)
    for i in range(3):
        out = 4 if i == 2 else d
        sd[f"transformer.enc_out_bbox_embed.layers.{i}.weight"] = t(out, d)
        sd[f"transformer.enc_out_bbox_embed.layers.{i}.bias"] = t(out)
    return sd


def _cfg_dims(config, options=()):
    """Read the converter's structural dims from a datr_tpu config."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from datr_tpu.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(config), list(options))
    return cfg


def build_reference_state_dict(config, options=()):
    """Reference-layout random state dict sized for `config` — the
    stand-in for a published .pth in offline dry runs."""
    cfg = _cfg_dims(config, options)
    return fake_reference_state_dict(
        enc=cfg.enc_layers, dec=cfg.dec_layers, d=cfg.hidden_dim,
        heads=cfg.nheads, K=cfg.num_classes, ffn=cfg.dim_feedforward,
        labelbook=cfg.dn_labelbook_size, nq=cfg.num_queries)


def convert_resnet(sd: Dict[str, np.ndarray], prefix="backbone.0.body."):
    """torchvision resnet -> our ResNet module tree."""
    out: Dict = {}

    def put(path, val):
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = val

    def bn(src, dst):
        put(dst + ("weight",), sd[src + ".weight"])
        put(dst + ("bias",), sd[src + ".bias"])
        put(dst + ("running_mean",), sd[src + ".running_mean"])
        put(dst + ("running_var",), sd[src + ".running_var"])

    put(("conv1", "kernel"), _t_conv(sd[prefix + "conv1.weight"]))
    bn(prefix + "bn1", ("bn1",))
    for layer in range(1, 5):
        b = 0
        while f"{prefix}layer{layer}.{b}.conv1.weight" in sd:
            src = f"{prefix}layer{layer}.{b}"
            dst = f"layer{layer}_block{b}"
            for ci in (1, 2, 3):
                put((dst, f"conv{ci}", "kernel"),
                    _t_conv(sd[f"{src}.conv{ci}.weight"]))
                bn(f"{src}.bn{ci}", (dst, f"bn{ci}"))
            if f"{src}.downsample.0.weight" in sd:
                put((dst, "downsample_conv", "kernel"),
                    _t_conv(sd[f"{src}.downsample.0.weight"]))
                bn(f"{src}.downsample.1", (dst, "downsample_bn"))
            b += 1
    return out


def convert_swin(sd: Dict[str, np.ndarray], prefix="backbone.0."):
    """Reference swin_transformer.py (SwinTransformer :435) -> our
    models/swin.py SwinTransformer tree. Covers patch embed, per-block
    norms/attn (qkv fused, relative-position-bias table)/mlp, patch-merging
    downsamples, and the out_indices norms (norm1..norm3 -> out_norm{i});
    the relative_position_index buffers are recomputed, not copied."""
    out: Dict = {
        "patch_embed": {"kernel": _t_conv(sd[prefix + "patch_embed.proj.weight"]),
                        "bias": sd[prefix + "patch_embed.proj.bias"]},
        "patch_norm": {"scale": sd[prefix + "patch_embed.norm.weight"],
                       "bias": sd[prefix + "patch_embed.norm.bias"]},
    }
    stage = 0
    while f"{prefix}layers.{stage}.blocks.0.norm1.weight" in sd:
        b = 0
        while f"{prefix}layers.{stage}.blocks.{b}.norm1.weight" in sd:
            src = f"{prefix}layers.{stage}.blocks.{b}"
            out[f"stage{stage}_block{b}"] = {
                "norm1": convert_ln(sd, f"{src}.norm1"),
                "norm2": convert_ln(sd, f"{src}.norm2"),
                "attn": {
                    "qkv": {"kernel": _t_lin(sd[f"{src}.attn.qkv.weight"]),
                            "bias": sd[f"{src}.attn.qkv.bias"]},
                    "proj": {"kernel": _t_lin(sd[f"{src}.attn.proj.weight"]),
                             "bias": sd[f"{src}.attn.proj.bias"]},
                    "relative_position_bias_table":
                        sd[f"{src}.attn.relative_position_bias_table"],
                },
                "mlp_fc1": {"kernel": _t_lin(sd[f"{src}.mlp.fc1.weight"]),
                            "bias": sd[f"{src}.mlp.fc1.bias"]},
                "mlp_fc2": {"kernel": _t_lin(sd[f"{src}.mlp.fc2.weight"]),
                            "bias": sd[f"{src}.mlp.fc2.bias"]},
            }
            b += 1
        if f"{prefix}layers.{stage}.downsample.reduction.weight" in sd:
            out[f"merge{stage}"] = {
                "norm": convert_ln(sd, f"{prefix}layers.{stage}.downsample.norm"),
                "reduction": {"kernel": _t_lin(
                    sd[f"{prefix}layers.{stage}.downsample.reduction.weight"])},
            }
        stage += 1
    for i in range(4):
        if f"{prefix}norm{i}.weight" in sd:
            out[f"out_norm{i}"] = convert_ln(sd, f"{prefix}norm{i}")
    return out


def convert_convnext(sd: Dict[str, np.ndarray], prefix="backbone.0.",
                     out_indices=(1, 2, 3)):
    """Reference models/dino/convnext.py -> our models/convnext.py tree:
    stem conv+LN (downsample_layers.0), LN+conv downsamples, per-block
    dwconv/norm/pwconv1/pwconv2/gamma, out norms norm{i} -> out_norm{i}."""
    out: Dict = {
        "stem_conv": {"kernel": _t_conv(sd[prefix + "downsample_layers.0.0.weight"]),
                      "bias": sd[prefix + "downsample_layers.0.0.bias"]},
        "stem_norm": {"scale": sd[prefix + "downsample_layers.0.1.weight"],
                      "bias": sd[prefix + "downsample_layers.0.1.bias"]},
    }
    stage = 0
    while f"{prefix}stages.{stage}.0.dwconv.weight" in sd:
        if stage > 0:
            out[f"down{stage}_norm"] = {
                "scale": sd[f"{prefix}downsample_layers.{stage}.0.weight"],
                "bias": sd[f"{prefix}downsample_layers.{stage}.0.bias"]}
            out[f"down{stage}_conv"] = {
                "kernel": _t_conv(sd[f"{prefix}downsample_layers.{stage}.1.weight"]),
                "bias": sd[f"{prefix}downsample_layers.{stage}.1.bias"]}
        b = 0
        while f"{prefix}stages.{stage}.{b}.dwconv.weight" in sd:
            src = f"{prefix}stages.{stage}.{b}"
            # torch depthwise conv weight [C,1,7,7] -> HWIO [7,7,1,C]
            out[f"stage{stage}_block{b}"] = {
                "dwconv": {"kernel": _t_conv(sd[f"{src}.dwconv.weight"]),
                           "bias": sd[f"{src}.dwconv.bias"]},
                "norm": convert_ln(sd, f"{src}.norm"),
                "pwconv1": {"kernel": _t_lin(sd[f"{src}.pwconv1.weight"]),
                            "bias": sd[f"{src}.pwconv1.bias"]},
                "pwconv2": {"kernel": _t_lin(sd[f"{src}.pwconv2.weight"]),
                            "bias": sd[f"{src}.pwconv2.bias"]},
                "gamma": sd[f"{src}.gamma"],
            }
            b += 1
        stage += 1
    # the reference registers norm{i} for every stage regardless of
    # out_indices (convnext.py:103-107); only the returned stages exist here
    for i in out_indices:
        if f"{prefix}norm{i}.weight" in sd:
            out[f"out_norm{i}"] = convert_ln(sd, f"{prefix}norm{i}")
    return out


def convert_msda(sd, src, has_heads=8):
    return {
        "sampling_offsets": {
            "kernel": _t_lin(sd[f"{src}.sampling_offsets.weight"]),
            "bias": sd[f"{src}.sampling_offsets.bias"],
        },
        "attention_weights": {
            "kernel": _t_lin(sd[f"{src}.attention_weights.weight"]),
            "bias": sd[f"{src}.attention_weights.bias"],
        },
        "value_proj": {
            "kernel": _t_lin(sd[f"{src}.value_proj.weight"]),
            "bias": sd[f"{src}.value_proj.bias"],
        },
        "output_proj": {
            "kernel": _t_lin(sd[f"{src}.output_proj.weight"]),
            "bias": sd[f"{src}.output_proj.bias"],
        },
    }


def convert_mlp(sd, src, n_layers):
    out = {}
    for i in range(n_layers):
        out[f"layer{i}"] = {
            "kernel": _t_lin(sd[f"{src}.layers.{i}.weight"]),
            "bias": sd[f"{src}.layers.{i}.bias"],
        }
    return out


def convert_mha(sd, src, n_heads, d_model):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    hd = d_model // n_heads
    w = sd[f"{src}.in_proj_weight"]  # [3*d, d]
    b = sd[f"{src}.in_proj_bias"]
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * d_model : (i + 1) * d_model]  # [d, d] (out, in)
        bi = b[i * d_model : (i + 1) * d_model]
        out[name] = {
            "kernel": _t_lin(wi).reshape(d_model, n_heads, hd),
            "bias": bi.reshape(n_heads, hd),
        }
    wo = sd[f"{src}.out_proj.weight"]  # [d, d]
    out["out"] = {
        "kernel": _t_lin(wo).reshape(n_heads, hd, d_model),
        "bias": sd[f"{src}.out_proj.bias"],
    }
    return out


def convert_ln(sd, src):
    return {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}


def convert_checkpoint(sd: Dict[str, np.ndarray], enc_layers=6, dec_layers=6,
                       n_heads=8, d_model=256) -> Dict:
    """Full state_dict -> {'params': tree} matching datr_tpu DINO."""
    p: Dict = {}
    if "backbone.0.patch_embed.proj.weight" in sd:
        p["backbone"] = convert_swin(sd)
    elif "backbone.0.downsample_layers.0.0.weight" in sd:
        p["backbone"] = convert_convnext(sd)
    else:
        p["backbone"] = convert_resnet(sd)

    # input projections (dino.py:111-133: Sequential(conv, GroupNorm))
    i = 0
    while f"input_proj.{i}.0.weight" in sd:
        p[f"input_proj{i}_conv"] = {
            "kernel": _t_conv(sd[f"input_proj.{i}.0.weight"]),
            "bias": sd[f"input_proj.{i}.0.bias"],
        }
        p[f"input_proj{i}_norm"] = {
            "scale": sd[f"input_proj.{i}.1.weight"],
            "bias": sd[f"input_proj.{i}.1.bias"],
        }
        i += 1

    p["level_embed"] = sd["transformer.level_embed"]
    p["tgt_embed"] = sd["transformer.tgt_embed.weight"]
    p["label_enc"] = sd["label_enc.weight"]

    for l in range(enc_layers):
        src = f"transformer.encoder.layers.{l}"
        p[f"enc_layer{l}"] = {
            "self_attn": convert_msda(sd, f"{src}.self_attn"),
            "norm1": convert_ln(sd, f"{src}.norm1"),
            "ffn": {
                "linear1": {"kernel": _t_lin(sd[f"{src}.linear1.weight"]),
                            "bias": sd[f"{src}.linear1.bias"]},
                "linear2": {"kernel": _t_lin(sd[f"{src}.linear2.weight"]),
                            "bias": sd[f"{src}.linear2.bias"]},
                "norm": convert_ln(sd, f"{src}.norm2"),
            },
        }
    for l in range(dec_layers):
        src = f"transformer.decoder.layers.{l}"
        p[f"dec_layer{l}"] = {
            "cross_attn": convert_msda(sd, f"{src}.cross_attn"),
            "norm1": convert_ln(sd, f"{src}.norm1"),
            "self_attn": convert_mha(sd, f"{src}.self_attn", n_heads,
                                     d_model),
            "norm2": convert_ln(sd, f"{src}.norm2"),
            "ffn": {
                "linear1": {"kernel": _t_lin(sd[f"{src}.linear1.weight"]),
                            "bias": sd[f"{src}.linear1.bias"]},
                "linear2": {"kernel": _t_lin(sd[f"{src}.linear2.weight"]),
                            "bias": sd[f"{src}.linear2.bias"]},
                "norm": convert_ln(sd, f"{src}.norm3"),
            },
        }
    p["decoder_norm"] = convert_ln(sd, "transformer.decoder.norm")
    p["ref_point_head"] = convert_mlp(sd, "transformer.decoder.ref_point_head",
                                      2)
    # shared heads (bbox_embed.0 == all layers when share=True)
    p["class_head"] = {"kernel": _t_lin(sd["class_embed.0.weight"]),
                       "bias": sd["class_embed.0.bias"]}
    p["bbox_head"] = convert_mlp(sd, "bbox_embed.0", 3)
    p["enc_output"] = {"kernel": _t_lin(sd["transformer.enc_output.weight"]),
                       "bias": sd["transformer.enc_output.bias"]}
    p["enc_output_norm"] = convert_ln(sd, "transformer.enc_output_norm")
    p["enc_out_class_head"] = {
        "kernel": _t_lin(sd["transformer.enc_out_class_embed.weight"]),
        "bias": sd["transformer.enc_out_class_embed.bias"],
    }
    p["enc_out_bbox_head"] = convert_mlp(sd, "transformer.enc_out_bbox_embed",
                                         3)
    # DA heads (train-time only in the reference; may be absent in eval ckpts)
    if "D_img.conv1.weight" in sd:
        p["d_img"] = {
            f"conv{i}": {"kernel": _t_conv(sd[f"D_img.conv{i}.weight"]),
                         "bias": sd[f"D_img.conv{i}.bias"]}
            for i in (1, 2, 3)
        }
        p["d_img"]["classifier"] = {
            "kernel": _t_conv(sd["D_img.classifier.weight"]),
            "bias": sd["D_img.classifier.bias"],
        }
    if "Proto_D.layers.0.weight" in sd:
        p["proto_d"] = convert_mlp(sd, "Proto_D", 3)
    return {"params": p}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--key", default="model",
                    help="'model' or 'ema_model' inside the .pth")
    ap.add_argument("--config", default="",
                    help="datr_tpu config: derives enc/dec layer counts, "
                         "heads and width for the module mapping")
    ap.add_argument("--options", nargs="+", default=[])
    args = ap.parse_args(argv)

    import torch

    ckpt = torch.load(args.torch_ckpt, map_location="cpu",
                      weights_only=False)
    sd_t = ckpt.get(args.key, ckpt)
    if hasattr(sd_t, "state_dict"):
        sd_t = sd_t.state_dict()
    sd = {k.replace("module.", ""):
          (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd_t.items()}
    if args.config:
        cfg = _cfg_dims(args.config, args.options)
        tree = convert_checkpoint(
            sd, enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
            n_heads=cfg.nheads, d_model=cfg.hidden_dim)
    else:
        tree = convert_checkpoint(sd)

    import jax
    import orbax.checkpoint as ocp

    tree = jax.tree.map(np.asarray, tree)
    ocp.PyTreeCheckpointer().save(args.out, tree, force=True)
    n = sum(x.size for x in jax.tree.leaves(tree))
    print(f"converted {n/1e6:.2f}M params -> {args.out}")


if __name__ == "__main__":
    sys.exit(main())
