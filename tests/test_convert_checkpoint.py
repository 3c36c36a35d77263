"""Checkpoint-converter test: a synthetic reference-keyed state dict converts
into a tree our DINO model accepts, and the forward runs (weight-level parity
harness for published DATR checkpoints)."""

import sys
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_checkpoint import convert_checkpoint  # noqa: E402


def _fake_reference_sd(enc=1, dec=1, d=64, heads=4, K=3, ffn=128,
                       labelbook=3, nq=8):
    """Minimal torch-layout state dict with the reference's key names
    (dino.py / deformable_transformer.py modules)."""
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


def test_convert_and_forward():
    d, heads, K = 64, 4, 3
    sd = _fake_reference_sd(d=d, heads=heads, K=K)
    tree = convert_checkpoint(sd, enc_layers=1, dec_layers=1, n_heads=heads,
                              d_model=d)

    from datr_tpu.models.dino import DINO

    model = DINO(num_classes=K, num_queries=8, hidden_dim=d, nheads=heads,
                 enc_layers=1, dec_layers=1, dim_feedforward=128,
                 dn_number=2, dn_single_pad=2, dn_labelbook_size=K,
                 use_remat=False)
    x = jnp.zeros((1, 64, 64, 3))
    m = jnp.zeros((1, 64, 64), bool)
    ref_params = model.init(jax.random.PRNGKey(0), x, m, train=False)

    # structural compatibility: every converted leaf matches the model's
    # expected shape (d_img/proto_d are allowed to be missing in eval ckpts)
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_params["params"])[0]
    conv = tree["params"]

    def lookup(tree_, path):
        node = tree_
        for p in path:
            k = p.key
            if k not in node:
                return None
            node = node[k]
        return node

    missing, mismatched = [], []
    for path, leaf in flat_ref:
        got = lookup(conv, path)
        name = "/".join(p.key for p in path)
        if got is None:
            missing.append(name)
        elif tuple(np.shape(got)) != tuple(leaf.shape):
            mismatched.append((name, np.shape(got), leaf.shape))
    allowed_missing = {"d_img", "proto_d"}
    bad_missing = [m_ for m_ in missing
                   if m_.split("/")[0] not in allowed_missing]
    assert not bad_missing, bad_missing[:10]
    assert not mismatched, mismatched[:10]

    # forward runs with converted weights (fill DA heads from init)
    merged = jax.tree_util.tree_map(lambda x_: x_, ref_params)
    merged["params"].update(
        {k: v for k, v in conv.items() if k in ref_params["params"]}
    )
    out = model.apply(merged, x, m, train=False)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
