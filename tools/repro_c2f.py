"""One-command mAP50 reproduction kit for the C2F headline number.

The reference reports mAP50 52.8 on Cityscapes->FoggyCityscapes
(/root/reference/README.md:112-116) from its published checkpoint, evaluated
at the C2F 1.5x scales capped at 2048 (1216x2048 canvas,
config/DA/Cityscapes2FoggyCityscapes/coco_transformer_C2F.py:2-8). This tool
chains every stage of reproducing that number against datr_tpu:

  1. stage    — copy/unzip the dataset tree onto local disk
                (tools/stage_data.py; layout <root>/city2foggy/
                {source,target,val}/{images,annotations.json})
  2. convert  — reference .pth checkpoint -> datr_tpu params
                (tools/convert_checkpoint.py)
  3. eval     — datr_tpu.main --eval with the C2F config at the 1216x2048
                canvas on the converted params
  4. diff     — compare mAP50 against --expect (default 52.8) within --tol

Usage (real artifacts):
  python tools/repro_c2f.py --ckpt /path/c2f_published.pth \
      --data_src /shared/city2foggy --work_dir /local/repro

Offline dry run (no artifacts in this image — synthesizes a miniature
dataset + random params in the SAME formats, and drives every stage end to
end at a reduced canvas so the kit itself is continuously tested):
  python tools/repro_c2f.py --dry_run --work_dir /tmp/repro_dry

Prints one JSON line per stage and a final verdict line
{"repro": "c2f", "map50": ..., "expect": ..., "ok": bool}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

C2F_CONFIG = "configs/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F.py"


def _log(stage, **kw):
    print(json.dumps({"stage": stage, **kw}), flush=True)


# ------------------------------------------------------------------ stages


def stage_dataset(data_src: str, data_root: str):
    from tools.stage_data import stage_tree, stage_zip

    dst = os.path.join(data_root, "city2foggy")
    if data_src.endswith(".zip"):
        n = stage_zip(data_src, dst)
        _log("stage", src=data_src, dst=dst, extracted=n)
    else:
        copied, skipped = stage_tree(data_src, dst)
        _log("stage", src=data_src, dst=dst, copied=copied, skipped=skipped)
    for sub in ("val/annotations.json",):
        p = os.path.join(dst, sub)
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"staged tree is missing {p} — expected the DA layout "
                "val/{images,annotations.json}")
    return dst


def convert_ckpt(torch_ckpt: str, config: str, out: str, key: str,
                 options=()):
    from tools.convert_checkpoint import main as convert_main

    convert_main(["--torch_ckpt", torch_ckpt, "--config", config,
                  "--out", out, "--key", key,
                  *(["--options", *options] if options else [])])
    _log("convert", ckpt=torch_ckpt, key=key, out=out)
    return out


def run_eval(config: str, params_path: str, data_root: str, out_dir: str,
             options=()):
    from datr_tpu.main import get_args_parser, main

    args = get_args_parser().parse_args([
        "-c", config, "--eval",
        "--resume", params_path,
        "--data_root", data_root,
        "--output_dir", out_dir,
        *(["--options", *options] if options else []),
    ])
    stats = main(args)
    if not stats or "ap50" not in stats:
        raise RuntimeError("eval produced no ap50 stat")
    _log("eval", **{k: v for k, v in stats.items()
                    if isinstance(v, (int, float))})
    return stats


# ------------------------------------------------------- dry-run stand-ins


def _make_synthetic_c2f_tree(src_dir: str, hw=(80, 112), n=4, classes=3):
    """Miniature city2foggy-layout tree (PNG images + COCO annotations) —
    the stand-in artifact for the stage step."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("source", "target", "val"):
        img_dir = os.path.join(src_dir, split, "images")
        os.makedirs(img_dir, exist_ok=True)
        images, anns = [], []
        for i in range(n):
            h, w = hw
            arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            name = f"{split}_{i:04d}.png"
            Image.fromarray(arr).save(os.path.join(img_dir, name))
            images.append({"id": i, "file_name": name,
                           "height": h, "width": w})
            for j in range(2):
                x0, y0 = rng.uniform(0, w / 2), rng.uniform(0, h / 2)
                bw, bh = rng.uniform(8, w / 3), rng.uniform(8, h / 3)
                anns.append({
                    "id": i * 10 + j, "image_id": i,
                    "category_id": int(rng.integers(1, classes + 1)),
                    "bbox": [x0, y0, bw, bh], "area": bw * bh,
                    "iscrowd": 0,
                })
        with open(os.path.join(src_dir, split, "annotations.json"),
                  "w") as f:
            json.dump({
                "images": images, "annotations": anns,
                "categories": [{"id": c, "name": f"c{c}"}
                               for c in range(1, classes + 1)],
            }, f)
    return src_dir


def _make_synthetic_reference_ckpt(out_pth: str, config: str, options):
    """Random-weight torch checkpoint in the REFERENCE's state-dict layout
    for the given config — the stand-in for the published .pth. Built from
    the converter's own inverse mapping so the convert stage runs the real
    name-mapping code path end to end."""
    import torch

    from tools.convert_checkpoint import build_reference_state_dict

    sd = build_reference_state_dict(config, options)
    torch.save({"model": sd, "ema_model": sd}, out_pth)
    return out_pth


DRY_OPTIONS = [
    # shrink to test-suite shapes so the dry run compiles in seconds on CPU
    "num_classes=4", "dn_labelbook_size=4", "hidden_dim=32", "nheads=2",
    "enc_layers=1", "dec_layers=2", "dim_feedforward=64", "num_queries=16",
    "dn_number=4", "dn_single_pad=4", "canvas_h=96", "canvas_w=128",
    "max_boxes=8", "batch_size=2", "num_select=10",
    "data_aug_scales=[72,80]", "data_aug_max_size=120",
    "data_aug_scales2_resize=[64,72]", "data_aug_scales2_crop=[48,72]",
]


# -------------------------------------------------------------------- main


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt", default="",
                    help="published reference checkpoint (.pth)")
    ap.add_argument("--ckpt_key", default="ema_model",
                    choices=["model", "ema_model"],
                    help="state-dict to convert (the published C2F best "
                         "is the EMA track)")
    ap.add_argument("--data_src", default="",
                    help="dataset tree or .zip to stage; omit if "
                         "--data_root already holds city2foggy/")
    ap.add_argument("--data_root", default="")
    ap.add_argument("--work_dir", default="runs/repro_c2f")
    ap.add_argument("--config", default=C2F_CONFIG)
    ap.add_argument("--expect", type=float, default=52.8,
                    help="reference mAP50 (README.md:112-116)")
    ap.add_argument("--tol", type=float, default=0.5)
    ap.add_argument("--options", nargs="+", default=[])
    ap.add_argument("--dry_run", action="store_true",
                    help="synthesize every missing artifact and drive all "
                         "four stages at reduced shapes (offline self-test)")
    args = ap.parse_args(argv)

    os.makedirs(args.work_dir, exist_ok=True)
    data_root = args.data_root or os.path.join(args.work_dir, "data")
    options = list(args.options)

    if args.dry_run:
        import jax

        jax.config.update("jax_platforms", "cpu")
        options = DRY_OPTIONS + options
        if not args.data_src:
            args.data_src = _make_synthetic_c2f_tree(
                os.path.join(args.work_dir, "synthetic_src"))
        if not args.ckpt:
            args.ckpt = _make_synthetic_reference_ckpt(
                os.path.join(args.work_dir, "synthetic_ref.pth"),
                args.config, options)

    # 1. stage
    if args.data_src:
        stage_dataset(args.data_src, data_root)
    elif not os.path.isdir(os.path.join(data_root, "city2foggy")):
        raise FileNotFoundError(
            f"no dataset: pass --data_src or put city2foggy/ under "
            f"{data_root}")

    # 2. convert
    if not args.ckpt:
        raise FileNotFoundError("no checkpoint: pass --ckpt (published "
                                ".pth from the reference README)")
    params_path = convert_ckpt(
        args.ckpt, args.config, os.path.join(args.work_dir, "converted"),
        args.ckpt_key, options)

    # 3. eval at the C2F canvas (dry run shrinks it via DRY_OPTIONS)
    stats = run_eval(args.config, params_path, data_root,
                     os.path.join(args.work_dir, "eval"), options)

    # 4. diff
    map50 = 100.0 * stats["ap50"]
    ok = abs(map50 - args.expect) <= args.tol
    print(json.dumps({
        "repro": "c2f", "map50": round(map50, 2), "expect": args.expect,
        "tol": args.tol, "ok": bool(ok), "dry_run": bool(args.dry_run),
        **({"note": "dry run: synthetic stand-ins, accuracy diff not "
                    "meaningful"} if args.dry_run else {}),
    }))
    if not ok and not args.dry_run:
        sys.exit(1)


if __name__ == "__main__":
    main()
