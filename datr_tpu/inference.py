"""Single-image inference CLI.

Capability match for the reference inference.py / inference_ema_model.py:
load config + checkpoint (student params or the EMA-teacher track), resize
shorter side 800 capped 1333, forward, PostProcess at size (1, 1) ->
normalized boxes, score threshold 0.2, draw rectangles, save.

Usage:
  python -m datr_tpu.inference -c configs/.../DINO_4scale_C2F.py \
      --ckpt runs/c2f/checkpoint --image in.png --out out.png [--ema]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageDraw

from .config import apply_overrides, load_config
from .data.transforms import finalize_example, get_size_with_aspect_ratio
from .models import build_model
from .models.postprocess import postprocess

CLASS_PALETTE = [
    (255, 99, 71), (65, 105, 225), (60, 179, 113), (238, 130, 238),
    (255, 165, 0), (106, 90, 205), (64, 224, 208), (218, 165, 32),
    (199, 21, 133), (0, 191, 255),
]


def run_inference(model, params, pil_img: Image.Image, canvas_hw,
                  num_select=300, threshold=0.2, with_masks=False):
    """with_masks=True (requires a with_masks model) additionally returns
    original-size binary instance masks [N, H, W] for the kept
    detections."""
    oh, ow = get_size_with_aspect_ratio(pil_img.size, 800, 1333)
    resized = pil_img.resize((ow, oh), Image.BILINEAR)
    ex = finalize_example(resized, {"boxes": np.zeros((0, 4), np.float32),
                                    "labels": np.zeros((0,), np.int64)},
                          canvas_hw, 1)
    images = jnp.asarray(ex["image"])[None]
    pad_mask = jnp.asarray(ex["pad_mask"])[None]
    out = model.apply(params, images, pad_mask, train=False)
    res = postprocess(
        out["pred_logits"], out["pred_boxes"],
        jnp.ones((1, 2), jnp.float32), num_select=num_select,
    )
    res = jax.device_get(res)
    keep = res["scores"][0] > threshold
    # boxes are normalized fractions of the image extent -> original coords
    boxes = res["boxes"][0][keep] * np.array(
        [pil_img.size[0], pil_img.size[1],
         pil_img.size[0], pil_img.size[1]], np.float32,
    )
    labels = res["labels"][0][keep]
    scores = res["scores"][0][keep]
    if not with_masks:
        return boxes, labels, scores
    from .models.segmentation import det_mask_rles
    from .utils.rle import decode_counts

    w0, h0 = pil_img.size
    pm = np.asarray(out["pred_masks"][0], np.float32)  # [Q, h4, w4]
    # ex["real_size"] is the ACTUAL unpadded extent on the canvas —
    # finalize_example rescales when the 800/1333 resize exceeds the canvas
    rles = det_mask_rles(pm[res["queries"][0][keep]], canvas_hw,
                         tuple(ex["real_size"]), (h0, w0))
    masks = (np.stack([decode_counts(c, h0, w0) for c in rles])
             if rles else np.zeros((0, h0, w0), bool))
    return boxes, labels, scores, masks


def load_eval_params(ckpt_path: str, ema: bool = False,
                     teacher: bool = False):
    """Load serving/eval params from an orbax checkpoint: the student
    params, the --use_ema model_ema track, or the pseudo-label EMA teacher
    (reference inference.py vs inference_ema_model.py)."""
    import orbax.checkpoint as ocp

    restored = ocp.PyTreeCheckpointer().restore(ckpt_path)
    if isinstance(restored, dict) and "params" in restored:
        key = ("model_ema" if ema
               else "ema_teacher" if teacher else "params")
        # older checkpoints predate the model_ema family
        return restored.get(key) or restored["params"]
    return restored


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", "-c", required=True)
    ap.add_argument("--options", nargs="+", default=[])
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--image", required=True)
    ap.add_argument("--out", default="inference_out.png")
    ap.add_argument("--ema", action="store_true",
                    help="use the --use_ema ModelEma weights "
                         "(inference_ema_model.py:91 loads 'ema_model')")
    ap.add_argument("--teacher", action="store_true",
                    help="use the EMA-teacher (pseudo-label) track")
    ap.add_argument("--threshold", type=float, default=0.2)
    args = ap.parse_args()

    cfg = apply_overrides(load_config(args.config_file), args.options)
    model, _, _ = build_model(cfg)
    canvas_hw = (cfg.get("canvas_h", 800), cfg.get("canvas_w", 1344))

    params = load_eval_params(args.ckpt, ema=args.ema, teacher=args.teacher)

    img = Image.open(args.image).convert("RGB")
    with_masks = bool(getattr(model, "with_masks", False))
    r = run_inference(
        model, params, img, canvas_hw, cfg.get("num_select", 300),
        args.threshold, with_masks=with_masks,
    )
    boxes, labels, scores = r[:3]
    if with_masks and len(r) == 4 and len(r[3]):
        from .utils.visualizer import draw_masks

        img = draw_masks(img, r[3], labels)
    draw = ImageDraw.Draw(img)
    for b, l, s in zip(boxes, labels, scores):
        color = CLASS_PALETTE[int(l) % len(CLASS_PALETTE)]
        draw.rectangle(list(map(float, b)), outline=color, width=3)
        draw.text((float(b[0]), max(0.0, float(b[1]) - 12)),
                  f"{int(l)}:{s:.2f}", fill=color)
    img.save(args.out)
    print(f"saved {args.out} with {len(boxes)} detections")


if __name__ == "__main__":
    main()
