"""Dual-stack mAP-number parity: the LIVE torch reference and datr_tpu each
run their FULL eval chain over the same on-disk COCO val set, and the two
12-number COCO summaries must agree (VERDICT r4 #3).

Per-stage parity already exists (test_torch_parity.py forward/PostProcess,
test_aug_torch_parity.py pixels/boxes, test_coco_eval_oracle.py scoring);
this test composes them into the one number the reference is known by:

  reference:  PIL image -> ITS val transform (datasets/coco.py:534-545
              RandomResize + normalize, datasets/transforms.py resize)
              -> build_dino model -> ITS PostProcess (dino.py:944-996)
  datr_tpu:   the same images through datr_tpu.main --eval — EvalTransform,
              static canvas, jitted forward+PostProcess, engine.evaluate
              (reference engine.py:349-513) — on weights converted from the
              reference state dict by tools/convert_checkpoint.py

both scored by eval/coco_eval.py against the same annotations. GT is built
from the reference's own confident detections so the AP surface is
sensitive: every detection drift (resize geometry, forward numerics,
PostProcess ranking, evaluator semantics) moves a summary number away from
the reference's near-1.0. Random-GT would score ~0 on both stacks and hide
everything.
"""

import json
import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import reference_stubs  # noqa: E402

reference_stubs.install()

pytestmark = pytest.mark.parity  # heavy live-torch fixtures

from datr_tpu.config import load_config  # noqa: E402
from datr_tpu.eval.coco_eval import CocoEvaluator  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CFG = (
    "/root/reference/config/DA/Cityscapes2FoggyCityscapes/DINO_4scale_C2F.py"
)
OUR_CFG = os.path.join(
    REPO, "configs", "DA", "Cityscapes2FoggyCityscapes", "DINO_4scale_C2F.py"
)

# shallow stack at a reduced eval resolution; the resize/forward/
# PostProcess/eval CODE paths are identical to flagship, where per-stage
# parity is already proven. hidden_dim MUST stay 256: the reference's
# gen_sineembed_for_position hardcodes 128 frequencies (models/dino/
# utils.py:61-78), so its decoder only builds at d_model=256.
TINY = dict(
    num_classes=4, dn_labelbook_size=4, hidden_dim=256, nheads=2,
    enc_layers=1, dec_layers=2, dim_feedforward=64, num_queries=16,
    dn_number=4, dn_single_pad=4, num_select=10,
    data_aug_scales=[160], data_aug_max_size=266,
)
OUR_OPTIONS = [f"{k}={v}" for k, v in TINY.items() if k != "data_aug_scales"]
OUR_OPTIONS += ["data_aug_scales=[160]", "canvas_h=160", "canvas_w=256",
                "max_boxes=8", "batch_size=2", "use_remat=False",
                "data_aug_scales2_resize=[64,72]",
                "data_aug_scales2_crop=[48,72]"]
N_IMAGES = 24
CATS = (1, 2, 3)


def _make_val_images(img_dir, n=N_IMAGES):
    """Images EXACTLY 160x256 = the eval scale and the static canvas, so
    both stacks' val resizes are the identity AND the canvas adds no
    padding. Both conditions are load-bearing, by measurement:

    - a random-init model's top-num_select score gaps are ~5e-5, so AP
      equality is ill-conditioned to ANY pixel difference; identical
      sizes make the two resize stages bit-equal (diff 7e-7 measured).
    - with pad columns, our always-padded canvas forward and the
      reference's unpadded batch-1 forward legitimately differ near the
      right boundary (pad-region backbone features are conv-bias values,
      not zeros, and MSDA's bilinear sampling at boundary-adjacent
      locations reads them; the reference has the same leak whenever its
      batched NestedTensor pads — just not at batch 1), which again
      exceeds the tie gaps. AP 0.26-0.41 vs 0.98 measured through pads.

    For TRAINED checkpoints (tools/repro_c2f.py, the real 52.8 chain)
    score margins dwarf both effects and none of this conditioning is
    needed. Resize geometry and pad-mask handling have their own
    live-reference tests (test_aug_torch_parity, test_torch_parity); this
    test composes conversion + forward + PostProcess + evaluator +
    original-size coordinate scaling into one AP number."""
    from PIL import Image

    rng = np.random.default_rng(11)
    sizes = []
    os.makedirs(img_dir, exist_ok=True)
    for i in range(n):
        h, w = 160, 256
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"im_{i:04d}.png"))
        sizes.append((h, w))
    return sizes


def _reference_detections(val_dir, sizes):
    """The unmodified reference eval chain: its val transform, its model,
    its PostProcess, at original-size xyxy boxes."""
    from types import SimpleNamespace

    from PIL import Image

    import models.dino.dino as ref_dino
    from datasets.coco import make_coco_transforms
    from util.misc import NestedTensor

    cfg = dict(load_config(REF_CFG))
    cfg.update(TINY)
    cfg.setdefault("device", "cpu")
    args = SimpleNamespace(**cfg)
    torch.manual_seed(0)
    model, _, post = ref_dino.build_dino(args)
    model.eval()
    tf = make_coco_transforms("val", args=args)

    dets = []
    with torch.no_grad():
        for i, (h, w) in enumerate(sizes):
            img = Image.open(
                os.path.join(val_dir, "images", f"im_{i:04d}.png")
            ).convert("RGB")
            # datasets/coco.py builds with `da_transforms as T`: the DA
            # Compose is 3-arg (image, image_strong_aug, target) and the
            # val chain passes strong=None (DAcoco.py:394-398)
            x, _, _ = tf(img, None,
                         {"boxes": torch.zeros(0, 4),
                          "labels": torch.zeros(0, dtype=torch.long)})
            nt = NestedTensor(x[None],
                              torch.zeros(1, *x.shape[1:], dtype=torch.bool))
            out = model(nt)
            res = post["bbox"](out, torch.tensor([[h, w]], dtype=torch.
                                                 float32))[0]
            dets.append({k: v.numpy() for k, v in res.items()})
    return dets, model


def _write_annotations(val_dir, sizes, dets, top_k=5):
    """GT := each image's top_k confident reference detections (real
    categories only, boxes clamped, degenerate slivers dropped)."""
    images, anns = [], []
    aid = 0
    for i, (h, w) in enumerate(sizes):
        images.append({"id": i, "file_name": f"im_{i:04d}.png",
                       "height": h, "width": w})
        d = dets[i]
        order = np.argsort(-d["scores"])
        taken = 0
        for j in order:
            lab = int(d["labels"][j])
            if lab not in CATS or taken >= top_k:
                continue
            x0, y0, x1, y1 = np.clip(
                d["boxes"][j], 0, [w, h, w, h]).tolist()
            bw, bh = x1 - x0, y1 - y0
            if bw < 4 or bh < 4:  # slivers make IoU numerically twitchy
                continue
            anns.append({"id": aid, "image_id": i, "category_id": lab,
                         "bbox": [x0, y0, bw, bh], "area": bw * bh,
                         "iscrowd": 0})
            aid += 1
            taken += 1
    with open(os.path.join(val_dir, "annotations.json"), "w") as f:
        json.dump({
            "images": images, "annotations": anns,
            "categories": [{"id": c, "name": f"c{c}"} for c in CATS],
        }, f)
    return anns


def _score(anns, sizes, dets):
    ev = CocoEvaluator(CATS)
    by_img = {}
    for a in anns:
        by_img.setdefault(a["image_id"], []).append(a)
    for i in range(len(sizes)):
        gt = by_img.get(i, [])
        gb = np.array([[a["bbox"][0], a["bbox"][1],
                        a["bbox"][0] + a["bbox"][2],
                        a["bbox"][1] + a["bbox"][3]] for a in gt],
                      np.float64).reshape(-1, 4)
        gl = np.array([a["category_id"] for a in gt], np.int64)
        ga = np.array([a["area"] for a in gt], np.float64)
        d = dets[i]
        ev.add_image(i, gb, gl, np.asarray(d["boxes"], np.float64),
                     np.asarray(d["scores"], np.float64),
                     np.asarray(d["labels"], np.int64),
                     gt_iscrowd=np.zeros(len(gt), np.int64), gt_areas=ga)
    return np.asarray(ev.summarize(), np.float64)


@pytest.mark.slow
def test_dualstack_map_parity(tmp_path):
    import tools.repro_c2f as kit

    root = tmp_path / "data"
    tree = root / "city2foggy"
    # train splits exist only so datr_tpu.main can construct its (unused in
    # --eval) train dataset; val is rebuilt below with detection-derived GT
    kit._make_synthetic_c2f_tree(str(tree), hw=(96, 144), n=2, classes=3)
    val_dir = str(tree / "val")
    sizes = _make_val_images(os.path.join(val_dir, "images"))

    dets_ref, ref_model = _reference_detections(val_dir, sizes)
    anns = _write_annotations(val_dir, sizes, dets_ref)
    assert len(anns) >= 3 * N_IMAGES, (
        f"only {len(anns)} GT dets survived — raise top_k or loosen filters"
    )
    stats_ref = _score(anns, sizes, dets_ref)
    # GT is the reference's own detections: its summary must be near-perfect
    # or the fixture lost its sensitivity
    assert stats_ref[1] > 0.85, stats_ref

    # --- datr_tpu stack: convert the SAME weights, run the real CLI ---
    pth = tmp_path / "ref.pth"
    torch.save({"model": ref_model.state_dict()}, pth)
    conv = tmp_path / "converted"
    kit.convert_ckpt(str(pth), OUR_CFG, str(conv), "model",
                     options=OUR_OPTIONS)
    stats = kit.run_eval(OUR_CFG, str(conv), str(root),
                         str(tmp_path / "out"), options=OUR_OPTIONS)
    stats_ours = np.asarray(stats["coco_eval_bbox"], np.float64)

    delta = np.abs(stats_ours - stats_ref)
    # < 0.1 AP point (COCO prints 0-100; these are 0-1) on every one of the
    # 12 numbers — the dual-stack closure of the 52.8 chain
    assert delta.max() < 1e-3, (
        f"12-number summaries diverge: ref={stats_ref.round(4).tolist()} "
        f"ours={stats_ours.round(4).tolist()}"
    )
