"""Cross-validation of the production COCO evaluator against the literal
pycocotools-control-flow oracle (cocoeval_oracle.py) on adversarial fixtures:
score ties, IoU ties from duplicate/quantized boxes, crowd GT, area-range
boundaries (exactly 32^2 / 96^2), annotation-area != box-area, maxDets
truncation, empty images, categories with dets but no GT. VERDICT round-1
item #3.
"""

import numpy as np
import pytest

from cocoeval_oracle import OracleCocoEval
from datr_tpu.eval.coco_eval import CocoEvaluator


def _run_both(images, categories):
    ours = CocoEvaluator(categories)
    oracle = OracleCocoEval(categories)
    for img in images:
        ours.add_image(**img)
        oracle.add_image(**img)
    return np.array(ours.summarize()), np.array(oracle.summarize())


def _rand_fixture(seed, n_images=12, n_cats=5, quantized=True):
    """Random detections/GT engineered to produce ties and edge areas."""
    rng = np.random.default_rng(seed)
    images = []
    for i in range(n_images):
        G = rng.integers(0, 12)
        D = rng.integers(0, 30)
        W, H = 640, 480

        def boxes(n):
            if quantized:
                # coordinates on a coarse grid -> frequent duplicate boxes
                # and exact IoU ties
                xy = rng.integers(0, 12, (n, 2)) * 40.0
                wh = rng.integers(1, 6, (n, 2)) * 32.0
            else:
                xy = rng.uniform(0, W - 64, (n, 2))
                wh = rng.uniform(4, 200, (n, 2))
            return np.concatenate([xy, xy + wh], axis=1)

        gt_boxes = boxes(G)
        # force some exact area-boundary gts: 32x32 (=1024) and 96x96
        for k in range(min(G, 2)):
            side = 32.0 if k == 0 else 96.0
            gt_boxes[k, 2] = gt_boxes[k, 0] + side
            gt_boxes[k, 3] = gt_boxes[k, 1] + side
        det_boxes = boxes(D)
        if D > 2 and G > 0:
            det_boxes[0] = gt_boxes[rng.integers(0, G)]  # exact hit
            det_boxes[1] = det_boxes[0]  # duplicate detection
        scores = (
            rng.integers(1, 20, (D,)) / 20.0 if quantized
            else rng.uniform(0, 1, (D,))
        )
        images.append(dict(
            image_id=i,
            gt_boxes=gt_boxes,
            gt_labels=rng.integers(0, n_cats, (G,)),
            det_boxes=det_boxes,
            det_scores=scores,
            det_labels=rng.integers(0, n_cats, (D,)),
            gt_iscrowd=rng.random(G) < 0.2,
        ))
    return images, list(range(n_cats))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_adversarial_fixtures(seed):
    images, cats = _rand_fixture(seed)
    ours, oracle = _run_both(images, cats)
    np.testing.assert_allclose(ours, oracle, atol=1e-9)


def test_continuous_fixture_many_dets():
    images, cats = _rand_fixture(7, n_images=8, n_cats=3, quantized=False)
    # blow past maxDets=100 on one image to exercise truncation
    rng = np.random.default_rng(11)
    xy = rng.uniform(0, 400, (150, 2))
    wh = rng.uniform(4, 120, (150, 2))
    images[0]["det_boxes"] = np.concatenate([xy, xy + wh], axis=1)
    images[0]["det_scores"] = rng.uniform(0, 1, (150,))
    images[0]["det_labels"] = rng.integers(0, 3, (150,))
    ours, oracle = _run_both(images, cats)
    np.testing.assert_allclose(ours, oracle, atol=1e-9)


def test_annotation_area_differs_from_box_area():
    """pycocotools area-range ignoring uses the annotation 'area' field
    (segmentation area), not the box area."""
    rng = np.random.default_rng(3)
    images, cats = _rand_fixture(3, n_images=6, n_cats=3)
    for img in images:
        G = len(img["gt_boxes"])
        # segmentation-ish area: ~60% of box area
        box_area = (
            (img["gt_boxes"][:, 2] - img["gt_boxes"][:, 0])
            * (img["gt_boxes"][:, 3] - img["gt_boxes"][:, 1])
        )
        img["gt_areas"] = box_area * rng.uniform(0.4, 0.8, (G,))
    ours, oracle = _run_both(images, cats)
    np.testing.assert_allclose(ours, oracle, atol=1e-9)


def test_category_with_dets_but_no_gt_is_excluded():
    images = [dict(
        image_id=0,
        gt_boxes=np.array([[10.0, 10, 50, 50]]),
        gt_labels=np.array([0]),
        det_boxes=np.array([[10.0, 10, 50, 50], [100.0, 100, 150, 150]]),
        det_scores=np.array([0.9, 0.8]),
        det_labels=np.array([0, 1]),  # cat 1 has no GT anywhere
    )]
    ours, oracle = _run_both(images, [0, 1])
    np.testing.assert_allclose(ours, oracle, atol=1e-9)
    assert ours[1] == 1.0  # cat-1 FPs must not drag AP50 below perfect cat-0


def test_empty_images_and_all_crowd():
    images = [
        dict(image_id=0, gt_boxes=np.zeros((0, 4)),
             gt_labels=np.zeros((0,), int), det_boxes=np.zeros((0, 4)),
             det_scores=np.zeros((0,)), det_labels=np.zeros((0,), int)),
        dict(image_id=1,
             gt_boxes=np.array([[0.0, 0, 600, 400]]),
             gt_labels=np.array([0]),
             det_boxes=np.array([[0.0, 0, 600, 400]]),
             det_scores=np.array([0.5]),
             det_labels=np.array([0]),
             gt_iscrowd=np.array([True])),
        dict(image_id=2,
             gt_boxes=np.array([[5.0, 5, 100, 100]]),
             gt_labels=np.array([0]),
             det_boxes=np.array([[5.0, 5, 100, 100]]),
             det_scores=np.array([0.7]),
             det_labels=np.array([0])),
    ]
    ours, oracle = _run_both(images, [0])
    np.testing.assert_allclose(ours, oracle, atol=1e-9)
    # the crowd-matched detection is ignored, not an FP: AP50 stays 1.0
    assert ours[1] == 1.0


def test_score_tie_ordering_across_images():
    """Identical scores across images: ranking must follow the stable
    (image, within-image) order on both implementations."""
    mk = lambda i, hit: dict(  # noqa: E731
        image_id=i,
        gt_boxes=np.array([[0.0, 0, 50, 50]]),
        gt_labels=np.array([0]),
        det_boxes=np.array(
            [[0.0, 0, 50, 50] if hit else [200.0, 200, 260, 260]]
        ),
        det_scores=np.array([0.5]),  # all tied
        det_labels=np.array([0]),
    )
    images = [mk(0, False), mk(1, True), mk(2, True), mk(3, False)]
    ours, oracle = _run_both(images, [0])
    np.testing.assert_allclose(ours, oracle, atol=1e-9)
