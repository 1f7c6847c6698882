import json

import numpy as np
import jax.numpy as jnp
import pytest

from vision_transformers_tpu.utils.coco.coco_eval import (
    _iou_matrix,
    evaluate_detections,
)

pytestmark = pytest.mark.slow  # full-model / multi-device integration tier


def test_iou_matrix():
    p = np.asarray([[0, 0, 10, 10.0]])
    g = np.asarray([[0, 0, 10, 10.0], [5, 5, 15, 15.0]])
    iou = _iou_matrix(p, g)
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175], atol=1e-6)


def test_perfect_predictions_give_map_1():
    gts = {
        1: {"boxes": np.asarray([[10, 10, 50, 50], [60, 60, 90, 90.0]]),
            "labels": np.asarray([1, 2])},
        2: {"boxes": np.asarray([[5, 5, 25, 25.0]]),
            "labels": np.asarray([1])},
    }
    preds = {
        i: {"boxes": g["boxes"], "labels": g["labels"],
            "scores": np.ones(len(g["labels"]))}
        for i, g in gts.items()
    }
    m = evaluate_detections(gts, preds)
    assert m["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert m["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert m["AR@100"] == pytest.approx(1.0, abs=1e-6)


def test_no_predictions_give_map_0():
    gts = {1: {"boxes": np.asarray([[10, 10, 50, 50.0]]),
               "labels": np.asarray([1])}}
    preds = {1: {"boxes": np.zeros((0, 4)), "labels": np.zeros(0, int),
                 "scores": np.zeros(0)}}
    m = evaluate_detections(gts, preds)
    assert m["mAP"] == 0.0


def test_localization_quality_separates_ap50_ap75():
    """A prediction with IoU ~0.6 counts at AP50 but not AP75."""
    gts = {1: {"boxes": np.asarray([[0, 0, 100, 100.0]]),
               "labels": np.asarray([1])}}
    # shifted box: IoU = (80*100)/(100*100 + 100*100 - 80*100) = 2/3
    preds = {1: {"boxes": np.asarray([[20, 0, 120, 100.0]]),
                 "labels": np.asarray([1]), "scores": np.asarray([0.9])}}
    m = evaluate_detections(gts, preds)
    assert m["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert m["AP75"] == 0.0
    assert 0 < m["mAP"] < 1


def test_false_positives_reduce_precision():
    gts = {1: {"boxes": np.asarray([[0, 0, 10, 10.0]]),
               "labels": np.asarray([1])}}
    preds = {1: {
        "boxes": np.asarray([[0, 0, 10, 10.0], [50, 50, 60, 60.0]]),
        "labels": np.asarray([1, 1]),
        "scores": np.asarray([0.5, 0.9]),  # FP scores HIGHER
    }}
    m = evaluate_detections(gts, preds)
    assert m["mAP"] < 1.0
    assert m["AR@100"] == pytest.approx(1.0, abs=1e-6)  # GT still found


def test_area_ranges():
    gts = {1: {"boxes": np.asarray([[0, 0, 10, 10.0],      # small (100 px)
                                    [0, 0, 200, 200.0]]),  # large
               "labels": np.asarray([1, 1])}}
    preds = {1: {"boxes": gts[1]["boxes"], "labels": gts[1]["labels"],
                 "scores": np.asarray([0.9, 0.9])}}
    m = evaluate_detections(gts, preds)
    assert m["AP_small"] == pytest.approx(1.0, abs=1e-6)
    assert m["AP_large"] == pytest.approx(1.0, abs=1e-6)


def test_detection_loader_and_fit(tmp_path):
    """End-to-end: tiny synthetic COCO → DetectionLoader → fit_detection
    (1 epoch, tiny DETR) → finite losses + eval metrics dict."""
    from tests.test_coco_utils import _write_tiny_coco
    from vision_transformers_tpu.models.object_detection import Detr
    from vision_transformers_tpu.training.detection import (
        DetectionLoader, fit_detection,
    )
    from vision_transformers_tpu.utils.coco.build_coco import (
        CocoDetection, make_coco_transforms,
    )
    from vision_transformers_tpu.utils.coco import transforms as T

    img_dir, ann_file = _write_tiny_coco(tmp_path, n_images=4)
    # small fixed-size transform to keep CPU compile fast
    tr = T.Compose([
        T.RandomResize([64]),
        T.ToTensor(),
        T.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    ])
    ds = CocoDetection(img_dir, ann_file, transforms=tr)
    loader = DetectionLoader(ds, batch_size=2, shuffle=True, size_bucket=64)

    model = Detr(num_classes=5, num_queries=8, hidden_dim=32, nheads=4,
                 num_encoder_layers=1, num_decoder_layers=1,
                 dim_feedforward=64, dropout=0.0, backbone_norm="group")
    hist = fit_detection(
        model, loader, 1, val_loader=loader, num_classes=5,
        max_targets=8, verbose=False,
    )
    assert len(hist["loss"]) == 1 and np.isfinite(hist["loss"][0])
    assert "mAP" in hist["metrics"][0]


def test_fit_detection_with_default_dropout(tmp_path):
    """Default DETR has dropout=0.1: the train step must supply a dropout
    rng (regression: fit_detection crashed with InvalidRngError)."""
    from tests.test_coco_utils import _write_tiny_coco
    from vision_transformers_tpu.models.object_detection import Detr
    from vision_transformers_tpu.training.detection import (
        DetectionLoader, fit_detection,
    )
    from vision_transformers_tpu.utils.coco.build_coco import CocoDetection
    from vision_transformers_tpu.utils.coco import transforms as T

    img_dir, ann_file = _write_tiny_coco(tmp_path, n_images=2)
    tr = T.Compose([
        T.RandomResize([64]), T.ToTensor(),
        T.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    ])
    ds = CocoDetection(img_dir, ann_file, transforms=tr)
    loader = DetectionLoader(ds, batch_size=2)
    model = Detr(num_classes=5, num_queries=4, hidden_dim=32, nheads=4,
                 num_encoder_layers=1, num_decoder_layers=1,
                 dim_feedforward=32, dropout=0.1,  # dropout ACTIVE
                 backbone_norm="group")
    hist = fit_detection(model, loader, 1, num_classes=5, max_targets=4,
                         verbose=False)
    assert np.isfinite(hist["loss"][0])
