"""COCOeval protocol-corner fixtures with hand-computed expectations.

pycocotools is not installable in this environment, so these pin the
canonical COCOeval semantics (cocodataset/cocoapi pycocotools/cocoeval.py,
evaluateImg) on hand-constructed cases where home-grown evaluators silently
diverge: crowd multi-match, non-crowd single-match (extra dets are FPs),
score-tie stability, and real-over-ignored matching preference.
Reference dependency: /root/reference/utils/load_data.py:3 (pycocotools).
"""

import numpy as np

from vision_transformers_tpu.utils.coco.coco_eval import evaluate_detections


def _gt(boxes, labels=None, iscrowd=None):
    boxes = np.asarray(boxes, np.float64)
    d = {"boxes": boxes,
         "labels": np.asarray(labels if labels is not None
                              else [1] * len(boxes))}
    if iscrowd is not None:
        d["iscrowd"] = np.asarray(iscrowd, bool)
    return d


def _pred(boxes, scores, labels=None):
    boxes = np.asarray(boxes, np.float64)
    return {"boxes": boxes,
            "labels": np.asarray(labels if labels is not None
                                 else [1] * len(boxes)),
            "scores": np.asarray(scores, np.float64)}


def test_crowd_gt_absorbs_multiple_detections():
    """Crowd GTs are ignored and may be matched repeatedly; detections
    falling on them are neither TP nor FP. Two dets inside the crowd region
    (IoA=1) are both ignored, so the lone real TP yields AP=1.0."""
    gts = {0: _gt([[0, 0, 10, 10], [100, 100, 200, 200]],
                  iscrowd=[0, 1])}
    preds = {0: _pred(
        [[100, 100, 200, 200],      # exactly the crowd box → ignored
         [100, 100, 150, 200],      # inside the crowd (IoA=1) → ignored too
         [0, 0, 10, 10]],           # exact match of the real GT → TP
        [0.9, 0.8, 0.7])}
    m = evaluate_detections(gts, preds)
    assert m["mAP"] == 1.0
    assert m["AP50"] == 1.0


def test_non_crowd_ignored_gt_matches_at_most_once():
    """An area-ignored (non-crowd) GT matches at most ONE detection; a
    second high-scoring detection on it becomes an in-range FP in the
    'small' breakdown (ADVICE r1). Hand-computed AP_small = 0.5."""
    # G_small real in 'small' (area 100); G_big area 33.1^2≈1095.6 > 32^2.
    g_big = [100.0, 100.0, 133.1, 133.1]
    gts = {0: _gt([[0, 0, 10, 10], g_big])}
    # D1 = exact G_big → matched to the ignored GT, ignored at all thrs.
    # D2 area ≈ 1011 < 1024 (in 'small' range), IoU vs G_big ≈ 0.923:
    #   matches G_big for thr ≤ 0.9 — but G_big is taken → FP; at 0.95 it
    #   is unmatched and in-range → FP. FP at every threshold.
    d2 = [100.0, 100.0, 131.8, 131.8]
    preds = {0: _pred([g_big, d2, [0, 0, 10, 10]], [0.9, 0.8, 0.7])}
    m = evaluate_detections(gts, preds)
    # at each threshold: kept = [FP(0.8), TP(0.7)] → 101-pt AP = 0.5
    assert abs(m["AP_small"] - 0.5) < 1e-9


def test_score_ties_are_stable():
    """Equal scores keep input order (pycocotools sorts with mergesort).
    FP-then-TP at the same score → AP = 0.5, not 1.0."""
    gts = {0: _gt([[0, 0, 10, 10]])}
    preds = {0: _pred([[50, 50, 60, 60],     # FP, listed first
                       [0, 0, 10, 10]],      # TP
                      [0.5, 0.5])}
    m = evaluate_detections(gts, preds)
    assert abs(m["mAP"] - 0.5) < 1e-9


def test_detection_prefers_real_gt_over_better_ignored():
    """A det overlapping a real GT above threshold must match it even when
    an ignored (crowd) GT overlaps more — real GTs are scanned first and
    the scan stops before ignored ones once a real match exists."""
    # Real GT R; crowd C covers the det entirely (IoA = 1).
    r = [0.0, 0.0, 10.0, 10.0]
    det = [0.0, 0.0, 10.0, 14.0]  # IoU vs R = 100/140 ≈ 0.714
    gts = {0: _gt([r, [0, 0, 20, 20]], iscrowd=[0, 1])}
    preds = {0: _pred([det], [0.9])}
    m = evaluate_detections(gts, preds)
    # thr 0.5/0.55/.../0.7: TP (5 thrs); thr 0.75+: falls back to crowd →
    # ignored, recall 0 (5 thrs). AP = mean([1]*5 + [0]*5) = 0.5.
    assert abs(m["mAP"] - 0.5) < 1e-9
    assert m["AP50"] == 1.0


def test_unmatched_out_of_range_detection_is_ignored_in_area_breakdown():
    """In the 'small' slice, an unmatched LARGE detection is ignored, not an
    FP (it belongs to the 'large' slice)."""
    gts = {0: _gt([[0, 0, 10, 10]])}
    preds = {0: _pred([[200, 200, 300, 300],   # huge, unmatched
                       [0, 0, 10, 10]],
                      [0.9, 0.8])}
    m = evaluate_detections(gts, preds)
    assert m["AP_small"] == 1.0   # the big FP doesn't pollute 'small'
    assert m["mAP"] < 1.0         # but it IS an FP in 'all'


# ---------------------------------------------------------------------------
# r3 (VERDICT #7): randomized cross-check against a faithful pure-python
# port of pycocotools' evaluateImg/accumulate (tests/pycocotools_port.py).
# Fixtures encode the builder's reading of the spec; this checks the
# CANONICAL implementation's behavior on randomized scenes — crowds,
# ignored areas, score/IoU ties, empty images, missing predictions.
# ---------------------------------------------------------------------------

def _random_scene(seed):
    rng = np.random.RandomState(seed)
    n_imgs = rng.randint(1, 5)
    cats = list(range(1, rng.randint(2, 5)))
    gts, preds = {}, {}
    for img in range(n_imgs):
        n_gt = rng.randint(0, 6)
        g_boxes, g_labels, g_crowd = [], [], []
        for _ in range(n_gt):
            x0, y0 = rng.randint(0, 80, 2)
            # sizes spanning the small/medium/large boundaries (incl 32^2)
            w = int(rng.choice([5, 16, 32, 33, 50, 97, 120]))
            h = int(rng.choice([5, 16, 32, 33, 50, 97, 120]))
            g_boxes.append([x0, y0, x0 + w, y0 + h])
            g_labels.append(int(rng.choice(cats)))
            g_crowd.append(bool(rng.rand() < 0.25))
        gts[img] = {
            "boxes": np.array(g_boxes, float).reshape(len(g_boxes), 4),
            "labels": np.array(g_labels, np.int64),
            "iscrowd": np.array(g_crowd, bool),
        }
        if rng.rand() < 0.1:
            continue  # image with no predictions at all
        p_boxes, p_labels, p_scores = [], [], []
        for b, lab in zip(g_boxes, g_labels):
            if rng.rand() < 0.8:  # jittered copy of a GT box
                j = rng.randint(-8, 9, 4)
                x0, y0, x1, y1 = np.array(b) + j
                if x1 <= x0 or y1 <= y0:
                    continue
                p_boxes.append([x0, y0, x1, y1])
                p_labels.append(lab if rng.rand() < 0.8
                                else int(rng.choice(cats)))
                p_scores.append(round(float(rng.rand()), 1))  # forced ties
        for _ in range(rng.randint(0, 4)):  # noise boxes
            x0, y0 = rng.randint(0, 100, 2)
            w, h = rng.randint(3, 60, 2)
            p_boxes.append([x0, y0, x0 + w, y0 + h])
            p_labels.append(int(rng.choice(cats)))
            p_scores.append(round(float(rng.rand()), 1))
        if p_boxes:
            preds[img] = {
                "boxes": np.array(p_boxes, float),
                "labels": np.array(p_labels, np.int64),
                "scores": np.array(p_scores, float),
            }
    return gts, preds


def test_fuzz_against_pycocotools_port():
    from tests.pycocotools_port import evaluate as canonical_evaluate

    n_mismatch = 0
    for seed in range(300):
        gts, preds = _random_scene(seed)
        if not any(len(g["labels"]) for g in gts.values()):
            continue
        ours = evaluate_detections(gts, preds)
        ref = canonical_evaluate(gts, preds)
        for key in ref:
            if not np.isclose(ours[key], ref[key], atol=1e-7):
                n_mismatch += 1
                print(f"seed {seed} {key}: ours={ours[key]:.6f} "
                      f"canonical={ref[key]:.6f}")
                break
    assert n_mismatch == 0
