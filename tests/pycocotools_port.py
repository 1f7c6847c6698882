"""Test-only faithful port of pycocotools' COCOeval bbox protocol.

A minimal, line-faithful re-implementation of the CANONICAL matching and
accumulation loops from pycocotools/cocoeval.py (evaluateImg + accumulate
+ the bbox iou with crowd semantics from maskUtils.iou), used ONLY as the
oracle for fuzzing vision_transformers_tpu/utils/coco/coco_eval.py —
the reference's protocol authority is pycocotools' C extension
(/root/reference/utils/load_data.py:3), which is not installable here.

Deliberately mirrors the canonical control flow (loops, tie rules,
mergesort stability, the 1-1e-10 cap, dtIg propagation) rather than being
vectorized, so divergences in the production evaluator are attributable.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = (1, 10, 100)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32 ** 2),
    "medium": (32 ** 2, 96 ** 2),
    "large": (96 ** 2, 1e10),
}


def bbox_iou(dts, gts, iscrowd):
    """maskUtils.iou for bbox: IoU, except intersection/det-area for crowd."""
    if len(dts) == 0 or len(gts) == 0:
        return np.zeros((len(dts), len(gts)))
    ious = np.zeros((len(dts), len(gts)))
    for di, d in enumerate(dts):
        da = (d[2] - d[0]) * (d[3] - d[1])
        for gi, g in enumerate(gts):
            ga = (g[2] - g[0]) * (g[3] - g[1])
            iw = min(d[2], g[2]) - max(d[0], g[0])
            ih = min(d[3], g[3]) - max(d[1], g[1])
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = da if iscrowd[gi] else da + ga - inter
            ious[di, gi] = inter / union if union > 0 else 0.0
    return ious


def evaluate_img(gt_boxes, gt_crowd, dt_boxes, dt_scores, area_rng, max_det):
    """cocoeval.COCOeval.evaluateImg, bbox, one (img, cat, area, maxdet).

    Returns dict with dtMatches (T, D), dtIgnore (T, D), gtIgnore (G,),
    dtScores (D,) — the fields accumulate() consumes.
    """
    gt_area = (gt_boxes[:, 2] - gt_boxes[:, 0]) * \
        (gt_boxes[:, 3] - gt_boxes[:, 1]) if len(gt_boxes) else np.zeros(0)
    # _prepare: gt['ignore'] = iscrowd; evaluateImg: _ignore |= area outside
    g_ig = np.array(
        [bool(c) or a < area_rng[0] or a > area_rng[1]
         for c, a in zip(gt_crowd, gt_area)], dtype=bool)
    gtind = np.argsort(g_ig.astype(np.int8), kind="mergesort")
    gt_boxes = gt_boxes[gtind]
    gt_crowd = np.asarray(gt_crowd, bool)[gtind]
    g_ig = g_ig[gtind]

    dtind = np.argsort(-dt_scores, kind="mergesort")[:max_det]
    dt_boxes = dt_boxes[dtind]
    dt_scores = dt_scores[dtind]
    dt_area = (dt_boxes[:, 2] - dt_boxes[:, 0]) * \
        (dt_boxes[:, 3] - dt_boxes[:, 1]) if len(dt_boxes) else np.zeros(0)

    ious = bbox_iou(dt_boxes, gt_boxes, gt_crowd)

    T, G, D = len(IOU_THRS), len(gt_boxes), len(dt_boxes)
    gtm = np.zeros((T, G), dtype=np.int64)   # 1-based det id, 0 = unmatched
    dtm = np.zeros((T, D), dtype=np.int64)   # 1-based gt id, 0 = unmatched
    dt_ig = np.zeros((T, D), dtype=bool)
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                if gtm[tind, gind] > 0 and not gt_crowd[gind]:
                    continue
                if m > -1 and not g_ig[m] and g_ig[gind]:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig[tind, dind] = g_ig[m]
            dtm[tind, dind] = m + 1
            gtm[tind, m] = dind + 1
        out_of_rng = (dt_area < area_rng[0]) | (dt_area > area_rng[1])
        dt_ig[tind] = dt_ig[tind] | ((dtm[tind] == 0) & out_of_rng)

    return {"dtMatches": dtm, "dtIgnore": dt_ig, "gtIgnore": g_ig,
            "dtScores": dt_scores}


def evaluate(groundtruths, predictions):
    """COCOeval.evaluate + accumulate + summarize (bbox), same input dicts
    as coco_eval.evaluate_detections; returns the same metric keys."""
    cats = sorted({int(c) for g in groundtruths.values()
                   for c in np.asarray(g["labels"]).tolist()})
    img_ids = sorted(groundtruths.keys())
    area_names = list(AREA_RANGES)

    # evalImgs[k][a][m][img] — evaluate per (cat, area, maxdet, img)
    eval_imgs = {}
    for cat in cats:
        for a_name, a_rng in AREA_RANGES.items():
            for md in MAX_DETS:
                for img in img_ids:
                    g = groundtruths[img]
                    gm = np.asarray(g["labels"]) == cat
                    gb = np.asarray(g["boxes"], np.float64)[gm]
                    gc = (np.asarray(g["iscrowd"])[gm]
                          if "iscrowd" in g else np.zeros(gm.sum()))
                    p = predictions.get(img)
                    if p is None:
                        pb = np.zeros((0, 4))
                        ps = np.zeros(0)
                    else:
                        pm = np.asarray(p["labels"]) == cat
                        pb = np.asarray(p["boxes"], np.float64)[pm]
                        ps = np.asarray(p["scores"], np.float64)[pm]
                    eval_imgs[(cat, a_name, md, img)] = evaluate_img(
                        gb, gc, pb, ps, a_rng, md)

    T, R = len(IOU_THRS), len(RECALL_THRS)
    K, A, M = len(cats), len(area_names), len(MAX_DETS)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k, cat in enumerate(cats):
        for a, a_name in enumerate(area_names):
            for m, md in enumerate(MAX_DETS):
                es = [eval_imgs[(cat, a_name, md, i)] for i in img_ids]
                scores = np.concatenate([e["dtScores"] for e in es])
                inds = np.argsort(-scores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtMatches"] for e in es], axis=1)[:, inds]
                dt_ig = np.concatenate(
                    [e["dtIgnore"] for e in es], axis=1)[:, inds]
                gt_ig = np.concatenate([e["gtIgnore"] for e in es])
                npig = int((~gt_ig).sum())
                if npig == 0:
                    continue
                tps = (dtm > 0) & ~dt_ig
                fps = (dtm == 0) & ~dt_ig
                tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                for t in range(T):
                    tp, fp = tp_sum[t], fp_sum[t]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    recall[t, k, a, m] = rc[-1] if nd else 0
                    q = np.zeros(R)
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds_r = np.searchsorted(rc, RECALL_THRS, side="left")
                    for ri, pi in enumerate(inds_r):
                        if pi < nd:
                            q[ri] = pr[pi]
                    precision[t, :, k, a, m] = q

    def _summ(ap, iou_thr=None, area="all", max_det=100):
        a = area_names.index(area)
        m = MAX_DETS.index(max_det)
        if ap:
            s = precision[:, :, :, a, m]
            if iou_thr is not None:
                s = s[[np.where(np.isclose(IOU_THRS, iou_thr))[0][0]]]
        else:
            s = recall[:, :, a, m]
            if iou_thr is not None:
                s = s[[np.where(np.isclose(IOU_THRS, iou_thr))[0][0]]]
        s = s[s > -1]
        return float(s.mean()) if s.size else 0.0

    return {
        "mAP": _summ(True),
        "AP50": _summ(True, 0.5),
        "AP75": _summ(True, 0.75),
        "AR@1": _summ(False, max_det=1),
        "AR@10": _summ(False, max_det=10),
        "AR@100": _summ(False, max_det=100),
        "AP_small": _summ(True, area="small"),
        "AP_medium": _summ(True, area="medium"),
        "AP_large": _summ(True, area="large"),
    }
