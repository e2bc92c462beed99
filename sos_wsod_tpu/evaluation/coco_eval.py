"""COCO-style detection evaluation in pure numpy (bbox only).

Parity target: the reference's COCOEvaluator + pycocotools COCOeval
(uwsod/detectron2/evaluation/coco_evaluation.py:39-200, vendored cocoeval C++
in uwsod/detectron2/layers/csrc/cocoeval). pycocotools is not available in
this image, so the bbox evaluation protocol is reimplemented: 10 IoU
thresholds .5:.05:.95, 101-point interpolated precision, area ranges
all/small/medium/large, maxDets 1/10/100, greedy per-image score-ordered
matching with gt-ignore semantics. Includes the fork's
``save_detection_result`` JSON dump hook (the stage-1 -> PGF interface for
COCO runs).
"""
from __future__ import annotations

import json
import os
from collections import OrderedDict, defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def bbox_iou_xyxy(dets: np.ndarray, gts: np.ndarray) -> np.ndarray:
    """(D, 4), (G, 4) -> (D, G) IoU (no +1 convention, like COCO)."""
    if dets.size == 0 or gts.size == 0:
        return np.zeros((dets.shape[0], gts.shape[0]))
    lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
    rb = np.minimum(dets[:, None, 2:], gts[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1])
    a2 = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    union = a1[:, None] + a2[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _evaluate_image(dets, det_scores, gts, gt_areas, area_rng, max_det,
                    gt_crowd=None):
    """Greedy matching for one (image, category). Returns (dtm (T, D),
    dt_ignore (T, D), gt_ignore (G,), scores (D,)) with D <= max_det.

    pycocotools semantics: area-range bounds are INCLUSIVE at the top
    (ignore iff area < lo or area > hi, cocoeval.py evaluateImg); crowd gts
    are ignore regions that may absorb any number of detections, with IoU
    measured as intersection-over-det-area (maskUtils.iou iscrowd flag)."""
    t = len(IOU_THRS)
    order = np.argsort(-det_scores, kind="mergesort")[:max_det]
    dets = dets[order]
    scores = det_scores[order]
    d = dets.shape[0]
    g = gts.shape[0]
    if gt_crowd is None:
        gt_crowd = np.zeros(g, bool)
    gt_ig = gt_crowd | (gt_areas < area_rng[0]) | (gt_areas > area_rng[1])
    # sort gts: non-ignored first (pycocotools gtind ordering)
    gind = np.argsort(gt_ig, kind="mergesort")
    gts = gts[gind]
    gt_ig = gt_ig[gind]
    gt_crowd = gt_crowd[gind]
    ious = bbox_iou_xyxy(dets, gts)
    if gt_crowd.any() and d:
        # crowd IoU = intersection / det area
        lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
        rb = np.minimum(dets[:, None, 2:], gts[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        darea = (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1])
        iou_crowd = np.where(darea[:, None] > 0, inter / np.maximum(darea[:, None], 1e-12), 0.0)
        ious = np.where(gt_crowd[None, :], iou_crowd, ious)
    dtm = np.zeros((t, d), dtype=np.int64) - 1
    gtm = np.zeros((t, g), dtype=np.int64) - 1
    for ti, thr in enumerate(IOU_THRS):
        for di in range(d):
            iou = min(thr, 1 - 1e-10)
            m = -1
            for gi in range(g):
                # a matched gt can only be re-matched if it is a crowd region
                if gtm[ti, gi] >= 0 and not gt_crowd[gi]:
                    continue
                # best non-ignored match found and this gt is ignored: stop
                if m > -1 and not gt_ig[m] and gt_ig[gi]:
                    break
                if ious[di, gi] < iou:
                    continue
                iou = ious[di, gi]
                m = gi
            if m > -1:
                dtm[ti, di] = m
                gtm[ti, m] = di
    # det ignored if matched to an ignored gt, or unmatched with area outside rng
    det_areas = (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1])
    out_of_rng = (det_areas < area_rng[0]) | (det_areas > area_rng[1])
    dt_ig = np.zeros((t, d), dtype=bool)
    for ti in range(t):
        matched = dtm[ti] >= 0
        ig_match = np.zeros(d, bool)
        ig_match[matched] = gt_ig[dtm[ti][matched]]
        dt_ig[ti] = ig_match | (~matched & out_of_rng)
    return dtm, dt_ig, gt_ig, scores


def _accumulate(per_image, num_gt_nonignore):
    """per_image: list of (dtm, dt_ig, scores); returns (precision (T, R),
    recall (T,))."""
    t = len(IOU_THRS)
    if num_gt_nonignore == 0:
        return None, None
    if per_image:
        all_scores = np.concatenate([s for _, _, s in per_image])
        order = np.argsort(-all_scores, kind="mergesort")
        dtm = np.concatenate([m for m, _, _ in per_image], axis=1)[:, order]
        dt_ig = np.concatenate([i for _, i, _ in per_image], axis=1)[:, order]
    else:
        dtm = np.zeros((t, 0), np.int64)
        dt_ig = np.zeros((t, 0), bool)
    tps = (dtm >= 0) & ~dt_ig
    fps = (dtm < 0) & ~dt_ig
    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
    precision = np.zeros((t, len(REC_THRS)))
    recall = np.zeros(t)
    for ti in range(t):
        tp = tp_sum[ti]
        fp = fp_sum[ti]
        rc = tp / num_gt_nonignore
        pr = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
        recall[ti] = rc[-1] if rc.size else 0.0
        # interpolate precision (monotone decreasing envelope)
        pr = pr.tolist()
        for i in range(len(pr) - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds = np.searchsorted(rc, REC_THRS, side="left")
        for ri, pi in enumerate(inds):
            if pi < len(pr):
                precision[ti, ri] = pr[pi]
    return precision, recall


class COCOEvaluator:
    """In-memory COCO bbox evaluator with the WSODEVAL dump hook."""

    def __init__(
        self,
        dataset_name: str,
        annotations: Optional[Dict] = None,
        num_classes: Optional[int] = None,
        save_detection_result: bool = False,
        save_path: str = "",
    ):
        self._dataset_name = dataset_name
        if annotations is None:
            from ..data.catalog import DatasetCatalog

            annotations = {}
            for d in DatasetCatalog.get(dataset_name):
                anns = d.get("annotations", [])
                boxes = np.asarray([a["bbox"] for a in anns], np.float64).reshape(-1, 4)
                classes = np.asarray([a["category_id"] for a in anns], np.int64)
                areas = np.asarray(
                    [a.get("area", (a["bbox"][2] - a["bbox"][0]) * (a["bbox"][3] - a["bbox"][1]))
                     for a in anns], np.float64,
                )
                crowd = np.asarray([bool(a.get("iscrowd", 0)) for a in anns], bool)
                annotations[d["image_id"]] = {
                    "boxes": boxes, "classes": classes, "areas": areas, "crowd": crowd,
                }
        self._annotations = annotations
        if num_classes is None:
            num_classes = 1 + max(
                (int(a["classes"].max()) for a in annotations.values() if a["classes"].size),
                default=0,
            )
        self._num_classes = num_classes
        self.save_detection_result = save_detection_result
        self.save_path = save_path
        self.reset()

    def reset(self):
        self._dets = defaultdict(lambda: defaultdict(list))  # image -> cls -> (box, score)

    def process_single(self, image_id, boxes, scores, classes, valid=None):
        boxes = np.asarray(boxes, np.float64)
        scores = np.asarray(scores, np.float64)
        classes = np.asarray(classes, np.int64)
        if valid is None:
            valid = np.ones(len(scores), bool)
        for box, score, cls, v in zip(boxes, scores, classes, np.asarray(valid, bool)):
            if v:
                self._dets[image_id][int(cls)].append((box, float(score)))

    def evaluate(self) -> OrderedDict:
        if self.save_detection_result:
            dump = []
            for image_id, per_cls in self._dets.items():
                for cls, items in per_cls.items():
                    for box, score in items:
                        dump.append({
                            "image_id": int(image_id) if str(image_id).isdigit() else image_id,
                            "category_id": cls + 1,
                            "score": round(score, 3),
                            "bbox": [round(float(c), 1) for c in box],
                        })
            path = self.save_path.format(self._dataset_name)
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "w") as f:
                json.dump(dump, f)

        image_ids = list(self._annotations.keys())
        stats = {}
        for area_name, rng in AREA_RNG.items():
            max_det = 100
            precisions = []  # per class
            recalls = []
            for cls in range(self._num_classes):
                per_image = []
                n_gt = 0
                for image_id in image_ids:
                    ann = self._annotations[image_id]
                    sel = ann["classes"] == cls
                    gts = ann["boxes"][sel]
                    gt_areas = ann["areas"][sel]
                    gt_crowd = ann.get("crowd")
                    gt_crowd = gt_crowd[sel] if gt_crowd is not None else None
                    items = self._dets.get(image_id, {}).get(cls, [])
                    dets = np.asarray([b for b, _ in items], np.float64).reshape(-1, 4)
                    dscores = np.asarray([s for _, s in items], np.float64)
                    if gts.size == 0 and dets.size == 0:
                        continue
                    dtm, dt_ig, gt_ig, sc = _evaluate_image(
                        dets, dscores, gts, gt_areas, rng, max_det, gt_crowd
                    )
                    n_gt += int((~gt_ig).sum())
                    per_image.append((dtm, dt_ig, sc))
                p, r = _accumulate(per_image, n_gt)
                if p is not None:
                    precisions.append(p)
                    recalls.append(r)
            if precisions:
                p = np.stack(precisions)  # (C, T, R)
                stats[area_name] = p
            else:
                stats[area_name] = None

        def ap(area="all", iou=None):
            p = stats[area]
            if p is None:
                return float("nan")
            if iou is not None:
                ti = int(np.argmin(np.abs(IOU_THRS - iou)))
                p = p[:, ti : ti + 1]
            vals = p[p > -1]
            return float(np.mean(vals) * 100) if vals.size else float("nan")

        ret = OrderedDict()
        ret["bbox"] = {
            "AP": ap(),
            "AP50": ap(iou=0.5),
            "AP75": ap(iou=0.75),
            "APs": ap("small"),
            "APm": ap("medium"),
            "APl": ap("large"),
        }
        return ret
