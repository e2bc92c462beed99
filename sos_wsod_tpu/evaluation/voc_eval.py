"""Pascal VOC AP / CorLoc evaluation (pure numpy, in-memory).

Parity target: uwsod/detectron2/evaluation/pascal_voc_evaluation.py:21-507 —
the official-matlab-mimicking voc_eval (+1 pixel convention, difficult
handling, 07 11-point metric), the CorLoc variant (:411), AP@[.50:.95:.05],
and the COCO-style detection-result JSON dump (1-based category_id) that forms
the stage-1 -> stage-2 interface (:89-118). Instead of round-tripping through
per-class text files, detections stay in memory; the text format's float
truncation ('%.3f' score, '%.1f' coords) is applied to keep outputs
bit-identical to the reference pipeline.
"""
from __future__ import annotations

import json
import os
from collections import OrderedDict, defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np


def voc_ap(rec: np.ndarray, prec: np.ndarray, use_07_metric: bool = False) -> float:
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = 0.0 if np.sum(rec >= t) == 0 else float(np.max(prec[rec >= t]))
            ap += p / 11.0
        return ap
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1]))


def _class_gt(annotations: Dict[str, dict], classname_id: int):
    """annotations: image_id -> {'boxes': (N,4) 1-based, 'classes': (N,),
    'difficult': (N,)}. Returns per-image recs + npos (+ npos_im for CorLoc)."""
    class_recs = {}
    npos = 0
    npos_im = 0
    for image_id, ann in annotations.items():
        sel = np.asarray(ann["classes"]) == classname_id
        bbox = np.asarray(ann["boxes"], np.float64)[sel] if sel.any() else np.zeros((0, 4))
        difficult = np.asarray(ann["difficult"], bool)[sel] if sel.any() else np.zeros(0, bool)
        npos += int((~difficult).sum())
        if sel.any():
            npos_im += min(1, int((~difficult).sum()))
        class_recs[str(image_id)] = {
            "bbox": bbox, "difficult": difficult, "det": [False] * int(sel.sum())
        }
    return class_recs, npos, npos_im


def _overlaps_voc(bbgt: np.ndarray, bb: np.ndarray) -> np.ndarray:
    """VOC IoU with the +1 pixel convention (pascal_voc_evaluation.py:~360)."""
    ixmin = np.maximum(bbgt[:, 0], bb[0])
    iymin = np.maximum(bbgt[:, 1], bb[1])
    ixmax = np.minimum(bbgt[:, 2], bb[2])
    iymax = np.minimum(bbgt[:, 3], bb[3])
    iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
    ih = np.maximum(iymax - iymin + 1.0, 0.0)
    inters = iw * ih
    uni = (
        (bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0)
        + (bbgt[:, 2] - bbgt[:, 0] + 1.0) * (bbgt[:, 3] - bbgt[:, 1] + 1.0)
        - inters
    )
    return inters / uni


def voc_eval(
    detections: List[tuple],
    annotations: Dict[str, dict],
    classname_id: int,
    ovthresh: float = 0.5,
    use_07_metric: bool = False,
):
    """detections: list of (image_id, score, x1, y1, x2, y2) for ONE class,
    coordinates already in the evaluator's 1-based text convention."""
    class_recs, npos, _ = _class_gt(annotations, classname_id)
    if not detections:
        return np.zeros(0), np.zeros(0), 0.0
    confidence = np.array([d[1] for d in detections], np.float64)
    bb_all = np.array([d[2:6] for d in detections], np.float64)
    image_ids = [str(d[0]) for d in detections]
    order = np.argsort(-confidence)
    bb_all = bb_all[order]
    image_ids = [image_ids[i] for i in order]

    nd = len(image_ids)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    for d in range(nd):
        r = class_recs[image_ids[d]]
        bbgt = r["bbox"]
        ovmax, jmax = -np.inf, -1
        if bbgt.size > 0:
            overlaps = _overlaps_voc(bbgt, bb_all[d])
            ovmax = float(np.max(overlaps))
            jmax = int(np.argmax(overlaps))
        if ovmax > ovthresh:
            if not r["difficult"][jmax]:
                if not r["det"][jmax]:
                    tp[d] = 1.0
                    r["det"][jmax] = True
                else:
                    fp[d] = 1.0
        else:
            fp[d] = 1.0
    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    rec = tp / float(max(npos, 1))
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return rec, prec, voc_ap(rec, prec, use_07_metric)


def voc_eval_corloc(
    detections: List[tuple],
    annotations: Dict[str, dict],
    classname_id: int,
    ovthresh: float = 0.5,
) -> float:
    """Correct-localization: fraction of images containing the class whose
    single most-confident detection hits a GT (pascal_voc_evaluation.py:411)."""
    class_recs, _, npos_im = _class_gt(annotations, classname_id)
    if not detections or npos_im == 0:
        return 0.0
    confidence = np.array([d[1] for d in detections], np.float64)
    order = np.argsort(-confidence)
    dets = [detections[i] for i in order]
    t_ids, f_ids = [], []
    for d in dets:
        image_id = str(d[0])
        if image_id in t_ids or image_id in f_ids:
            continue
        r = class_recs[image_id]
        if len(r["difficult"]) and bool(np.all(r["difficult"])):
            continue
        if len(r["difficult"]) == 0:
            continue
        ovmax = -np.inf
        if r["bbox"].size > 0:
            ovmax = float(np.max(_overlaps_voc(r["bbox"], np.asarray(d[2:6], np.float64))))
        (t_ids if ovmax > ovthresh else f_ids).append(image_id)
    return 1.0 * len(t_ids) / npos_im


class PascalVOCDetectionEvaluator:
    """Accumulates per-image detections, computes AP@[.50:.95], CorLoc, and
    optionally dumps the detection-result JSON consumed by tools/pgf.py."""

    def __init__(
        self,
        dataset_name: str,
        annotations: Optional[Dict[str, dict]] = None,
        class_names: Optional[Sequence[str]] = None,
        year: int = 2007,
        save_detection_result: bool = False,
        save_path: str = "",
        eval_corloc: bool = True,
    ):
        self._dataset_name = dataset_name
        if annotations is None or class_names is None:
            from ..data.catalog import DatasetCatalog, MetadataCatalog

            meta = MetadataCatalog.get(dataset_name)
            class_names = class_names or list(meta.thing_classes)
            year = int(meta.get("year", year))
            if annotations is None:
                annotations = annotations_from_dataset_dicts(
                    DatasetCatalog.get(dataset_name), meta.get("dirname"),
                )
        self._annotations = annotations
        self._class_names = list(class_names)
        self._is_2007 = int(year) == 2007
        self.save_detection_result = save_detection_result
        self.save_path = save_path
        self.eval_corloc = eval_corloc
        self.reset()

    def reset(self):
        self._predictions = defaultdict(list)  # class id -> prediction tuples

    def process_single(self, image_id, boxes, scores, classes, valid=None):
        """boxes: (N,4) XYXY 0-based in the ORIGINAL image size."""
        boxes = np.asarray(boxes, np.float64)
        scores = np.asarray(scores, np.float64)
        classes = np.asarray(classes, np.int64)
        if valid is None:
            valid = np.ones(len(scores), bool)
        for box, score, cls, v in zip(boxes, scores, classes, np.asarray(valid, bool)):
            if not v:
                continue
            x1, y1, x2, y2 = box
            # inverse of the -1 shift at load time (+ text-format rounding)
            self._predictions[int(cls)].append(
                (
                    str(image_id),
                    float(f"{score:.3f}"),
                    float(f"{x1 + 1:.1f}"),
                    float(f"{y1 + 1:.1f}"),
                    float(f"{x2:.1f}"),
                    float(f"{y2:.1f}"),
                )
            )

    def evaluate(self) -> "OrderedDict[str, dict]":
        if self.save_detection_result:
            tide_result = []
            for cls_id in range(len(self._class_names)):
                for (image_id, score, x1, y1, x2, y2) in self._predictions.get(cls_id, []):
                    tide_result.append(
                        {
                            "image_id": int(image_id),
                            "category_id": cls_id + 1,
                            "score": score,
                            "bbox": [x1, y1, x2, y2],
                        }
                    )
            path = self.save_path.format(self._dataset_name)
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "w") as f:
                json.dump(tide_result, f)

        aps = defaultdict(list)
        corlocs = defaultdict(list)
        for cls_id, _ in enumerate(self._class_names):
            dets = self._predictions.get(cls_id, [])
            for thresh in range(50, 100, 5):
                _, _, ap = voc_eval(
                    dets, self._annotations, cls_id, thresh / 100.0, self._is_2007
                )
                aps[thresh].append(ap * 100)
                if self.eval_corloc:
                    corlocs[thresh].append(
                        voc_eval_corloc(dets, self._annotations, cls_id, thresh / 100.0) * 100
                    )
        ret = OrderedDict()
        mAP = {iou: np.mean(x) for iou, x in aps.items()}
        ret["bbox"] = {
            "AP": float(np.mean(list(mAP.values()))),
            "AP50": float(mAP[50]),
            "AP75": float(mAP[75]),
        }
        if self.eval_corloc:
            mCL = {iou: np.mean(x) for iou, x in corlocs.items()}
            ret["corloc"] = {
                "CorLoc": float(np.mean(list(mCL.values()))),
                "CorLoc50": float(mCL[50]),
                "CorLoc75": float(mCL[75]),
            }
        return ret


def annotations_from_dataset_dicts(dataset_dicts: List[dict], dirname=None) -> Dict[str, dict]:
    """Build the evaluator's GT mapping. Prefers the XML files (they carry the
    'difficult' flag that the dataset loader drops); falls back to the loaded
    annotations."""
    import xml.etree.ElementTree as ET

    from ..data.datasets.voc import CLASS_NAMES

    out = {}
    for d in dataset_dicts:
        image_id = str(d["image_id"])
        xml_path = None
        if dirname is not None:
            xml_path = os.path.join(dirname, "Annotations", image_id + ".xml")
        if xml_path and os.path.isfile(xml_path):
            tree = ET.parse(xml_path)
            boxes, classes, difficult = [], [], []
            for obj in tree.findall("object"):
                bb = obj.find("bndbox")
                boxes.append(
                    [int(bb.find(x).text) for x in ("xmin", "ymin", "xmax", "ymax")]
                )
                classes.append(CLASS_NAMES.index(obj.find("name").text))
                difficult.append(int(obj.find("difficult").text))
            out[image_id] = {
                "boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
                "classes": np.asarray(classes, np.int64),
                "difficult": np.asarray(difficult, bool),
            }
        else:
            ann = d.get("annotations", [])
            out[image_id] = {
                # dataset dicts are 0-based; evaluator convention is 1-based xmin/ymin
                "boxes": np.asarray(
                    [[a["bbox"][0] + 1, a["bbox"][1] + 1, a["bbox"][2], a["bbox"][3]]
                     for a in ann], np.float64,
                ).reshape(-1, 4),
                "classes": np.asarray([a["category_id"] for a in ann], np.int64),
                "difficult": np.asarray([a.get("difficult", False) for a in ann], bool),
            }
    return out
