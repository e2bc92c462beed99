"""PGF: pseudo-ground-truth filtering of stage-1 detection results.

Parity target: reference tools/pgf.py (class_filter :273-290, pgf :221-269,
contain_cal :209-219, main :295-315) — byte-identical output JSONs given the
same detection-result inputs. The filtering logic is pure host-side list
manipulation; only the dataset-dict source differs (our catalog instead of
detectron2's).

Pipeline position: stage-1 evaluator JSON dump -> pgf -> pseudo-label JSONs
consumed by load_voc_instances_wsl (stage 2).
"""
from __future__ import annotations

import copy
import json
import os
from typing import Dict, List

# VOC classes the reference treats as "difficult" for containment suppression
# (bottle, bus, car, chair, cow, pottedplant, sheep) — pgf.py:99
DIFF_CLASSES = [4, 5, 6, 8, 9, 15, 16]


def contain_cal(a_, b_) -> float:
    """Containment of box a inside box b.

    Reference quirk reproduced exactly (pgf.py:209-219): although detection
    bboxes are XYXY, contain_cal treats them as XYWH and adds x1/y1 onto
    x2/y2 before intersecting. Parity requires identical arithmetic.
    """
    a = copy.deepcopy(a_)
    b = copy.deepcopy(b_)
    a[2] += a[0]
    a[3] += a[1]
    b[2] += b[0]
    b[3] += b[1]
    c = [max(a[0], b[0]), max(a[1], b[1]), min(a[2], b[2]), min(a[3], b[3])]
    area_c = max(0, c[2] - c[0]) * max(0, c[3] - c[1])
    area_a = max(0, a[2] - a[0]) * max(0, a[3] - a[1])
    return area_c / (area_a + 1e-6)


def class_filter(result: Dict, class_dict: Dict, split: str) -> None:
    """Drop detections whose class is not among the image's labels (pgf.py:273-290)."""
    length = sum(len(v) for v in result.values())
    print(f"{split} split length before multi-class filter: {length}")
    for img_id in result:
        predictions = result[img_id]
        gt_classes = class_dict[img_id]
        drop_list = [i for i, p in enumerate(predictions) if p["category_id"] not in gt_classes]
        for i in drop_list[::-1]:
            predictions.pop(i)
    length = sum(len(v) for v in result.values())
    print(f"{split} split length after multi-class filter: {length}")


def pgf(result: Dict, split: str, t_con: float, t_keep: float, use_diff: bool,
        diff_classes: List[int]) -> None:
    """Two-pass filter (pgf.py:221-269):
    1. per image, the FIRST detection of each class is always kept; later
       same-class detections need score >= t_keep;
    2. drop box i if >= t_con of it is contained in another same-class box
       (skipped for 'difficult' classes unless use_diff)."""
    length = sum(len(v) for v in result.values())
    print(f"{split} split length before pgf: {length}")

    for img_id in result:
        predictions = result[img_id]
        seen: List[int] = []
        drop_list = []
        for i, p in enumerate(predictions):
            c = p["category_id"]
            if c not in seen:
                seen.append(c)
                continue
            if p["score"] < t_keep:
                drop_list.append(i)
        for i in drop_list[::-1]:
            predictions.pop(i)

    length = sum(len(v) for v in result.values())
    print(f"{split} split length in middle of pgf: {length}")

    for img_id in result:
        anns = result[img_id]
        save = [True] * len(anns)
        bboxes = [b["bbox"] for b in anns]
        cats = [b["category_id"] for b in anns]
        for b_i in range(len(save)):
            for b_j in range(len(save)):
                if b_i == b_j or cats[b_i] != cats[b_j]:
                    continue
                if not use_diff and cats[b_i] in diff_classes:
                    continue
                if contain_cal(bboxes[b_i], bboxes[b_j]) >= t_con:
                    save[b_i] = False
        result[img_id] = [copy.deepcopy(anns[j]) for j in range(len(save)) if save[j]]

    length = sum(len(v) for v in result.values())
    print(f"{split} split length after pgf: {length}")


def build_result_and_labels(dataset_dicts: List[dict], detection_result: List[dict]):
    """Group a detection-result JSON by image id (shifting category_id to
    0-based, pgf.py:49-67) and collect per-image multi-class labels."""
    gt_anns = {int(d["image_id"]): d["annotations"] for d in dataset_dicts}
    result: Dict[int, List[dict]] = {}
    for message in detection_result:
        image_id = message["image_id"]
        message["category_id"] = message["category_id"] - 1
        if image_id not in gt_anns:
            continue
        result.setdefault(image_id, []).append(message)
    class_dict = {}
    for img_id, anns in gt_anns.items():
        classes: List[int] = []
        for ann in anns:
            c = ann["category_id"]
            if c not in classes:
                classes.append(c)
        class_dict[img_id] = classes
    return result, class_dict


def pgf_voc(det_path: str, save_path: str, prefix: str, t_con: float, t_keep: float,
            use_diff: bool, year: str, data_root: str = "datasets") -> None:
    from ..data.catalog import DatasetCatalog
    from ..data.datasets.voc import register_all_voc

    register_all_voc(data_root)
    for split in ("train", "val"):
        dataset = DatasetCatalog.get(f"voc_{year}_{split}")
        with open(f"{det_path}/{prefix}voc_{year}_{split}.json") as f:
            detection_result = json.load(f)
        result, class_dict = build_result_and_labels(dataset, detection_result)
        class_filter(result, class_dict, split)
        pgf(result, split, t_con, t_keep, use_diff, DIFF_CLASSES)
        with open(f"{save_path}/{prefix}voc_{year}_{split}.json", "w") as f:
            json.dump(result, f)


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser("Perform PGF.")
    parser.add_argument("--det-path", default="datasets/VOC2007/detection_results/")
    parser.add_argument("--save-path", default="datasets/VOC2007/pseudo_labels/")
    parser.add_argument("--prefix", default="oicr_plus_")
    parser.add_argument("--dataset", default="voc2007", choices=("voc2007", "voc2012", "coco"))
    parser.add_argument("--coco-path", default="datasets/coco/")
    parser.add_argument("--data-root", default="datasets")
    parser.add_argument("--t-con", default=0.85, type=float)
    parser.add_argument("--t-keep", default=0.2, type=float)
    parser.add_argument("--use-diff", action="store_true")
    args = parser.parse_args(argv)

    os.makedirs(args.save_path, exist_ok=True)
    if "voc" in args.dataset:
        pgf_voc(args.det_path, args.save_path, args.prefix, args.t_con, args.t_keep,
                args.use_diff, args.dataset[3:], args.data_root)
    elif args.dataset == "coco":
        from ..data.datasets.coco import pgf_coco_datasets

        pgf_coco_datasets(args.det_path, args.save_path, args.prefix, args.t_con,
                          args.t_keep, args.use_diff, args.coco_path)
    else:
        raise ValueError(f"{args.dataset} is not supported.")


if __name__ == "__main__":
    main()
