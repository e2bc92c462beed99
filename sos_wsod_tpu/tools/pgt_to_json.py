"""Convert VOC comp-style detection txt results into a COCO-format
pseudo-ground-truth JSON.

Parity target: uwsod/projects/WSL/tools/convert_voc2007_pgt_json.py — per
category, read the predicted ``<comp_id>_<class>.txt`` (lines
``img_id score x1 y1 x2 y2``) and the VOC ``<class>_<split>.txt`` positive
list; keep the FIRST detection per (positive image, class); emit COCO
annotations with 1-based category ids, integer xywh boxes, iscrowd 0.
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Sequence

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor")

CATEGORIES = [
    {"supercategory": "none", "id": i + 1, "name": n}
    for i, n in enumerate(VOC_CLASSES)
]


def read_positive_ids(cls_txt_path: str) -> List[str]:
    """VOC ImageSets/Main/<class>_<split>.txt: lines 'img_id {1,-1,0}'."""
    pos = []
    with open(cls_txt_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2 and parts[1] == "1":
                pos.append(parts[0])
    return pos


def detections_to_annotations(
    det_txt_tmpl: str,          # e.g. ".../comp3_xxx_det_train_{}.txt"
    cls_txt_tmpl: str,          # e.g. ".../{}_train.txt"
    classes: Sequence[str] = VOC_CLASSES,
) -> List[dict]:
    """Reference generate_anno (:59-116): one (the first listed) box per
    positive image per class."""
    count = 0
    annotations = []
    for ci, name in enumerate(classes):
        pos_ids = set(read_positive_ids(cls_txt_tmpl.format(name)))
        used = set()
        with open(det_txt_tmpl.format(name)) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 6:
                    continue
                img_id = parts[0]
                x1, y1, x2, y2 = map(float, parts[2:6])
                if img_id not in pos_ids or img_id in used:
                    continue
                used.add(img_id)
                w, h = x2 - x1, y2 - y1
                annotations.append({
                    "area": int(w * h),
                    "image_id": img_id,
                    "bbox": [int(x1), int(y1), int(w), int(h)],
                    "iscrowd": 0,
                    "category_id": ci + 1,
                    "id": count,
                })
                count += 1
    return annotations


def image_infos(image_dir: str, ids: Sequence[str]) -> List[dict]:
    from PIL import Image

    infos = []
    for img_id in ids:
        path = os.path.join(image_dir, f"{img_id}.jpg")
        with Image.open(path) as im:
            w, h = im.size
        infos.append({"file_name": f"{img_id}.jpg", "height": h,
                      "width": w, "id": img_id})
    return infos


def build_coco_json(annotations: List[dict], images: List[dict]) -> dict:
    return {"images": images, "annotations": annotations,
            "categories": CATEGORIES, "type": "instance"}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--det-tmpl", required=True,
                    help="detection txt template with {} for the class name")
    ap.add_argument("--cls-tmpl", required=True,
                    help="VOC ImageSets Main txt template with {}")
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--split-txt", required=True,
                    help="ImageSets/Main/<split>.txt listing image ids")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    with open(args.split_txt) as f:
        ids = [line.split()[0] for line in f if line.strip()]
    anns = detections_to_annotations(args.det_tmpl, args.cls_tmpl)
    images = image_infos(args.image_dir, ids)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(build_coco_json(anns, images), f)
    print(f"wrote {len(anns)} annotations / {len(images)} images -> {args.out}")


if __name__ == "__main__":
    main()
