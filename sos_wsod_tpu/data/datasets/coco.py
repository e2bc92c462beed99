"""COCO JSON dataset loading (pure-json, no pycocotools dependency).

Parity targets: detectron2 load_coco_json / register_coco_instances
(detectron2/detectron2/data/datasets/coco.py) and the fork's WSL pseudo-label
variant register_coco_instances_wsl plus unlabeled-COCO registration
(unbias/ubteacher/data/datasets/builtin.py:14-105). Dataset dicts use the d2
schema with XYXY_ABS boxes; contiguous category-id remapping mirrors d2's
``thing_dataset_id_to_contiguous_id``.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional

from ..catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger(__name__)

# the 80 thing classes in contiguous order (builtin_meta.py COCO_CATEGORIES)
COCO_CLASS_NAMES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
)


def load_coco_json(json_file: str, image_root: str, dataset_name: Optional[str] = None) -> List[dict]:
    with open(json_file) as f:
        coco = json.load(f)
    cats = sorted(coco.get("categories", []), key=lambda c: c["id"])
    cat_ids = [c["id"] for c in cats]
    id_map = {cid: i for i, cid in enumerate(cat_ids)}
    if dataset_name is not None:
        meta = MetadataCatalog.get(dataset_name)
        meta.set(
            thing_classes=[c["name"] for c in cats],
            thing_dataset_id_to_contiguous_id=id_map,
            json_file=json_file,
            image_root=image_root,
        )

    anns_by_image: Dict[int, List[dict]] = {}
    for ann in coco.get("annotations", []):
        anns_by_image.setdefault(ann["image_id"], []).append(ann)

    dicts = []
    for img in coco["images"]:
        rec = {
            "file_name": os.path.join(image_root, img["file_name"]),
            "image_id": img["id"],
            "height": img["height"],
            "width": img["width"],
        }
        objs = []
        for ann in anns_by_image.get(img["id"], []):
            # crowd annotations are kept (they act as ignore regions in the
            # evaluator, like d2/pycocotools); training mappers filter them
            x, y, w, h = ann["bbox"]  # COCO XYWH -> XYXY
            objs.append(
                {
                    "category_id": id_map.get(ann["category_id"], ann["category_id"]),
                    "bbox": [x, y, x + w, y + h],
                    "iscrowd": ann.get("iscrowd", 0),
                    "area": ann.get("area", w * h),
                }
            )
        rec["annotations"] = objs
        dicts.append(rec)
    return dicts


def load_coco_instances_wsl(json_file: str, image_root: str, pseudo_label_file: str) -> List[dict]:
    """COCO images with pseudo labels from a PGF JSON {img_id: [dets]}
    (fork's register_coco_instances_wsl path)."""
    dicts = load_coco_json(json_file, image_root)
    with open(pseudo_label_file) as f:
        pseudo = json.load(f)
    multi_label = pseudo.pop("multi_label", None)
    out = []
    for d in dicts:
        key = str(d["image_id"])
        if key not in pseudo:
            continue
        r = dict(d)
        r["annotations"] = [
            {"category_id": obj["category_id"], "bbox": [int(i) for i in obj["bbox"]]}
            for obj in pseudo[key]
        ]
        if multi_label is not None:
            r["multi_label"] = multi_label.get(key, [])
        out.append(r)
    return out


def register_coco_instances(name: str, json_file: str, image_root: str):
    DatasetCatalog.register(name, lambda: load_coco_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="coco"
    )


def register_coco_instances_wsl(name: str, json_file: str, image_root: str, pseudo_label_file: str):
    DatasetCatalog.register(
        name, lambda: load_coco_instances_wsl(json_file, image_root, pseudo_label_file)
    )
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="coco"
    )


def register_coco_unlabel(name: str, json_file: str, image_root: str):
    """Unlabeled COCO (ubteacher builtin.py register_coco_unlabel)."""

    def load():
        with open(json_file) as f:
            coco = json.load(f)
        return [
            {
                "file_name": os.path.join(image_root, img["file_name"]),
                "image_id": img["id"],
                "height": img["height"],
                "width": img["width"],
                "annotations": [],
            }
            for img in coco["images"]
        ]

    DatasetCatalog.register(name, load)
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="coco"
    )


def register_all_coco(root: str = "datasets"):
    c = os.path.join(root, "coco")
    specs = [
        ("coco_2014_train", "annotations/instances_train2014.json", "train2014"),
        ("coco_2014_valminusminival", "annotations/instances_valminusminival2014.json", "val2014"),
        ("coco_2014_minival", "annotations/instances_minival2014.json", "val2014"),
        ("coco_2017_train", "annotations/instances_train2017.json", "train2017"),
        ("coco_2017_val", "annotations/instances_val2017.json", "val2017"),
    ]
    for name, jf, ir in specs:
        if name not in DatasetCatalog:
            register_coco_instances(name, os.path.join(c, jf), os.path.join(c, ir))
        wsl = name + "_wsl"
        if wsl not in DatasetCatalog:
            register_coco_instances_wsl(
                wsl,
                os.path.join(c, jf),
                os.path.join(c, ir),
                os.path.join(c, "pseudo_labels", f"oicr_plus_{name}.json"),
            )
    if "coco_2017_unlabel" not in DatasetCatalog:
        register_coco_unlabel(
            "coco_2017_unlabel",
            os.path.join(c, "annotations/image_info_unlabeled2017.json"),
            os.path.join(c, "unlabeled2017"),
        )


def pgf_coco_datasets(det_path, save_path, prefix, t_con, t_keep, use_diff, coco_path):
    """COCO flavor of PGF (reference pgf.py pgf_coco): same filtering, category
    ids already contiguous 1-based in the detection dump."""
    import json as _json

    from ..catalog import DatasetCatalog
    from ...tools.pgf import build_result_and_labels, class_filter, pgf

    register_all_coco(os.path.dirname(coco_path.rstrip("/")) or "datasets")
    for split in ("coco_2014_train", "coco_2014_valminusminival"):
        dataset = DatasetCatalog.get(split)
        with open(f"{det_path}/{prefix}{split}.json") as f:
            detection_result = _json.load(f)
        result, class_dict = build_result_and_labels(dataset, detection_result)
        class_filter(result, class_dict, split)
        pgf(result, split, t_con, t_keep, use_diff, [])  # no 'difficult' classes on COCO
        with open(f"{save_path}/{prefix}{split}.json", "w") as f:
            _json.dump(result, f)


def add_multi_label_coco(pgt_temp: str):
    from ..catalog import DatasetCatalog
    from ...tools.add_multi_label import get_multi_class_label

    register_all_coco()
    for split, fmt in (("coco_2014_train", "train"), ("coco_2014_valminusminival", "valminusminival")):
        dataset = DatasetCatalog.get(split)
        path = pgt_temp.format(fmt)
        with open(path) as f:
            pgt = json.load(f)
        pgt["multi_label"] = get_multi_class_label(dataset)
        with open(path, "w") as f:
            json.dump(pgt, f)
