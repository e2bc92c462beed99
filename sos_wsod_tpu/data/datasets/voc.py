"""Pascal VOC loaders: XML ground truth and WSL pseudo-label JSON variant.

Parity targets: detectron2-fork pascal_voc.py (reference:
detectron2/detectron2/data/datasets/pascal_voc.py:27-175). Dataset dicts use
d2's schema: file_name, image_id, height, width, annotations[{category_id,
bbox XYXY_ABS, ...}], plus ``multi_label`` for the WSL pseudo-label sets (the
multi-label filter of the SSOD stage consumes it).
"""
from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET
from typing import List, Sequence

import numpy as np

from ..catalog import DatasetCatalog, MetadataCatalog

CLASS_NAMES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def _read_split_ids(dirname: str, split: str) -> List[str]:
    path = os.path.join(dirname, "ImageSets", "Main", split + ".txt")
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def _image_size(dirname: str, fileid: str):
    from PIL import Image

    with Image.open(os.path.join(dirname, "JPEGImages", fileid + ".jpg")) as img:
        w, h = img.size
    return h, w


def load_voc_instances(dirname: str, split: str, class_names: Sequence[str] = CLASS_NAMES):
    """VOC XML annotations -> dataset dicts. Difficult objects are skipped and
    1-based inclusive pixel boxes shift to 0-based coords (pascal_voc.py:69-83)."""
    dicts = []
    for fileid in _read_split_ids(dirname, split):
        anno_file = os.path.join(dirname, "Annotations", fileid + ".xml")
        jpeg_file = os.path.join(dirname, "JPEGImages", fileid + ".jpg")
        if not os.path.isfile(anno_file):
            h, w = _image_size(dirname, fileid)
            dicts.append(
                {"file_name": jpeg_file, "image_id": fileid, "height": h, "width": w,
                 "annotations": []}
            )
            continue
        tree = ET.parse(anno_file)
        r = {
            "file_name": jpeg_file,
            "image_id": fileid,
            "height": int(tree.findall("./size/height")[0].text),
            "width": int(tree.findall("./size/width")[0].text),
        }
        instances = []
        for obj in tree.findall("object"):
            cls = obj.find("name").text
            if int(obj.find("difficult").text) == 1:
                continue
            bb = obj.find("bndbox")
            bbox = [float(bb.find(x).text) for x in ("xmin", "ymin", "xmax", "ymax")]
            bbox[0] -= 1.0
            bbox[1] -= 1.0
            instances.append({"category_id": class_names.index(cls), "bbox": bbox})
        r["annotations"] = instances
        dicts.append(r)
    return dicts


def load_voc_instances_wsl(
    dirname: str, split: str, class_names: Sequence[str] = CLASS_NAMES, year: str = "2007"
):
    """VOC images with PSEUDO labels from pseudo_labels/oicr_plus_voc_{year}_{split}.json
    (the stage-1 -> stage-2 interface; pascal_voc.py:89-170). Boxes are cast to
    int like the reference; attaches per-image ``multi_label`` if present."""
    path = os.path.join(dirname, "pseudo_labels", f"oicr_plus_voc_{year}_{split}.json")
    with open(path) as f:
        annotation_wsl = json.load(f)
    multi_label = annotation_wsl.pop("multi_label", None)
    dicts = []
    for fileid in _read_split_ids(dirname, split):
        anno = annotation_wsl[str(int(fileid))]
        anno_file = os.path.join(dirname, "Annotations", fileid + ".xml")
        jpeg_file = os.path.join(dirname, "JPEGImages", fileid + ".jpg")
        if os.path.isfile(anno_file):
            tree = ET.parse(anno_file)
            h = int(tree.findall("./size/height")[0].text)
            w = int(tree.findall("./size/width")[0].text)
        else:
            h, w = _image_size(dirname, fileid)
        r = {"file_name": jpeg_file, "image_id": fileid, "height": h, "width": w}
        r["annotations"] = [
            {"category_id": obj["category_id"], "bbox": [int(i) for i in obj["bbox"]]}
            for obj in anno
        ]
        if multi_label is not None:
            r["multi_label"] = multi_label[str(int(fileid))]
        dicts.append(r)
    return dicts


def register_pascal_voc(name, dirname, split, year, class_names=CLASS_NAMES):
    DatasetCatalog.register(name, lambda: load_voc_instances(dirname, split, class_names))
    MetadataCatalog.get(name).set(
        thing_classes=list(class_names), dirname=dirname, year=year, split=split,
        evaluator_type="pascal_voc",
    )


def register_pascal_voc_wsl(name, dirname, split, year, class_names=CLASS_NAMES):
    DatasetCatalog.register(
        name, lambda: load_voc_instances_wsl(dirname, split, class_names, str(year))
    )
    MetadataCatalog.get(name).set(
        thing_classes=list(class_names), dirname=dirname, year=year, split=split,
        evaluator_type="pascal_voc",
    )


def register_all_voc(root: str = "datasets"):
    """Standard + WSL pseudo-label registrations (mirrors the reference's
    builtin.py catalog: voc_2007_{train,val,test}[,_wsl])."""
    for year in ("2007", "2012"):
        dirname = os.path.join(root, f"VOC{year}")
        for split in ("train", "val", "trainval", "test"):
            name = f"voc_{year}_{split}"
            if name not in DatasetCatalog:
                register_pascal_voc(name, dirname, split, year)
            wsl = f"{name}_wsl"
            if wsl not in DatasetCatalog:
                register_pascal_voc_wsl(wsl, dirname, split, year)
