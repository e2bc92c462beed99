"""Inject per-image multi-class labels into pseudo-label JSONs.

Parity target: reference tools/add_multi_label.py — adds a top-level
``multi_label`` mapping {str(img_id): [class ids]} to each pseudo-label file,
consumed by the SSOD stage's multi-label pseudo-box filter
(unbias/ubteacher/engine/trainer.py:362-400 via HAS_MULTI_LABEL).
"""
from __future__ import annotations

import json
from typing import Dict, List


def get_multi_class_label(dataset: List[dict]) -> Dict[str, List[int]]:
    out: Dict[str, List[int]] = {}
    for data in dataset:
        img_id = int(data["image_id"])
        label: List[int] = []
        for ann in data["annotations"]:
            cat_id = ann["category_id"]
            if cat_id not in label:
                label.append(cat_id)
        out[str(img_id)] = label
    return out


def add_voc(pgt_temp: str, year: str, data_root: str = "datasets") -> None:
    from ..data.catalog import DatasetCatalog
    from ..data.datasets.voc import register_all_voc

    register_all_voc(data_root)
    for split in ("train", "val"):
        dataset = DatasetCatalog.get(f"voc_{year}_{split}")
        path = pgt_temp.format(split)
        with open(path) as f:
            pgt = json.load(f)
        pgt["multi_label"] = get_multi_class_label(dataset)
        with open(path, "w") as f:
            json.dump(pgt, f)


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser("Adding multi-label messages into pseudo label files.")
    parser.add_argument(
        "--pgt-temp", default="datasets/VOC2007/pseudo_labels/oicr_plus_voc_2007_{}.json"
    )
    parser.add_argument("--dataset", default="voc2007", choices=("voc2007", "voc2012", "coco"))
    parser.add_argument("--data-root", default="datasets")
    args = parser.parse_args(argv)

    if args.dataset in ("voc2007", "voc2012"):
        add_voc(args.pgt_temp, args.dataset[3:], args.data_root)
    elif args.dataset == "coco":
        from ..data.datasets.coco import add_multi_label_coco

        add_multi_label_coco(args.pgt_temp)
    else:
        raise ValueError(f"{args.dataset} is not supported.")


if __name__ == "__main__":
    main()
