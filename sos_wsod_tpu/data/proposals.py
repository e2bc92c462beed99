"""Precomputed proposal (MCG / selective search) loading.

Parity target: uwsod/detectron2/data/build.py:102-160
``load_proposals_into_dataset``: a pickle with keys {ids|indexes, boxes,
objectness_logits, bbox_mode?} is matched to dataset dicts by image id; each
dict gains proposal_boxes / proposal_objectness_logits (sorted by objectness
descending) / proposal_bbox_mode. Top-k truncation happens later in the mapper.
"""
from __future__ import annotations

import pickle
from typing import List

import numpy as np

XYXY_ABS = 0  # BoxMode.XYXY_ABS


def load_proposals_into_dataset(dataset_dicts: List[dict], proposal_file: str) -> List[dict]:
    with open(proposal_file, "rb") as f:
        proposals = pickle.load(f, encoding="latin1")

    # rename legacy keys (d2 build.py:128-133)
    rename = {"indexes": "ids", "scores": "objectness_logits"}
    for old, new in rename.items():
        if old in proposals:
            proposals[new] = proposals.pop(old)

    id_to_index = {str(pid): i for i, pid in enumerate(proposals["ids"])}
    bbox_mode = proposals.get("bbox_mode", XYXY_ABS)
    assert bbox_mode == XYXY_ABS, "only XYXY_ABS proposal boxes supported"

    out = []
    for d in dataset_dicts:
        d = dict(d)
        i = id_to_index[str(d["image_id"])]
        boxes = np.asarray(proposals["boxes"][i], dtype=np.float32)
        logits = np.asarray(proposals["objectness_logits"][i], dtype=np.float32)
        inds = logits.argsort()[::-1]  # descending objectness (build.py:151)
        d["proposal_boxes"] = boxes[inds]
        d["proposal_objectness_logits"] = logits[inds]
        d["proposal_bbox_mode"] = XYXY_ABS
        out.append(d)
    return out


def save_proposals(path: str, ids, boxes, objectness_logits):
    """Write a d2-format proposal pickle (used by the converters & tests)."""
    with open(path, "wb") as f:
        pickle.dump(
            {"ids": list(ids), "boxes": list(boxes),
             "objectness_logits": list(objectness_logits), "bbox_mode": XYXY_ABS},
            f,
        )
