"""Two-crop (weak, strong) mapper + semisup loaders for stages 2-3.

Parity targets:
 - DatasetMapperTwoCropSeparate (reference: unbias/ubteacher/data/
   dataset_mapper.py:14-157): weak view = ResizeShortestEdge(choice) + flip
   (+ crop); strong view = same geometry + photometric strong augs; returns
   (strong, weak) pairs sharing the boxes;
 - divide_label_unlabel (unbias/ubteacher/data/build.py:33-56): labeled indices
   from the dataseed JSON {percent: {seed: [idx...]}};
 - build_detection_semisup_train_loader_two_crops + 4-stream batcher
   (build.py:147-276, common.py:92-174): yields
   (label_q, label_k, unlabel_q, unlabel_k).

TPU additions: fixed gt capacity + one-hot multi-label per image; each of the
four streams is stacked onto a shared padded canvas per batch.
"""
from __future__ import annotations

import json
import logging
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from . import transforms as T
from .mapper_multi import bucket_shape, pad_image, read_image_bgr
from .strong_augmentation import build_strong_augmentation

logger = logging.getLogger(__name__)


def divide_label_unlabel(
    dataset_dicts: List[dict],
    sup_percent: float,
    random_data_seed: int,
    random_data_seed_path: str,
) -> Tuple[List[dict], List[dict]]:
    """Split by the dataseed file (reference build.py:33-56). Asserts the
    recorded index count equals SUP_PERCENT/100 * dataset size."""
    num_all = len(dataset_dicts)
    num_label = int(sup_percent / 100.0 * num_all)
    with open(random_data_seed_path) as f:
        coco_random_idx = json.load(f)
    labeled_idx = np.array(coco_random_idx[str(sup_percent)][str(random_data_seed)])
    assert labeled_idx.shape[0] == num_label, "Number of READ_DATA is mismatched."
    label_dicts, unlabel_dicts = [], []
    labeled = set(labeled_idx.tolist())
    for i in range(num_all):
        (label_dicts if i in labeled else unlabel_dicts).append(dataset_dicts[i])
    return label_dicts, unlabel_dicts


class DatasetMapperTwoCropSeparate:
    """One image -> (strong_sample, weak_sample) padded dicts."""

    def __init__(
        self,
        *,
        min_size_train: Sequence[int],
        max_size_train: int,
        random_flip: bool = True,
        crop_enabled: bool = False,
        crop_type: str = "relative_range",
        crop_size: Sequence[float] = (0.9, 0.9),
        gt_capacity: int = 100,
        num_classes: int = 20,
        size_divisibility: int = 64,
        seed: int = 1234,
    ):
        self.min_size_train = list(min_size_train)
        self.max_size_train = max_size_train
        self.random_flip = random_flip
        self.crop_enabled = crop_enabled
        self.crop_type = crop_type
        self.crop_size = list(crop_size)
        self.gt_capacity = gt_capacity
        self.num_classes = num_classes
        self.size_divisibility = size_divisibility
        self.rng = np.random.RandomState(seed)
        self.strong_aug = build_strong_augmentation(seed + 1)

    def __call__(self, d: dict) -> Optional[Tuple[Dict, Dict]]:
        image = d.get("image")
        if image is None:
            image = read_image_bgr(d["file_name"])
        h, w = image.shape[:2]

        tl = []
        if self.crop_enabled:
            tl.append(T.random_crop(h, w, self.crop_type, self.crop_size, self.rng))
            ch, cw = tl[-1].output_size
        else:
            ch, cw = h, w
        tl.append(T.resize_shortest_edge(ch, cw, self.min_size_train, self.max_size_train, self.rng))
        ih, iw = tl[-1].output_size
        if self.random_flip and self.rng.rand() < 0.5:
            tl.append(T.HFlipTransform(ih, iw))
        tfm = T.TransformList(tl)

        weak = tfm.apply_image(image).astype(np.float32)
        ih, iw = weak.shape[:2]
        # strong augs operate on RGB uint8 (the reference converts to PIL RGB)
        weak_rgb = weak[:, :, ::-1]
        strong_rgb = self.strong_aug(weak_rgb.astype(np.uint8))
        strong = strong_rgb[:, :, ::-1].copy()

        cap = self.gt_capacity
        gt_boxes = np.zeros((cap, 4), np.float32)
        gt_classes = np.zeros((cap,), np.int32)
        gt_valid = np.zeros((cap,), bool)
        # crowd regions are evaluator-only ignore zones, never training gt
        # (d2 DatasetMapper filters iscrowd != 0)
        anns = [a for a in d.get("annotations", []) if not a.get("iscrowd", 0)]
        boxes = np.asarray([a["bbox"] for a in anns], np.float32).reshape(-1, 4)
        classes = np.asarray([a["category_id"] for a in anns], np.int64)
        if boxes.shape[0]:
            b = tfm.apply_box(boxes)
            b = T.clip_boxes_np(b, (ih, iw))
            keep = ((b[:, 2] - b[:, 0]) > 0) & ((b[:, 3] - b[:, 1]) > 0)
            b, classes = b[keep], classes[keep]
            n = min(b.shape[0], cap)
            gt_boxes[:n] = b[:n]
            gt_classes[:n] = classes[:n]
            gt_valid[:n] = True

        ml = np.zeros((self.num_classes,), np.float32)
        for c in d.get("multi_label", []) or []:
            ml[int(c)] = 1.0
        if not d.get("multi_label"):
            ml[np.unique(gt_classes[gt_valid])] = 1.0

        bh, bw = bucket_shape(ih, iw, self.size_divisibility)
        base = {
            "image_hw": np.array([ih, iw], np.float32),
            "gt_boxes": gt_boxes,
            "gt_classes": gt_classes,
            "gt_valid": gt_valid,
            "multi_label_oh": ml,
            "image_id": d.get("image_id"),
            "orig_hw": np.array([h, w], np.float32),
        }
        strong_d = dict(base, image=pad_image(strong, bh, bw))
        weak_d = dict(base, image=pad_image(weak, bh, bw))
        return strong_d, weak_d


def _pair_stream(dataset_dicts, mapper, seed):
    from .build import training_index_stream

    stream = training_index_stream(len(dataset_dicts), seed)
    for i in stream:
        s = mapper(dataset_dicts[i])
        if s is not None:
            yield s


def _repad_group(group: List[Dict], size_divisibility: int) -> List[Dict]:
    from .build import _repad_to

    bh = max(g["image"].shape[0] for g in group)
    bw = max(g["image"].shape[1] for g in group)
    bh, bw = bucket_shape(bh, bw, size_divisibility)
    return [_repad_to(g, {"image": (bh, bw)}) for g in group]


def build_semisup_two_crop_loader(
    label_dicts: List[dict],
    unlabel_dicts: List[dict],
    mapper: DatasetMapperTwoCropSeparate,
    batch_size_label: int,
    batch_size_unlabel: int,
    *,
    seed: int = 0,
    size_divisibility: int = 64,
) -> Iterator[Dict[str, List[Dict]]]:
    """Yields {'label_q': [...], 'label_k': [...], 'unlabel_q': [...],
    'unlabel_k': [...]} with q = strong, k = weak (common.py:126-174)."""
    lbl = _pair_stream(label_dicts, mapper, seed)
    ulb = _pair_stream(unlabel_dicts, mapper, seed + 1)
    while True:
        lq, lk, uq, uk = [], [], [], []
        for _ in range(batch_size_label):
            s, w = next(lbl)
            lq.append(s)
            lk.append(w)
        for _ in range(batch_size_unlabel):
            s, w = next(ulb)
            uq.append(s)
            uk.append(w)
        # q/k of one stream share geometry; repad each stream pair jointly
        lg = _repad_group(lq + lk, size_divisibility)
        ug = _repad_group(uq + uk, size_divisibility)
        yield {
            "label_q": lg[:batch_size_label],
            "label_k": lg[batch_size_label:],
            "unlabel_q": ug[:batch_size_unlabel],
            "unlabel_k": ug[batch_size_unlabel:],
        }


def build_semisup_loader_from_cfg(cfg, dataset_dicts=None):
    from .build import get_detection_dataset_dicts

    if dataset_dicts is None:
        dataset_dicts = get_detection_dataset_dicts(
            cfg.DATASETS.TRAIN, filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS
        )
    label_dicts, unlabel_dicts = divide_label_unlabel(
        dataset_dicts,
        cfg.DATALOADER.SUP_PERCENT,
        cfg.DATALOADER.RANDOM_DATA_SEED,
        cfg.DATALOADER.RANDOM_DATA_SEED_PATH,
    )
    mapper = DatasetMapperTwoCropSeparate(
        min_size_train=cfg.INPUT.MIN_SIZE_TRAIN,
        max_size_train=cfg.INPUT.MAX_SIZE_TRAIN,
        random_flip=cfg.INPUT.RANDOM_FLIP != "none",
        crop_enabled=cfg.INPUT.CROP.ENABLED,
        crop_type=cfg.INPUT.CROP.TYPE,
        crop_size=cfg.INPUT.CROP.SIZE,
        gt_capacity=cfg.TPU.PGT_CAPACITY,
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        size_divisibility=cfg.TPU.IMAGE_SIZE_DIVISIBILITY,
        seed=max(cfg.SEED, 0),
    )
    # IMG_PER_BATCH_* are GLOBAL (like d2); each host maps its own
    # 1/process_count share — the _pair_stream indices are rank-strided via
    # training_index_stream, so hosts consume disjoint images
    from .build import _process_shard

    _, world = _process_shard(None, None)
    bl, bu = cfg.SOLVER.IMG_PER_BATCH_LABEL, cfg.SOLVER.IMG_PER_BATCH_UNLABEL
    assert bl % world == 0 and bu % world == 0, (
        f"IMG_PER_BATCH label={bl}/unlabel={bu} not divisible by {world} processes")
    return build_semisup_two_crop_loader(
        label_dicts, unlabel_dicts, mapper,
        bl // world, bu // world,
        seed=max(cfg.SEED, 0),
        size_divisibility=cfg.TPU.IMAGE_SIZE_DIVISIBILITY,
    )
