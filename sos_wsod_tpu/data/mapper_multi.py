"""Stage-1 multi-input mapper: one image -> 4 synchronized padded views.

Parity target: DatasetMapperMultiInput
(uwsod/detectron2/data/dataset_mapper.py:192-439) + transform_proposals_multi
(uwsod/detectron2/data/detection_utils.py:208-260):
  - shared RandomCrop (when enabled)
  - scale 1: ResizeShortestEdge(choice of MIN_SIZE_TRAIN)
  - scale 2: same but the scale-1 min-size removed from the choice list, and
    re-sampled until the output shape differs from scale 1 (:310-317)
  - views 3/4 = views 1/2 + HFlip
  - proposals transformed per view, clipped; keep-mask = AND over views of
    (unique-box-hash ∧ nonempty) (:340-363)
TPU additions: views are padded to a bucketed canvas (divisible by
``size_divisibility``; each scale has its own canvas to keep the jit cache
linear in buckets) and proposals are padded to a static capacity with a
validity mask.
"""
from __future__ import annotations

import logging
import math
from typing import Dict, List, Optional, Sequence

import numpy as np

#: distinct (canvas1, canvas2) shape pairs seen — each implies one jit compile
_SEEN_CANVAS_PAIRS: set = set()

from ..core.boxes import unique_boxes_keep_mask
from . import transforms as T


def _nonempty_np(boxes: np.ndarray, threshold: float = 0.0) -> np.ndarray:
    return ((boxes[:, 2] - boxes[:, 0]) > threshold) & ((boxes[:, 3] - boxes[:, 1]) > threshold)


def read_image_bgr(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGB")
        arr = np.asarray(img)
    return arr[:, :, ::-1].copy()  # BGR like INPUT.FORMAT default


def bucket_shape(h: int, w: int, divisibility: int, max_hw: Optional[int] = None):
    bh = -(-h // divisibility) * divisibility
    bw = -(-w // divisibility) * divisibility
    if max_hw:
        bh, bw = min(bh, max_hw), min(bw, max_hw)
    return bh, bw


def pad_image(img: np.ndarray, bh: int, bw: int) -> np.ndarray:
    out = np.zeros((bh, bw, img.shape[2]), dtype=img.dtype)
    out[: img.shape[0], : img.shape[1]] = img
    return out


class DatasetMapperMultiInput:
    def __init__(
        self,
        *,
        min_size_train: Sequence[int],
        max_size_train: int,
        crop_enabled: bool = True,
        crop_type: str = "relative_range",
        crop_size: Sequence[float] = (0.9, 0.9),
        proposal_topk: int = 4000,
        proposal_capacity: int = 4096,
        proposal_buckets: Sequence[int] = (),
        num_classes: int = 20,
        size_divisibility: int = 64,
        seed: int = 1234,
    ):
        self.min_size_train = list(min_size_train)
        self.max_size_train = max_size_train
        self.crop_enabled = crop_enabled
        self.crop_type = crop_type
        self.crop_size = list(crop_size)
        self.proposal_topk = proposal_topk
        self.capacity = proposal_capacity
        self.proposal_buckets = tuple(sorted(int(b) for b in proposal_buckets))
        self.num_classes = num_classes
        self.size_divisibility = size_divisibility
        self.rng = np.random.RandomState(seed)

    @staticmethod
    def pick_capacity(n: int, buckets, capacity: int) -> int:
        """Smallest configured proposal bucket holding ``n`` proposals.

        TPU-native variable-P handling: the reference processes each image's
        actual selective-search proposal count dynamically (capped by
        DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN=4000,
        Base-RCNN-DilatedC5.yaml:5); static shapes force us to pad, and
        padding every image to the worst case makes pool + box-head cost
        worst-case for every image. With TPU.PROPOSAL_BUCKETS set (e.g.
        (1024, 2048, 4096)) each image pays for the smallest bucket that
        holds its real proposals; each bucket is one extra jit entry."""
        caps = tuple(buckets) or (capacity,)
        for b in caps:
            if n <= b:
                return b
        return caps[-1]

    def _scale1(self, h, w):
        return T.resize_shortest_edge(h, w, self.min_size_train, self.max_size_train, self.rng)

    def _scale2(self, h, w, shape1):
        # The reference's scale-2 ResizeShortestEdge(size_list_) uses the
        # default (unbounded) max_size (uwsod/detectron2/data/dataset_mapper.py:
        # 310-317) — clamping here could map every candidate size onto shape1
        # and spin forever on high-aspect-ratio images.
        # single-size configs (smoke tests) fall back to the full list and
        # accept an equal shape after the bounded retries
        sizes = [s for s in self.min_size_train if s != min(shape1)] or list(self.min_size_train)
        for _ in range(100):
            t = T.resize_shortest_edge(h, w, sizes, 2 ** 31, self.rng)
            if t.output_size != tuple(shape1):
                return t
        return t  # bounded fallback: accept the last sample

    def __call__(self, dataset_dict: Dict) -> Optional[Dict]:
        d = dict(dataset_dict)
        image = d.get("image")
        if image is None:
            image = read_image_bgr(d["file_name"])
        h, w = image.shape[:2]

        if self.crop_enabled:
            crop = T.random_crop(h, w, self.crop_type, self.crop_size, self.rng)
        else:
            crop = T.NoOpTransform(h, w)
        image_c = crop.apply_image(image)
        ch, cw = image_c.shape[:2]

        t1 = self._scale1(ch, cw)
        img1 = t1.apply_image(image_c)
        shape1 = img1.shape[:2]
        t2 = self._scale2(ch, cw, shape1)
        img2 = t2.apply_image(image_c)
        shape2 = img2.shape[:2]

        f1 = T.HFlipTransform(*shape1)
        f2 = T.HFlipTransform(*shape2)
        img1f = f1.apply_image(img1)
        img2f = f2.apply_image(img2)

        views = [
            T.TransformList([crop, t1]),
            T.TransformList([crop, t1, f1]),
            T.TransformList([crop, t2]),
            T.TransformList([crop, t2, f2]),
        ]
        shapes = [shape1, shape1, shape2, shape2]

        raw_boxes = np.asarray(d["proposal_boxes"], np.float32)[: max(self.proposal_topk, 0) or None]
        raw_logits = np.asarray(d["proposal_objectness_logits"], np.float32)[: raw_boxes.shape[0]]
        boxes_v, keeps = [], []
        for tl, shp in zip(views, shapes):
            b = tl.apply_box(raw_boxes)
            b = T.clip_boxes_np(b, shp)
            keeps.append(unique_boxes_keep_mask(b) & _nonempty_np(b))
            boxes_v.append(b)
        keep = keeps[0] & keeps[1] & keeps[2] & keeps[3]
        n_kept = int(keep.sum())
        if n_kept == 0:
            return None  # skipped batch, like the trainer's empty-instances skip
        cap = self.pick_capacity(n_kept, self.proposal_buckets, self.capacity)
        n = min(n_kept, cap)

        out_boxes = np.zeros((4, cap, 4), np.float32)
        for v in range(4):
            out_boxes[v, :n] = boxes_v[v][keep][:n]
        objectness = np.zeros((cap,), np.float32)
        objectness[:n] = raw_logits[keep][:n]
        valid = np.zeros((cap,), bool)
        valid[:n] = True

        # image-level labels
        gt_oh = np.zeros((self.num_classes,), np.float32)
        classes = sorted({a["category_id"] for a in d.get("annotations", [])
                          if not a.get("iscrowd", 0)})
        if not classes:
            return None  # stage-1 trainer skips label-less images
        gt_oh[classes] = 1.0

        # each scale gets its own bucketed canvas — padding scale-2 (usually
        # smaller) up to scale-1's canvas would waste ~40% of its conv compute.
        # The scale-2 canvas is derived from scale-1's bucket via a ratio
        # quantized to eighths, so the distinct (canvas1, canvas2) pairs stay
        # O(|canvas1 buckets| x few ratios) instead of the full cross product
        # (each new pair is a fresh ~10-min TPU compile of the train step).
        bh1, bw1 = bucket_shape(shape1[0], shape1[1], self.size_divisibility)
        ratio = max(shape2[0] / bh1, shape2[1] / bw1)
        ratio = math.ceil(max(ratio, 1e-6) * 8) / 8
        bh2, bw2 = bucket_shape(
            math.ceil(bh1 * ratio), math.ceil(bw1 * ratio), self.size_divisibility)
        pair = (bh1, bw1, bh2, bw2)
        if pair not in _SEEN_CANVAS_PAIRS:
            _SEEN_CANVAS_PAIRS.add(pair)
            logging.getLogger(__name__).info(
                "new canvas pair s1=%dx%d s2=%dx%d (%d distinct pairs so far)",
                bh1, bw1, bh2, bw2, len(_SEEN_CANVAS_PAIRS))
        imgs_s1 = np.stack([pad_image(img1, bh1, bw1), pad_image(img1f, bh1, bw1)]).astype(np.float32)
        imgs_s2 = np.stack([pad_image(img2, bh2, bw2), pad_image(img2f, bh2, bw2)]).astype(np.float32)

        return {
            "images_s1": imgs_s1,
            "images_s2": imgs_s2,
            "valid_hw_s1": np.array([shape1, shape1], np.int32),
            "valid_hw_s2": np.array([shape2, shape2], np.int32),
            "boxes": out_boxes,
            "objectness": objectness,
            "prop_valid": valid,
            "gt_classes_oh": gt_oh,
            "image_id": d.get("image_id"),
        }


class DatasetMapperSingle:
    """Single-view WSL train mapper (reference stock DatasetMapper train path
    as used by uwsod/projects/WSL/tools/train_net.py): one random
    resize-shortest-edge + optional crop + random hflip, proposals
    transformed/deduped/padded, image-level one-hot labels. Produces the
    GeneralizedRCNNWSL batch schema (models/meta/rcnn_wsl_single.py:157)."""

    def __init__(
        self,
        *,
        min_size_train,
        max_size_train: int,
        crop_enabled: bool = False,
        crop_type: str = "relative_range",
        crop_size=(0.9, 0.9),
        random_flip: bool = True,
        proposal_topk: int = 4000,
        proposal_capacity: int = 4096,
        proposal_buckets: Sequence[int] = (),
        num_classes: int = 20,
        size_divisibility: int = 64,
        seed: int = 1234,
    ):
        self.min_size_train = list(min_size_train)
        self.max_size_train = max_size_train
        self.crop_enabled = crop_enabled
        self.crop_type = crop_type
        self.crop_size = list(crop_size)
        self.random_flip = random_flip
        self.proposal_topk = proposal_topk
        self.capacity = proposal_capacity
        self.proposal_buckets = tuple(sorted(int(b) for b in proposal_buckets))
        self.num_classes = num_classes
        self.size_divisibility = size_divisibility
        self.rng = np.random.RandomState(seed)

    def __call__(self, dataset_dict: Dict) -> Optional[Dict]:
        d = dict(dataset_dict)
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
        tl.append(T.resize_shortest_edge(
            ch, cw, self.min_size_train, self.max_size_train, self.rng))
        ih, iw = tl[-1].output_size
        if self.random_flip and self.rng.rand() < 0.5:
            tl.append(T.HFlipTransform(ih, iw))
        tfm = T.TransformList(tl)
        img = tfm.apply_image(image).astype(np.float32)

        raw_boxes = np.asarray(d["proposal_boxes"], np.float32)[
            : max(self.proposal_topk, 0) or None]
        raw_logits = np.asarray(d["proposal_objectness_logits"], np.float32)[
            : raw_boxes.shape[0]]
        b = tfm.apply_box(raw_boxes)
        b = T.clip_boxes_np(b, (ih, iw))
        keep = unique_boxes_keep_mask(b) & _nonempty_np(b)
        n_kept = int(keep.sum())
        if n_kept == 0:
            return None
        cap = DatasetMapperMultiInput.pick_capacity(
            n_kept, self.proposal_buckets, self.capacity)
        n = min(n_kept, cap)

        boxes = np.zeros((cap, 4), np.float32)
        boxes[:n] = b[keep][:n]
        objectness = np.zeros((cap,), np.float32)
        objectness[:n] = raw_logits[keep][:n]
        valid = np.zeros((cap,), bool)
        valid[:n] = True

        gt_oh = np.zeros((self.num_classes,), np.float32)
        classes = sorted({a["category_id"] for a in d.get("annotations", [])
                          if not a.get("iscrowd", 0)})
        if not classes:
            return None
        gt_oh[classes] = 1.0

        bh, bw = bucket_shape(ih, iw, self.size_divisibility)
        return {
            "image": pad_image(img, bh, bw),
            "valid_hw": np.array([ih, iw], np.int32),
            "boxes": boxes,
            "objectness": objectness,
            "prop_valid": valid,
            "gt_classes_oh": gt_oh,
            "image_id": d.get("image_id"),
        }
