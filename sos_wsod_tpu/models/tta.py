"""Test-time augmentation for WSL models (AVG and UNION) and stock TTA.

Parity targets:
 - GeneralizedRCNNWithTTAAVG (reference: uwsod/projects/WSL/wsl/modeling/
   test_time_augmentation_avg.py:29-427): run the model over
   TEST.AUG.MIN_SIZES x {identity, hflip} with the SAME precomputed proposal
   set transformed per view; average the raw per-proposal ``all_scores`` and
   the back-transformed ``all_boxes`` across views; single NMS at the end.
 - GeneralizedRCNNWithTTAUNION (..._union.py): union of per-view detections,
   one NMS over the concatenation.
 - stage-2/3 stock d2 GeneralizedRCNNWithTTA (multi-scale + flip over RPN
   models) is approximated by the UNION strategy over full inference outputs
   (detections per view), matching unbias/train_net_test_tta.py usage.

Host-side loop over views; each view's forward is the same jitted per-bucket
program the plain evaluator uses.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

from ..data import transforms as T
from ..data.mapper_multi import bucket_shape, pad_image


def _view_batches(
    image: np.ndarray,
    raw_boxes: np.ndarray,
    raw_logits: np.ndarray,
    min_sizes: Sequence[int],
    max_size: int,
    flip: bool,
    capacity: int,
    size_divisibility: int,
):
    """Yield (batch_dict, inverse_fn) per TTA view; inverse_fn maps view-space
    boxes (N, 4) back to original-image coordinates."""
    h, w = image.shape[:2]
    n = min(raw_boxes.shape[0], capacity)
    for ms in min_sizes:
        t = T.resize_shortest_edge(h, w, [ms], max_size, None)
        for do_flip in ([False, True] if flip else [False]):
            tl = [t]
            ih, iw = t.output_size
            if do_flip:
                tl.append(T.HFlipTransform(ih, iw))
            tfm = T.TransformList(tl)
            img = tfm.apply_image(image).astype(np.float32)
            b = tfm.apply_box(raw_boxes[:n])
            b = T.clip_boxes_np(b, (ih, iw))
            bh, bw = bucket_shape(ih, iw, size_divisibility)
            boxes = np.zeros((capacity, 4), np.float32)
            boxes[:n] = b
            logits = np.zeros((capacity,), np.float32)
            logits[:n] = raw_logits[:n]
            valid = np.zeros((capacity,), bool)
            valid[:n] = True
            batch = {
                "image": pad_image(img, bh, bw),
                "valid_hw": np.array([ih, iw], np.int32),
                "boxes": boxes,
                "objectness": logits,
                "prop_valid": valid,
                "image_hw": np.array([ih, iw], np.float32),
            }

            def inverse(view_boxes, tfm=tfm):
                return tfm.inverse_box(np.asarray(view_boxes, np.float64))

            yield batch, inverse


def tta_avg_scores(
    predict_fn: Callable[[Dict], Tuple[np.ndarray, np.ndarray]],
    image: np.ndarray,
    raw_boxes: np.ndarray,
    raw_logits: np.ndarray,
    *,
    min_sizes: Sequence[int],
    max_size: int = 4000,
    flip: bool = True,
    capacity: int = 4096,
    size_divisibility: int = 64,
):
    """AVG strategy: returns (mean_scores (P, K+1), mean_boxes (P, K*4) in
    original coords, prop_valid). predict_fn(batch) -> (all_scores, all_boxes)."""
    sum_scores = None
    sum_boxes = None
    valid = None
    count = 0
    for batch, inverse in _view_batches(
        image, raw_boxes, raw_logits, min_sizes, max_size, flip, capacity, size_divisibility
    ):
        scores, boxes = predict_fn(batch)
        scores = np.asarray(scores, np.float64)
        boxes = np.asarray(boxes, np.float64)
        p, k4 = boxes.shape
        back = inverse(boxes.reshape(-1, 4)).reshape(p, k4)
        sum_scores = scores.copy() if sum_scores is None else sum_scores + scores
        sum_boxes = back if sum_boxes is None else sum_boxes + back
        valid = batch["prop_valid"]
        count += 1
    return sum_scores / count, sum_boxes / count, valid


def tta_union_detections(
    infer_fn: Callable[[Dict], Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]],
    image: np.ndarray,
    raw_boxes: np.ndarray,
    raw_logits: np.ndarray,
    *,
    min_sizes: Sequence[int],
    max_size: int = 4000,
    flip: bool = True,
    capacity: int = 4096,
    size_divisibility: int = 64,
    nms_thresh: float = 0.5,
    topk: int = 100,
):
    """UNION strategy: concat per-view detections (mapped back to original
    coords), per-class NMS once, keep top-k. infer_fn(batch) ->
    (boxes (D, 4), scores (D,), classes (D,), valid (D,))."""
    all_b: List[np.ndarray] = []
    all_s: List[np.ndarray] = []
    all_c: List[np.ndarray] = []
    for batch, inverse in _view_batches(
        image, raw_boxes, raw_logits, min_sizes, max_size, flip, capacity, size_divisibility
    ):
        boxes, scores, classes, valid = infer_fn(batch)
        keep = np.asarray(valid, bool)
        all_b.append(inverse(np.asarray(boxes, np.float64)[keep]))
        all_s.append(np.asarray(scores, np.float64)[keep])
        all_c.append(np.asarray(classes, np.int64)[keep])
    boxes = np.concatenate(all_b) if all_b else np.zeros((0, 4))
    scores = np.concatenate(all_s) if all_s else np.zeros(0)
    classes = np.concatenate(all_c) if all_c else np.zeros(0, np.int64)
    keep = _batched_nms_np(boxes, scores, classes, nms_thresh)
    keep = keep[:topk]
    return boxes[keep], scores[keep], classes[keep]


def _batched_nms_np(boxes: np.ndarray, scores: np.ndarray, idxs: np.ndarray, thr: float):
    if boxes.size == 0:
        return np.zeros(0, np.int64)
    max_coord = boxes.max()
    offsets = idxs.astype(np.float64) * (max_coord + 1)
    b = boxes + offsets[:, None]
    order = np.argsort(-scores, kind="mergesort")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(b[i, 0], b[:, 0])
        yy1 = np.maximum(b[i, 1], b[:, 1])
        xx2 = np.minimum(b[i, 2], b[:, 2])
        yy2 = np.minimum(b[i, 3], b[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-12)
        suppressed |= iou > thr
    return np.asarray(keep, np.int64)
