"""Detection post-processing: score filter + per-class NMS + top-k, masked.

Parity target: reference ``fast_rcnn_inference_single_image``
(uwsod/projects/WSL/wsl/modeling/roi_heads/fast_rcnn_wsddn.py:88-151): drop the
background column, clip boxes, filter score > score_thresh per (proposal,
class) pair, per-class NMS, keep top-k by score. Returns padded Detections plus
the raw (all_scores, all_boxes) that the WSL TTA wrappers average.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import boxes as box_ops
from ..core.instances import Detections
from ..ops.nms import nms_mask


def fast_rcnn_inference_single(
    pred_boxes: jnp.ndarray,   # (P, K*4) or (P, 4) class-agnostic
    scores: jnp.ndarray,       # (P, K+1), background last
    prop_valid: jnp.ndarray,   # (P,)
    image_hw: jnp.ndarray,     # (2,) float/int (h, w) of the model input image
    *,
    score_thresh: float,
    nms_thresh: float,
    topk: int,
) -> Detections:
    p, k1 = scores.shape
    k = k1 - 1
    finite = jnp.isfinite(pred_boxes).all(axis=1) & jnp.isfinite(scores).all(axis=1)
    base_valid = prop_valid & finite

    cls_scores = jnp.asarray(scores[:, :k], jnp.float32)
    nb = pred_boxes.shape[1] // 4
    boxes = pred_boxes.reshape(p, nb, 4)
    h = image_hw[0].astype(jnp.float32)
    w = image_hw[1].astype(jnp.float32)
    boxes = jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )
    if nb == 1:
        boxes = jnp.broadcast_to(boxes, (p, k, 4))

    cand_valid = base_valid[:, None] & (cls_scores > score_thresh)  # (P, K)

    def per_class(args):
        b, s, v = args
        return nms_mask(b, s, v, nms_thresh)

    keep = jax.lax.map(
        per_class,
        (jnp.transpose(boxes, (1, 0, 2)), cls_scores.T, cand_valid.T),
    )  # (K, P)
    keep = keep.T & cand_valid

    flat_scores = jnp.where(keep, cls_scores, -jnp.inf).reshape(-1)
    top_vals, top_idx = jax.lax.top_k(flat_scores, topk)
    det_valid = jnp.isfinite(top_vals)
    det_cls = (top_idx % k).astype(jnp.int32)
    det_prop = top_idx // k
    det_boxes = boxes.reshape(p * k, 4)[det_prop * k + det_cls]
    return Detections(
        boxes=jnp.where(det_valid[:, None], det_boxes, 0.0),
        scores=jnp.where(det_valid, top_vals, 0.0),
        classes=jnp.where(det_valid, det_cls, 0),
        valid=det_valid,
    )


def rescale_detections(det: Detections, input_hw, output_hw) -> Detections:
    """detector_postprocess: rescale boxes from model-input size to the original
    image size (reference wsl/modeling/postprocessing.py)."""
    sy = output_hw[0] / input_hw[0]
    sx = output_hw[1] / input_hw[1]
    scale = jnp.stack([sx, sy, sx, sy]).astype(det.boxes.dtype)
    boxes = det.boxes * scale[None, :]
    boxes = jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, output_hw[1]),
            jnp.clip(boxes[..., 1], 0, output_hw[0]),
            jnp.clip(boxes[..., 2], 0, output_hw[1]),
            jnp.clip(boxes[..., 3], 0, output_hw[0]),
        ],
        axis=-1,
    )
    return Detections(boxes=boxes, scores=det.scores, classes=det.classes, valid=det.valid)
