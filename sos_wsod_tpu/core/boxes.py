"""Box geometry in pure JAX, on plain ``(..., 4)`` XYXY float arrays.

TPU-native replacement for the reference's ``detectron2.structures.Boxes`` /
``pairwise_iou`` (reference: uwsod/detectron2/structures/boxes.py) and
``Box2BoxTransform`` (uwsod/detectron2/modeling/box_regression.py:16-113).
Instead of a Boxes wrapper class we keep raw arrays + explicit validity masks —
pytree-friendly, shape-static, vmap-able.

All functions broadcast over leading batch dims unless noted.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# clamp for dw/dh in apply_deltas; reference box_regression.py:10
SCALE_CLAMP = math.log(1000.0 / 16)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (...,). d2 convention: (x2-x1)*(y2-y1), no +1."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Boxes with both sides > threshold (reference boxes.py nonempty)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def clip_boxes(boxes: jnp.ndarray, image_size: Tuple[int, int]) -> jnp.ndarray:
    """Clip XYXY boxes to [0, w] x [0, h]. image_size is (h, w) like d2."""
    h, w = image_size
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(M,4),(N,4) -> (M,N) intersection areas (clamped at 0)."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """d2 pairwise_iou: IoU=0 where intersection==0 (also handles empty boxes)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    inter = pairwise_intersection(boxes1, boxes2)
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def pairwise_iou_wsl(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Signed inner/outer overlap ratio.

    Reference: uwsod/projects/WSL/wsl/modeling/roi_heads/roi_heads.py:25-65.
    ratio = inner_area / outer_area, with sign -1 when the boxes do not overlap
    (any inner side negative), 0 where the outer area is 0.
    """
    outer_wh = jnp.abs(
        jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
        - jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    )
    outer = outer_wh[..., 0] * outer_wh[..., 1]
    inner_wh = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:]) - jnp.maximum(
        boxes1[:, None, :2], boxes2[None, :, :2]
    )
    sign = jnp.where((inner_wh > 0).all(axis=-1), 1.0, -1.0)
    inner = jnp.abs(inner_wh[..., 0]) * jnp.abs(inner_wh[..., 1])
    return jnp.where(outer > 0, inner / outer * sign, 0.0)


def unique_boxes_keep_mask(boxes: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """Host-side (numpy) hash-dedup keep mask; keeps the FIRST occurrence.

    Parity with uwsod Boxes.unique_boxes (boxes.py:214-226): hash =
    round(box*scale) . [1,1e3,1e6,1e9]; np.unique(return_index) keeps the first
    occurrence of each hash.
    """
    v = np.array([1.0, 1e3, 1e6, 1e9])
    hashes = np.round(np.asarray(boxes, dtype=np.float64) * scale).dot(v).astype(np.int64)
    _, index = np.unique(hashes, return_index=True)
    keep = np.zeros(boxes.shape[0], dtype=bool)
    keep[np.sort(index)] = True
    return keep


def flip_boxes_horizontal(boxes: jnp.ndarray, image_width: float) -> jnp.ndarray:
    """HFlip of XYXY boxes (x1' = W - x2, x2' = W - x1)."""
    x1 = image_width - boxes[..., 2]
    x2 = image_width - boxes[..., 0]
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


# --------------------------------------------------------------------------
# Box2BoxTransform (R-CNN delta parameterization)
# --------------------------------------------------------------------------

def get_deltas(
    src_boxes: jnp.ndarray,
    target_boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0),
) -> jnp.ndarray:
    """Encode target boxes relative to src boxes. (N,4),(N,4) -> (N,4).

    Parity: Box2BoxTransform.get_deltas (box_regression.py:39-72). Degenerate
    src boxes (w/h <= 0) are guarded with 1.0 instead of asserting — callers pad
    with dummy boxes and mask the loss.
    """
    wx, wy, ww, wh = weights
    sw = src_boxes[..., 2] - src_boxes[..., 0]
    sh = src_boxes[..., 3] - src_boxes[..., 1]
    sw = jnp.where(sw > 0, sw, 1.0)
    sh = jnp.where(sh > 0, sh, 1.0)
    scx = src_boxes[..., 0] + 0.5 * sw
    scy = src_boxes[..., 1] + 0.5 * sh
    tw = target_boxes[..., 2] - target_boxes[..., 0]
    th = target_boxes[..., 3] - target_boxes[..., 1]
    tw = jnp.where(tw > 0, tw, 1.0)
    th = jnp.where(th > 0, th, 1.0)
    tcx = target_boxes[..., 0] + 0.5 * tw
    tcy = target_boxes[..., 1] + 0.5 * th
    dx = wx * (tcx - scx) / sw
    dy = wy * (tcy - scy) / sh
    dw = ww * jnp.log(tw / sw)
    dh = wh * jnp.log(th / sh)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(
    deltas: jnp.ndarray,
    boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0),
) -> jnp.ndarray:
    """Decode deltas (N, K*4) against boxes (N, 4) -> (N, K*4).

    Parity: Box2BoxTransform.apply_deltas (box_regression.py:74-113) including
    the dw/dh SCALE_CLAMP.
    """
    n, k4 = deltas.shape
    k = k4 // 4
    d = deltas.reshape(n, k, 4)
    wx, wy, ww, wh = weights
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.minimum(d[..., 2] / ww, SCALE_CLAMP)
    dh = jnp.minimum(d[..., 3] / wh, SCALE_CLAMP)
    pcx = dx * widths[:, None] + ctr_x[:, None]
    pcy = dy * heights[:, None] + ctr_y[:, None]
    pw = jnp.exp(dw) * widths[:, None]
    ph = jnp.exp(dh) * heights[:, None]
    out = jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
    )
    return out.reshape(n, k4)
