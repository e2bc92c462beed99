"""Rotated-box IoU and rotated NMS.

Parity targets: detectron2's box_iou_rotated / nms_rotated CUDA+CPU kernels
(reference: uwsod/detectron2/layers/csrc/box_iou_rotated/,
csrc/nms_rotated/ — inventory items, not on the SoS critical path). Boxes are
(cx, cy, w, h, angle_degrees) with the d2 convention: angle is the CCW
rotation of the box, applied in image coordinates.

TPU-native: the exact convex intersection of two rotated rectangles is
computed with a fixed-size Sutherland–Hodgman polygon clip — a rectangle
clipped by 4 half-planes has at most 8 vertices, so the polygon lives in a
static (8, 2) buffer with a validity count; everything vmaps over pairs with
no data-dependent shapes. nms_rotated reuses the dense-mask NMS pattern
(ops/nms.py) over the rotated IoU matrix.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_MAX_V = 8


def box_to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) cx,cy,w,h,deg -> (..., 4, 2) corner points (CCW)."""
    cx, cy, w, h, a = [boxes[..., i] for i in range(5)]
    t = jnp.deg2rad(a)
    cos, sin = jnp.cos(t), jnp.sin(t)
    dx = jnp.stack([-w, w, w, -w], -1) * 0.5
    dy = jnp.stack([-h, -h, h, h], -1) * 0.5
    # rotate CCW in image coords (d2 RotatedBoxes convention: y axis down,
    # positive angle rotates from +x towards -y => standard math rotation
    # with y negated cancels out to this form)
    px = cx[..., None] + dx * cos[..., None] + dy * sin[..., None]
    py = cy[..., None] - dx * sin[..., None] + dy * cos[..., None]
    return jnp.stack([px, py], -1)


def _clip_by_halfplane(pts, cnt, a, b, c):
    """Sutherland–Hodgman step: keep points with a*x + b*y + c >= 0.
    pts: (V, 2) padded polygon, cnt: scalar valid count. Returns new
    (pts, cnt). Fixed V = _MAX_V buffers."""
    v = pts.shape[0]
    idx = jnp.arange(v)
    valid = idx < cnt
    nxt = jnp.where(idx + 1 >= cnt, 0, idx + 1)
    p1 = pts
    p2 = pts[nxt]
    d1 = a * p1[:, 0] + b * p1[:, 1] + c
    d2 = a * p2[:, 0] + b * p2[:, 1] + c
    in1 = d1 >= 0
    in2 = d2 >= 0
    t = d1 / jnp.where(jnp.abs(d1 - d2) > 1e-12, d1 - d2, 1e-12)
    inter = p1 + t[:, None] * (p2 - p1)

    # each edge emits: p1 if in1; plus intersection if in1 != in2
    emit1 = valid & in1
    emit2 = valid & (in1 != in2)
    # output order: for edge i, [p1_i][inter_i]; compact via cumsum
    flat_pts = jnp.stack([p1, inter], axis=1).reshape(2 * v, 2)
    flat_keep = jnp.stack([emit1, emit2], axis=1).reshape(2 * v)
    pos = jnp.cumsum(flat_keep.astype(jnp.int32)) - 1
    tgt = jnp.where(flat_keep, jnp.clip(pos, 0, v - 1), v - 1)
    # compact scatter-add: kept entries land at unique ascending slots (a
    # rect-rect clip never exceeds 8 vertices); dropped entries add zeros
    out = jnp.zeros((v, 2), pts.dtype).at[tgt].add(
        jnp.where(flat_keep[:, None], flat_pts, 0.0), mode="drop")
    new_cnt = jnp.sum(flat_keep.astype(jnp.int32))
    return out, new_cnt


def _polygon_area(pts, cnt):
    v = pts.shape[0]
    idx = jnp.arange(v)
    valid = idx < cnt
    nxt = jnp.where(idx + 1 >= cnt, 0, idx + 1)
    x1, y1 = pts[:, 0], pts[:, 1]
    x2, y2 = pts[nxt, 0], pts[nxt, 1]
    cross = jnp.where(valid, x1 * y2 - x2 * y1, 0.0)
    return jnp.abs(jnp.sum(cross)) * 0.5


def _pair_intersection_area(c1: jnp.ndarray, c2: jnp.ndarray) -> jnp.ndarray:
    """c1, c2: (4, 2) corners of two rectangles -> intersection area."""
    pts = jnp.zeros((_MAX_V, 2), jnp.float32).at[:4].set(c1)
    cnt = jnp.asarray(4, jnp.int32)
    for i in range(4):
        p = c2[i]
        q = c2[(i + 1) % 4]
        # half-plane to the LEFT of edge p->q for a CCW polygon... handle
        # either orientation by orienting the normal towards the centroid
        a = q[1] - p[1]
        b = p[0] - q[0]
        c = -(a * p[0] + b * p[1])
        centroid = jnp.mean(c2, axis=0)
        s = jnp.sign(a * centroid[0] + b * centroid[1] + c)
        s = jnp.where(s == 0, 1.0, s)
        pts, cnt = _clip_by_halfplane(pts, cnt, a * s, b * s, c * s)
    return _polygon_area(pts, cnt)


@jax.jit
def pairwise_iou_rotated(boxes1: jnp.ndarray, boxes2: jnp.ndarray
                         ) -> jnp.ndarray:
    """(N, 5) x (M, 5) -> (N, M) exact rotated IoU."""
    c1 = box_to_corners(jnp.asarray(boxes1, jnp.float32))
    c2 = box_to_corners(jnp.asarray(boxes2, jnp.float32))

    inter = jax.vmap(lambda a: jax.vmap(
        lambda b: _pair_intersection_area(a, b))(c2))(c1)
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


@partial(jax.jit, static_argnames=())
def nms_rotated_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                     valid: jnp.ndarray, iou_threshold: float
                     ) -> jnp.ndarray:
    """Greedy rotated NMS, dense-mask form (like ops/nms.py): returns a
    (N,) keep mask. boxes: (N, 5)."""
    n = boxes.shape[0]
    iou = pairwise_iou_rotated(boxes, boxes)
    s = jnp.where(valid, jnp.asarray(scores, jnp.float32), -jnp.inf)
    order = jnp.argsort(-s)
    iou_o = iou[order][:, order]
    valid_o = valid[order]

    def body(i, keep):
        sup = jnp.any(keep & (jnp.arange(n) < i) & (iou_o[:, i] > iou_threshold))
        return keep.at[i].set(valid_o[i] & ~sup)

    keep_o = jax.lax.fori_loop(0, n, body, jnp.zeros(n, bool))
    keep = jnp.zeros(n, bool).at[order].set(keep_o)
    return keep


def batched_nms_rotated(boxes: jnp.ndarray, scores: jnp.ndarray,
                        idxs: jnp.ndarray, valid: jnp.ndarray,
                        iou_threshold: float) -> jnp.ndarray:
    """Per-class rotated NMS via the coordinate-offset trick
    (d2 layers/nms.py batched_nms_rotated): shift centers per class id so
    boxes of different classes never overlap."""
    if boxes.shape[0] == 0:
        return jnp.zeros(0, bool)
    span = jnp.max(jnp.abs(boxes[:, 0])) + jnp.max(jnp.abs(boxes[:, 1])) + \
        jnp.max(boxes[:, 2] + boxes[:, 3]) + 1.0
    off = idxs.astype(jnp.float32) * span
    shifted = boxes.at[:, 0].add(off) if hasattr(boxes, "at") else boxes
    shifted = jnp.concatenate(
        [boxes[:, :1] + off[:, None], boxes[:, 1:]], axis=1)
    return nms_rotated_mask(shifted, scores, valid, iou_threshold)
