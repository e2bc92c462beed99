"""Exact greedy NMS as a fixed-shape XLA computation.

Parity target: torchvision ``nms`` / detectron2 ``batched_nms`` (consumed by the
reference at uwsod/detectron2/layers/nms.py and used for both inference and
MIST pseudo-GT mining, roi_heads_oicrplus.py:576-586). Greedy semantics: sort by
score descending, keep the best, suppress every remaining box whose IoU with a
kept box is strictly greater than the threshold.

TPU-native design: dynamic keep-lists are replaced by a fixed-size keep *mask*.
The sequential greedy scan is computed as a fixpoint of

    keep[j] = valid[j] and not any_{i<j}( keep[i] and iou(i,j) > thr )

over score-sorted order. Because suppression only flows from earlier (higher
score) to later boxes, the iteration converges to the exact greedy solution in
at most ``suppression-chain-depth`` steps (typically < 10); each step is one
masked (S,S) reduction that XLA maps onto the VPU — no host round trips, no
dynamic shapes, vmap-able over images/classes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.boxes import pairwise_iou


def _greedy_keep_sorted(iou: jnp.ndarray, valid_sorted: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """Greedy keep mask in sorted order. iou: (S,S) of sorted boxes."""
    s = iou.shape[0]
    # suppress[i, j]: earlier box i suppresses later box j
    upper = jnp.triu(jnp.ones((s, s), dtype=bool), k=1)
    suppress = (iou > iou_threshold) & upper

    def body(state):
        keep, _ = state
        # suppressed[j] = any_i keep[i] & suppress[i,j]
        suppressed = (suppress & keep[:, None]).any(axis=0)
        new_keep = valid_sorted & ~suppressed
        return new_keep, keep

    def cond(state):
        keep, prev = state
        return jnp.any(keep != prev)

    init = (valid_sorted, jnp.zeros_like(valid_sorted))
    keep, _ = jax.lax.while_loop(cond, body, init)
    return keep


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Exact greedy NMS.

    Args:
        boxes: (S, 4) XYXY. scores: (S,). valid: (S,) bool.
    Returns:
        keep: (S,) bool in the ORIGINAL input order.
    """
    s = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-masked_scores, stable=True)
    b = boxes[order]
    v = valid[order]
    iou = pairwise_iou(b, b)
    keep_sorted = _greedy_keep_sorted(iou, v, iou_threshold)
    keep = jnp.zeros((s,), dtype=bool).at[order].set(keep_sorted)
    return keep


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Per-class NMS via the coordinate-offset trick (torchvision batched_nms).

    Boxes of different ``idxs`` (class ids) never overlap after offsetting each
    class into its own coordinate island, so one class-agnostic NMS suffices —
    the same trick the reference relies on, which keeps cross-class ordering by
    score identical.
    """
    # max over valid coords only; +1 like torchvision
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, valid, iou_threshold)


def keep_top_k(
    scores: jnp.ndarray, keep: jnp.ndarray, k: int
) -> jnp.ndarray:
    """Restrict a keep mask to its top-k entries by score (torch ``keep[:topk]``).

    NMS keep indices from torchvision are score-ordered, so truncating the keep
    list equals keeping the k highest-scoring kept entries.
    """
    masked = jnp.where(keep, scores, -jnp.inf)
    kth = jax.lax.top_k(masked, k)[0][-1]
    # keep entries strictly above kth, plus ties at kth limited by cumulative count
    above = masked > kth
    at = masked == kth
    budget = k - jnp.sum(above & keep)
    at_rank = jnp.cumsum(at.astype(jnp.int32)) * at.astype(jnp.int32)
    take_at = at & (at_rank <= budget)
    return keep & (above | take_at) & (masked > -jnp.inf)
