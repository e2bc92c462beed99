"""OICR refinement branch: per-branch classifier + box regressor and losses.

Parity target: reference OICROutputLayers/OICROutputs
(uwsod/projects/WSL/wsl/modeling/roi_heads/fast_rcnn_oicr.py:151-736):
  cls_score: Linear(F, K+1), init normal(0.01), bias 0
  bbox_pred: Linear(F, K*4), init normal(0.001), bias 0
  cls loss  = mean over R of CE(logits, gt_class; ignore -1) * gt_weights
  reg loss  = sum over fg of smooth_l1(beta)(delta_pred[gt_cls] - delta_gt) / R
where R = true proposal count and gt_weights carry pseudo-GT confidence
(zeroed at ignored rows, fast_rcnn_oicr.py:219-222).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import boxes as box_ops


class OICRBranch(nn.Module):
    num_classes: int
    has_reg: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        from .wsddn import LinearParams

        self.cls_score = LinearParams(self.num_classes + 1,
                                      nn.initializers.normal(0.01))
        if self.has_reg:
            self.bbox_pred = LinearParams(self.num_classes * 4,
                                          nn.initializers.normal(0.001))

    def parts(self, in_features: int):
        """(kernel, bias) pairs for cross-branch matmul packing."""
        ps = [self.cls_score(in_features)]
        if self.has_reg:
            ps.append(self.bbox_pred(in_features))
        return ps

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (P, F) -> (scores (P, K+1), deltas (P, K*4))."""
        from .wsddn import packed_linear

        outs = packed_linear(x, self.parts(x.shape[-1]), self.dtype)
        scores = outs[0]
        if self.has_reg:
            deltas = outs[1]
        else:
            deltas = jnp.zeros((x.shape[0], self.num_classes * 4),
                               dtype=self.dtype)
        return scores, deltas


def weighted_ce_loss(
    logits: jnp.ndarray,
    gt_classes: jnp.ndarray,
    weights: jnp.ndarray,
    prop_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Ignore-aware weighted CE, mean over the TRUE proposal count.

    logits: (P, K+1); gt_classes: (P,) int with -1 = ignore; weights: (P,).
    """
    logits = jnp.asarray(logits, jnp.float32)
    active = prop_valid & (gt_classes >= 0)
    safe_cls = jnp.clip(gt_classes, 0, logits.shape[1] - 1)
    logz = jax.nn.logsumexp(logits, axis=1)
    ce = logz - jnp.take_along_axis(logits, safe_cls[:, None], axis=1)[:, 0]
    ce = jnp.where(active, ce * weights, 0.0)
    denom = jnp.maximum(jnp.sum(prop_valid.astype(jnp.float32)), 1.0)
    return jnp.sum(ce) / denom


def smooth_l1(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    if beta <= 1e-5:
        return jnp.abs(x)
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def box_reg_loss(
    deltas: jnp.ndarray,
    proposal_boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    prop_valid: jnp.ndarray,
    *,
    num_classes: int,
    beta: float = 0.0,
    weights=(10.0, 10.0, 5.0, 5.0),
    loss_type: str = "smooth_l1",
    sample_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Foreground-only smooth-L1 over the gt class's delta columns, sum / R.

    loss_type 'smooth_l1_weighted' multiplies per-row loss by sample_weights
    (fast_rcnn_oicr.py:325-337); 'smooth_l1_mean' divides by fg count instead of
    R (the detectron2-fork addition used by unbias *_split configs).
    """
    p = deltas.shape[0]
    fg = prop_valid & (gt_classes >= 0) & (gt_classes < num_classes)
    safe_cls = jnp.clip(gt_classes, 0, num_classes - 1)
    d = deltas.reshape(p, num_classes, 4)
    d_fg = jnp.take_along_axis(d, safe_cls[:, None, None].repeat(4, axis=2), axis=1)[:, 0]
    gt_d = box_ops.get_deltas(proposal_boxes, gt_boxes, weights)
    per = smooth_l1(jnp.asarray(d_fg, jnp.float32) - gt_d, beta).sum(axis=1)
    if loss_type == "smooth_l1_weighted":
        assert sample_weights is not None
        per = per * sample_weights
    per = jnp.where(fg, per, 0.0)
    if loss_type == "smooth_l1_mean":
        denom = jnp.maximum(jnp.sum(fg.astype(jnp.float32)), 1.0)
    else:
        denom = jnp.maximum(jnp.sum(prop_valid.astype(jnp.float32)), 1.0)
    return jnp.sum(per) / denom
