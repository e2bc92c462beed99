"""Single-view WSOD ROI heads: WSDDN and classic OICR.

Parity targets:
 - WSDDNROIHeads (reference: uwsod/projects/WSL/wsl/modeling/roi_heads/
   roi_heads_wsddn.py:30-378): DAN + WSDDN MIL loss only; inference = MIL
   proposal scores with a zero background column appended;
 - OICRROIHeads (roi_heads_oicr.py:36-919): WSDDN MIL + K refinement branches
   where branch k's pseudo GT is the TOP-1 proposal per present class from the
   previous branch's scores (get_pgt_top_k with k=1), labeled via the
   [0.5, 0.6]/[0, -1, 1] matcher band, weighted-CE (+ optional reg); inference
   ensembles the K branch softmaxes (fast_rcnn_oicr.py:674-736).

These share the mining/labeling helpers with the 4-view OICR+ head — the
single-view heads are the OICR+ computation restricted to one view with top-1
mining instead of MIST.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core.instances import GroundTruth
from ...core.matcher import Matcher
from .dan import DAN
from .oicr import OICRBranch, box_reg_loss, weighted_ce_loss
from .wsddn import WSDDNHead, mil_loss, wsddn_scores
from ...core import boxes as box_ops


def top1_mining(
    prev_scores: jnp.ndarray,   # (P, K) class scores (no bg)
    prop_boxes: jnp.ndarray,    # (P, 4)
    prop_valid: jnp.ndarray,    # (P,)
    gt_classes_oh: jnp.ndarray, # (K,)
) -> GroundTruth:
    """Classic OICR pseudo-GT: the single highest-scoring proposal of each
    present class (fast_rcnn_oicr.py get_pgt_top_k, k=1)."""
    k = gt_classes_oh.shape[0]
    masked = jnp.where(prop_valid[:, None], jnp.asarray(prev_scores[:, :k], jnp.float32), -jnp.inf)
    idx = jnp.argmax(masked, axis=0)           # (K,)
    scores = jnp.max(masked, axis=0)
    valid = gt_classes_oh.astype(bool) & jnp.isfinite(scores)
    return GroundTruth(
        boxes=prop_boxes[idx],
        classes=jnp.arange(k, dtype=jnp.int32),
        scores=jnp.where(valid, scores, 0.0),
        weights=jnp.where(valid, scores, 0.0),
        index=idx.astype(jnp.int32),
        valid=valid,
    )


class WSDDNROIHead(nn.Module):
    """MIL-only head (DAN + WSDDN)."""

    num_classes: int = 20
    mean_loss: bool = True
    dan_dims: Sequence[int] = (4096, 4096)
    dtype: Any = jnp.float32

    def setup(self):
        self.dan = DAN(fc_dims=tuple(self.dan_dims), dtype=self.dtype)
        self.wsddn = WSDDNHead(self.num_classes, dtype=self.dtype)

    def _features(self, pooled, objectness, train):
        w = (objectness + 1.0).astype(pooled.dtype)
        x = pooled * w[:, None, None, None]
        return self.dan(x, train=train)

    def losses(self, pooled, objectness, prop_valid, gt_classes_oh) -> Dict[str, jnp.ndarray]:
        feats = self._features(pooled, objectness, train=True)
        c, d = self.wsddn(feats)
        scores = wsddn_scores(c, d, prop_valid)
        return {"loss_cls": mil_loss(scores, gt_classes_oh, self.mean_loss)}

    def predict(self, pooled, boxes, objectness, prop_valid):
        """Returns (scores (P, K+1) with zero bg column, boxes (P, 4))."""
        feats = self._features(pooled, objectness, train=False)
        c, d = self.wsddn(feats)
        scores = wsddn_scores(c, d, prop_valid)
        scores = jnp.concatenate([scores, jnp.zeros((scores.shape[0], 1), scores.dtype)], axis=1)
        return scores, boxes


class OICRROIHead(nn.Module):
    """Single-view OICR: MIL + K refinement branches with top-1 mining."""

    num_classes: int = 20
    refine_k: int = 3
    refine_reg: Sequence[bool] = (False, False, False)
    mean_loss: bool = True
    smooth_l1_beta: float = 0.0
    bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    iou_thresholds: Sequence[float] = (0.5, 0.6)
    iou_labels: Sequence[int] = (0, -1, 1)
    dan_dims: Sequence[int] = (4096, 4096)
    dtype: Any = jnp.float32

    def setup(self):
        self.dan = DAN(fc_dims=tuple(self.dan_dims), dtype=self.dtype)
        self.wsddn = WSDDNHead(self.num_classes, dtype=self.dtype)
        self.refine = [
            OICRBranch(self.num_classes, has_reg=self.refine_reg[k], dtype=self.dtype,
                       name=f"box_refinery_{k}")
            for k in range(self.refine_k)
        ]
        self.matcher = Matcher(list(self.iou_thresholds), list(self.iou_labels))

    def _features(self, pooled, objectness, train):
        w = (objectness + 1.0).astype(pooled.dtype)
        x = pooled * w[:, None, None, None]
        return self.dan(x, train=train)

    def losses(self, pooled, boxes, objectness, prop_valid, gt_classes_oh):
        from .oicr_plus import label_and_sample

        feats = self._features(pooled, objectness, train=True)
        c, d = self.wsddn(feats)
        scores = wsddn_scores(c, d, prop_valid)
        losses = {"loss_cls": mil_loss(scores, gt_classes_oh, self.mean_loss)}

        prev = jax.lax.stop_gradient(scores)
        for k in range(self.refine_k):
            gt = top1_mining(prev, boxes, prop_valid, gt_classes_oh)
            cls, weights, index, _ = label_and_sample(
                gt, boxes, prop_valid, self.matcher, self.num_classes
            )
            sc, dl = self.refine[k](feats)
            term_weight = 3.0 if k == 0 else 1.0  # roi_heads_oicr term weighting
            losses[f"loss_cls_r{k}"] = (
                weighted_ce_loss(sc, cls, weights, prop_valid) * term_weight
            )
            if self.refine_reg[k]:
                losses[f"loss_box_reg_r{k}"] = box_reg_loss(
                    dl, boxes, boxes[index], cls, prop_valid,
                    num_classes=self.num_classes, beta=self.smooth_l1_beta,
                    weights=self.bbox_reg_weights,
                ) * term_weight
            probs = jax.nn.softmax(jnp.asarray(sc, jnp.float32), axis=-1)
            prev = jax.lax.stop_gradient(probs[:, : self.num_classes])
        return losses

    def predict(self, pooled, boxes, objectness, prop_valid):
        feats = self._features(pooled, objectness, train=False)
        probs = None
        deltas = None
        for k in range(self.refine_k):
            sc, dl = self.refine[k](feats)
            pk = jax.nn.softmax(jnp.asarray(sc, jnp.float32), axis=-1)
            probs = pk if probs is None else probs + pk
            dk = jnp.asarray(dl, jnp.float32)
            deltas = dk if deltas is None else deltas + dk
        probs = probs / self.refine_k
        deltas = deltas / self.refine_k
        if any(self.refine_reg):
            pred_boxes = box_ops.apply_deltas(deltas, boxes, self.bbox_reg_weights)
        else:
            pred_boxes = jnp.tile(boxes, (1, self.num_classes))
        return probs, pred_boxes
