"""CMIL (Continuation Multiple Instance Learning) ROI head.

Parity targets:
 - CMILROIHeads (reference: uwsod/projects/WSL/wsl/modeling/roi_heads/
   roi_heads_cmil.py:36-807): DAN + WSDDN predictor with ``cmil=True`` + K
   refinement branches mined with top-1 pseudo-GT (get_pgt_top_k, thres=0)
   weighted by the image-level class scores (``pred_class_img_logits``);
 - the continuation merge (fast_rcnn_wsddn.py:611-655 forward_cmil): raw
   cls/det logits are clustered with the ROIMerge op over the per-proposal
   objectness S = sum_k softmax-product scores and the proposal IoU matrix,
   with continuation threshold lambda(iter); the MIL BCE loss runs over the
   MERGED scores softmax(MC, dim=1) * softmax(MD, dim=0);
 - epoch schedule: max_epoch = MAX_ITER / WSL.SIZE_EPOCH, size_epoch =
   WSL.SIZE_EPOCH (fast_rcnn_wsddn.py:535-537).

TPU notes: padded proposal slots are excluded by giving them sort scores of
-1e9 and IoU -1 (so they always form singleton cliques past the real ones)
and masking merged rows by whether the clique holds >= 1 valid proposal.
Like the reference (predictions[0] after the cmil forward), branch-0 mining
runs over the MERGED scores: the top clique id indexes the proposal array —
reproduced as-is for parity.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core import boxes as box_ops
from ...core.instances import GroundTruth
from ...core.matcher import Matcher
from ...ops.roi_merge import roi_merge
from .dan import DAN
from .oicr import OICRBranch, weighted_ce_loss
from .oicr_plus import label_and_sample
from .wsddn import WSDDNHead, mil_image_scores, mil_loss, wsddn_scores


def top1_mining_weighted(
    prev_scores: jnp.ndarray,    # (P, K) class scores (no bg column)
    prop_boxes: jnp.ndarray,     # (P, 4)
    row_valid: jnp.ndarray,      # (P,) validity of the SCORE rows
    gt_classes_oh: jnp.ndarray,  # (K,)
    img_scores: jnp.ndarray,     # (K,) image-level class scores (weights)
) -> GroundTruth:
    """get_pgt_top_k with top_k=1, thres=0, need_weight=True
    (roi_heads_cmil.py:614-757): weights come from the image-level class
    scores rather than the proposal score."""
    k = gt_classes_oh.shape[0]
    masked = jnp.where(row_valid[:, None],
                       jnp.asarray(prev_scores[:, :k], jnp.float32), -jnp.inf)
    idx = jnp.argmax(masked, axis=0)
    scores = jnp.max(masked, axis=0)
    valid = gt_classes_oh.astype(bool) & jnp.isfinite(scores)
    w = jnp.asarray(img_scores, jnp.float32)
    return GroundTruth(
        boxes=prop_boxes[idx],
        classes=jnp.arange(k, dtype=jnp.int32),
        scores=jnp.where(valid, scores, 0.0),
        weights=jnp.where(valid, w, 0.0),
        index=idx.astype(jnp.int32),
        valid=valid,
    )


class CMILROIHead(nn.Module):
    """DAN + continuation-merged WSDDN MIL + K refinement branches."""

    num_classes: int = 20
    refine_k: int = 3
    mean_loss: bool = True
    size_epoch: int = 5000
    max_iter: int = 200000
    iou_thresholds: Sequence[float] = (0.5, 0.6)
    iou_labels: Sequence[int] = (0, -1, 1)
    dan_dims: Sequence[int] = (4096, 4096)
    dtype: Any = jnp.float32

    def setup(self):
        self.dan = DAN(fc_dims=tuple(self.dan_dims), dtype=self.dtype)
        self.wsddn = WSDDNHead(self.num_classes, dtype=self.dtype)
        self.refine = [
            OICRBranch(self.num_classes, has_reg=False, dtype=self.dtype,
                       name=f"box_refinery_{k}")
            for k in range(self.refine_k)
        ]
        self.matcher = Matcher(list(self.iou_thresholds), list(self.iou_labels))

    def _features(self, pooled, objectness, train):
        w = (objectness + 1.0).astype(pooled.dtype)
        x = pooled * w[:, None, None, None]
        return self.dan(x, train=train)

    def _merged_scores(self, c, d, boxes, prop_valid, cur_iter):
        """forward_cmil: cluster raw logits, softmax-product over cliques.
        Returns (merged scores (P, K), merged-row validity (P,))."""
        raw_scores = wsddn_scores(c, d, prop_valid)           # Oscores
        obn = jnp.sum(raw_scores, axis=1)                      # (P,)
        iou = box_ops.pairwise_iou(boxes, boxes)
        pv = prop_valid.astype(bool)
        pair_valid = pv[:, None] & pv[None, :]
        s = jnp.where(pv, obn, -1e9)
        iou = jnp.where(pair_valid, iou, -1.0)
        max_epoch = max(int(self.max_iter / self.size_epoch), 1)
        c32 = jnp.where(pv[:, None], jnp.asarray(c, jnp.float32), 0.0)
        d32 = jnp.where(pv[:, None], jnp.asarray(d, jnp.float32), 0.0)
        mc, md, ids, counts = roi_merge(s, iou, c32, d32, cur_iter,
                                        max_epoch, self.size_epoch)
        # a clique is real iff it received at least one valid proposal
        merged_valid = jnp.zeros(boxes.shape[0], jnp.int32).at[ids].max(
            pv.astype(jnp.int32)).astype(bool)
        return wsddn_scores(mc, md, merged_valid), merged_valid

    def losses(self, pooled, boxes, objectness, prop_valid, gt_classes_oh,
               cur_iter: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        feats = self._features(pooled, objectness, train=True)
        c, d = self.wsddn(feats)
        merged_scores, merged_valid = self._merged_scores(
            c, d, boxes, prop_valid, cur_iter)
        losses = {"loss_cls": mil_loss(merged_scores, gt_classes_oh,
                                       self.mean_loss)}
        img_scores = mil_image_scores(merged_scores)           # (K,)

        prev = jax.lax.stop_gradient(merged_scores)            # (P, K) clique rows
        row_valid = merged_valid
        for k in range(self.refine_k):
            gt = top1_mining_weighted(prev, boxes, row_valid, gt_classes_oh,
                                      jax.lax.stop_gradient(img_scores))
            cls, weights, index, _ = label_and_sample(
                gt, boxes, prop_valid, self.matcher, self.num_classes)
            sc, _ = self.refine[k](feats)
            losses[f"loss_cls_r{k}"] = weighted_ce_loss(sc, cls, weights,
                                                        prop_valid)
            probs = jax.nn.softmax(jnp.asarray(sc, jnp.float32), axis=-1)
            prev = jax.lax.stop_gradient(probs[:, : self.num_classes])
            row_valid = prop_valid                              # proposal rows again
        return losses

    def predict(self, pooled, boxes, objectness, prop_valid
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Inference: mean of K branch softmaxes (roi_heads_cmil.py:448-460);
        no merge at test time."""
        feats = self._features(pooled, objectness, train=False)
        probs = None
        for k in range(self.refine_k):
            sc, _ = self.refine[k](feats)
            pk = jax.nn.softmax(jnp.asarray(sc, jnp.float32), axis=-1)
            probs = pk if probs is None else probs + pk
        probs = probs / self.refine_k
        pred_boxes = jnp.tile(boxes, (1, self.num_classes))
        return probs, pred_boxes
