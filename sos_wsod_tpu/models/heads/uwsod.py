"""UWSOD ROI head: unified WSOD with learned proposals and box regression.

Parity target: UWSODROIHeads (reference: uwsod/projects/WSL/wsl/modeling/
roi_heads/roi_heads_uwsod.py:39-1393):
 - objectness weighting is sigmoid(objectness + 1) when the proposals come
   from the learned RPN (:449-452), plain (objectness + 1) otherwise;
 - DAN + WSDDN MIL loss, then K refinement branches; branch k's pseudo-GT is
   mined from the PREVIOUS branch's predictions — including its REGRESSED
   class-specific boxes (:479-545 — prev_pred_boxes update), via MIST or
   top-1-per-class mining weighted by the image-level class scores
   (get_pgt_top_k need_weight=True, :780-894);
 - optional per-branch subsampling (WSL.SAMPLING.*): a fixed budget of
   fg/bg proposals keeps its label, everything else is ignored (-1)
   (_sample_proposals_wsl, :1128-1167) — realised here as masking, which is
   exactly what the reference's scatter of -1 does;
 - the LAST branch's mining also produces the pseudo-GT that trains the
   weakly-supervised RPN (:556-563, consumed via RPNWSL.get_losses);
 - inference ensembles the K branch softmaxes and mean regression deltas
   (fast_rcnn_oicr.py predict_probs_K/predict_boxes_K).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core import boxes as box_ops
from ...core.instances import GroundTruth
from ...core.matcher import Matcher
from ...core.sampling import subsample_masks
from .dan import DAN
from .oicr import OICRBranch, box_reg_loss, weighted_ce_loss
from .oicr_plus import mist_mining
from .wsddn import WSDDNHead, mil_image_scores, mil_loss, wsddn_scores


def gather_class_boxes(prop_boxes: jnp.ndarray, idx: jnp.ndarray,
                       cls: jnp.ndarray) -> jnp.ndarray:
    """prop_boxes (P, 4) or (P, K, 4); pick box for (proposal idx, class)."""
    if prop_boxes.ndim == 2:
        return prop_boxes[idx]
    return prop_boxes[idx, cls]


def top1_mining_img_weighted(
    prev_scores: jnp.ndarray,    # (P, K) or (P, K+1)
    prop_boxes: jnp.ndarray,     # (P, 4) or (P, K, 4) class-specific boxes
    prop_valid: jnp.ndarray,
    gt_classes_oh: jnp.ndarray,  # (K,)
    img_logits: jnp.ndarray,     # (K,) image-level class scores (weights)
) -> GroundTruth:
    """get_pgt_top_k top_k=1, need_weight=True (roi_heads_uwsod.py:780-894)."""
    k = gt_classes_oh.shape[0]
    masked = jnp.where(prop_valid[:, None],
                       jnp.asarray(prev_scores[:, :k], jnp.float32), -jnp.inf)
    idx = jnp.argmax(masked, axis=0)
    scores = jnp.max(masked, axis=0)
    valid = gt_classes_oh.astype(bool) & jnp.isfinite(scores)
    cls = jnp.arange(k, dtype=jnp.int32)
    return GroundTruth(
        boxes=gather_class_boxes(prop_boxes, idx, cls),
        classes=cls,
        scores=jnp.where(valid, scores, 0.0),
        weights=jnp.where(valid, jnp.asarray(img_logits, jnp.float32), 0.0),
        index=idx.astype(jnp.int32),
        valid=valid,
    )


def label_and_sample_boxes(
    gt: GroundTruth,
    prop_boxes: jnp.ndarray,
    prop_valid: jnp.ndarray,
    matcher: Matcher,
    num_classes: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Like oicr_plus.label_and_sample but also returns the MATCHED pseudo-GT
    box per proposal (needed when pgt boxes are regressed, not proposals).
    Returns (cls (P,), weights (P,), gt_boxes (P, 4), fg (P,))."""
    iou = box_ops.pairwise_iou(gt.boxes, prop_boxes)
    matched, labels = matcher(iou, gt.valid)
    m_cls = gt.classes[matched]
    cls = jnp.where(labels == 1, m_cls,
                    jnp.where(labels == 0, num_classes, -1))
    weights = gt.weights[matched]
    weights = jnp.where(cls == -1, 0.0, weights)
    weights = jnp.where(jnp.any(gt.valid), weights, 0.0)
    fg = prop_valid & (cls >= 0) & (cls < num_classes)
    return cls, weights, gt.boxes[matched], fg


class UWSODROIHead(nn.Module):
    """DAN + WSDDN + K regressing refinement branches + RPN pseudo-GT."""

    num_classes: int = 20
    refine_k: int = 4
    refine_reg: Sequence[bool] = (True, True, True, True)
    refine_mist: bool = False
    mist_p: float = 0.10
    mist_thre: float = 0.05
    rpn_on: bool = True
    sampling_on: bool = False
    batch_sizes: Sequence[int] = (4096, 4096, 4096, 4096)
    positive_fractions: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    mean_loss: bool = True
    smooth_l1_beta: float = 0.0
    bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    iou_thresholds: Sequence[float] = (0.5, 0.6)
    iou_labels: Sequence[int] = (0, -1, 1)
    seed_cap: int = 1024
    dan_dims: Sequence[int] = (4096, 4096)
    dtype: Any = jnp.float32

    def setup(self):
        self.dan = DAN(fc_dims=tuple(self.dan_dims), dtype=self.dtype)
        self.wsddn = WSDDNHead(self.num_classes, dtype=self.dtype)
        self.refine = [
            OICRBranch(self.num_classes, has_reg=self.refine_reg[k],
                       dtype=self.dtype, name=f"box_refinery_{k}")
            for k in range(self.refine_k)
        ]
        self.matcher = Matcher(list(self.iou_thresholds),
                               list(self.iou_labels))

    def _features(self, pooled, objectness, train):
        if self.rpn_on:
            w = jax.nn.sigmoid(objectness + 1.0).astype(pooled.dtype)
        else:
            w = (objectness + 1.0).astype(pooled.dtype)
        return self.dan(pooled * w[:, None, None, None], train=train)

    def _mine(self, prev_scores, prev_boxes, prop_valid, gt_oh, img_logits):
        if self.refine_mist:
            base = prev_boxes if prev_boxes.ndim == 2 else prev_boxes[:, 0]
            gt = mist_mining(prev_scores, base, prop_valid, gt_oh,
                             mist_p=self.mist_p, mist_thre=self.mist_thre,
                             seed_cap=self.seed_cap)
            if prev_boxes.ndim == 3:
                import dataclasses

                boxes = gather_class_boxes(prev_boxes, gt.index, gt.classes)
                gt = dataclasses.replace(gt, boxes=boxes)
            return gt
        return top1_mining_img_weighted(prev_scores, prev_boxes, prop_valid,
                                        gt_oh, img_logits)

    def losses(self, pooled, boxes, objectness, prop_valid, gt_classes_oh,
               rng: jax.Array) -> Tuple[Dict[str, jnp.ndarray], GroundTruth]:
        """Returns (losses, pseudo-GT for the weak RPN loss). ``rng`` drives
        the optional per-branch fg/bg subsampling."""
        feats = self._features(pooled, objectness, train=True)
        c, d = self.wsddn(feats)
        scores = wsddn_scores(c, d, prop_valid)
        losses = {"loss_cls": mil_loss(scores, gt_classes_oh, self.mean_loss)}
        img_logits = jax.lax.stop_gradient(mil_image_scores(scores))

        prev_scores = jax.lax.stop_gradient(scores)
        prev_boxes = boxes                      # (P, 4) -> (P, K, 4) later
        for k in range(self.refine_k):
            gt = self._mine(prev_scores, prev_boxes, prop_valid,
                            gt_classes_oh, img_logits)
            cls, weights, gt_boxes, fg = label_and_sample_boxes(
                gt, boxes, prop_valid, self.matcher, self.num_classes)
            if self.sampling_on:
                rng, sub = jax.random.split(rng)
                pos_keep, neg_keep = subsample_masks(
                    fg, prop_valid & (cls == self.num_classes),
                    self.batch_sizes[k], self.positive_fractions[k], sub)
                cls = jnp.where(pos_keep | neg_keep, cls, -1)

            sc, dl = self.refine[k](feats)
            losses[f"loss_cls_r{k}"] = weighted_ce_loss(sc, cls, weights,
                                                        prop_valid)
            if self.refine_reg[k]:
                losses[f"loss_box_reg_r{k}"] = box_reg_loss(
                    dl, boxes, gt_boxes, cls, prop_valid,
                    num_classes=self.num_classes, beta=self.smooth_l1_beta,
                    weights=self.bbox_reg_weights)

            probs = jax.nn.softmax(jnp.asarray(sc, jnp.float32), axis=-1)
            prev_scores = jax.lax.stop_gradient(probs[:, : self.num_classes])
            if self.refine_reg[k]:
                decoded = box_ops.apply_deltas(
                    jnp.asarray(dl, jnp.float32), boxes,
                    self.bbox_reg_weights)           # (P, K*4)
                prev_boxes = jax.lax.stop_gradient(
                    decoded.reshape(-1, self.num_classes, 4))
            else:
                prev_boxes = boxes

        # pseudo-GT for the weak RPN (roi_heads_uwsod.py:556-563; top-k path)
        rpn_gt = top1_mining_img_weighted(prev_scores, prev_boxes, prop_valid,
                                          gt_classes_oh, img_logits)
        return losses, rpn_gt

    def predict(self, pooled, boxes, objectness, prop_valid
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
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
            pred_boxes = box_ops.apply_deltas(deltas, boxes,
                                              self.bbox_reg_weights)
        else:
            pred_boxes = jnp.tile(boxes, (1, self.num_classes))
        return probs, pred_boxes
