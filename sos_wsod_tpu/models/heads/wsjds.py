"""WSJDS ROI head: joint weakly-supervised detection + segmentation.

Parity target: WSJDSROIHeads (reference: uwsod/projects/WSL/wsl/modeling/
seg_heads/wsjds_heads.py:36-718) — the CSC detection head plus:
 - det -> seg: CPG maps thresholded into per-class {pos, neg, ignore} seg
   targets with balancing weights (:652-677, tau=0.7, fg=0.1, bg=0.005);
 - seg: the ASPP head over backbone features, weighted BCE loss
   (seg_heads.py:112-151), optional denseCRF consistency constraint;
 - seg -> det: peak-normalised sigmoid masks re-enter the CSC op as
   pseudo-CPGs, producing a second pair of "mask_" CSC losses with weight
   0.1 (:421-443);
 - inference: ASPP masks upsampled to image size; each detection's
   pred_mask is its class's mask cropped to the (integer) box
   (:679-718 _get_ins_seg_result).

The head is functional: the meta-architecture provides pooled ROI features,
backbone features for the seg branch, and the CPG maps (see
heads/csc.py:compute_cpg).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.csc import csc
from .aspp import (ASPPHead, constraint_loss, crf_constraint, resize_bilinear,
                   seg_targets_from_cpg, sem_seg_loss)
from .csc import csc_mil_loss
from .dan import DAN
from .wsddn import WSDDNHead, mil_image_scores, wsddn_scores


class WSJDSROIHead(nn.Module):
    """CSC detection + ASPP segmentation with det<->seg mutual supervision."""

    num_classes: int = 20
    mean_loss: bool = True
    tau: float = 0.7
    fg_threshold: float = 0.1
    bg_threshold: float = 0.005
    csc_fg_threshold: float = 0.1
    context_scale: float = 1.8
    seg_loss_weight: float = 1.0
    mask_csc_loss_weight: float = 0.1
    constraint: bool = False
    dan_dims: Sequence[int] = (4096, 4096)
    aspp_dims: Sequence[int] = (1024, 1024)
    dtype: Any = jnp.float32

    def setup(self):
        self.dan = DAN(fc_dims=tuple(self.dan_dims), dtype=self.dtype)
        self.wsddn = WSDDNHead(self.num_classes, dtype=self.dtype)
        self.sem_seg_head = ASPPHead(self.num_classes,
                                     conv_dims=tuple(self.aspp_dims),
                                     dtype=self.dtype)

    def scores(self, pooled, objectness, prop_valid, train: bool = True):
        w = (objectness + 1.0).astype(pooled.dtype)
        feats = self.dan(pooled * w[:, None, None, None], train=train)
        c, d = self.wsddn(feats)
        return wsddn_scores(c, d, prop_valid)

    def _csc_losses(self, scores, preds_img, cpgs, boxes, prop_valid,
                    gt_classes_oh, use_csc, prefix="", loss_weight=1.0):
        w, pl, nl = csc(cpgs, gt_classes_oh, preds_img, boxes, prop_valid,
                        fg_threshold=self.csc_fg_threshold,
                        context_scale=self.context_scale)
        w_pos = jnp.maximum(w, 0.0)
        w_neg = jnp.abs(jnp.minimum(w, 0.0))
        w_pos = jnp.where(use_csc, w_pos, 1.0)
        w_neg = jnp.where(use_csc, w_neg, 0.0)
        w_pos = jnp.where(prop_valid[:, None], w_pos, 0.0)
        w_neg = jnp.where(prop_valid[:, None], w_neg, 0.0)
        base = csc_mil_loss(scores, w_pos, w_neg, pl, nl, self.mean_loss)
        return {prefix + k: v * loss_weight for k, v in base.items()}

    def losses(self, pooled, boxes, objectness, prop_valid, gt_classes_oh,
               cpgs: jnp.ndarray, seg_features: jnp.ndarray,
               image: jnp.ndarray, use_csc: jnp.ndarray
               ) -> Dict[str, jnp.ndarray]:
        """cpgs: (K, H, W) in image coords; seg_features: (Hf, Wf, C)
        backbone feature for the ASPP branch; image: (H, W, 3) de-normalised
        pixels (only used when ``constraint``)."""
        scores = self.scores(pooled, objectness, prop_valid, train=True)
        preds_img = mil_image_scores(scores)

        losses = self._csc_losses(scores, preds_img, cpgs, boxes, prop_valid,
                                  gt_classes_oh, use_csc)

        # det -> seg (skipped past CSC_MAX_ITER in the reference, :404-406 —
        # losses are masked to zero instead to keep one compiled program)
        k, h, w = cpgs.shape
        targets, weights = seg_targets_from_cpg(
            cpgs, gt_classes_oh, preds_img, tau=self.tau,
            fg_threshold=self.fg_threshold, bg_threshold=self.bg_threshold)

        seg_logits = self.sem_seg_head(seg_features, train=True)  # (Hf,Wf,K)
        seg_up = resize_bilinear(seg_logits, (h, w))              # (H,W,K)
        seg_chw = jnp.moveaxis(seg_up, -1, 0)
        active = use_csc.astype(jnp.float32)
        losses["loss_sem_seg"] = active * sem_seg_loss(
            seg_up, jnp.moveaxis(targets, 0, -1),
            jnp.moveaxis(weights, 0, -1), self.seg_loss_weight)

        x_sigmoid = jax.nn.sigmoid(jnp.asarray(seg_chw, jnp.float32))
        if self.constraint:
            x_crf, w_crf = crf_constraint(image, x_sigmoid)
            losses["loss_constraint"] = active * constraint_loss(
                x_sigmoid, x_crf, w_crf)

        # seg -> det: peak-normalised masks as pseudo-CPGs (:421-443)
        peak = jnp.maximum(
            jnp.max(x_sigmoid, axis=(1, 2), keepdims=True), 1e-12)
        mask_cpgs = jax.lax.stop_gradient(x_sigmoid / peak)
        losses.update(self._csc_losses(
            scores, preds_img, mask_cpgs, boxes, prop_valid, gt_classes_oh,
            use_csc, prefix="mask_", loss_weight=self.mask_csc_loss_weight))
        return losses

    def predict(self, pooled, boxes, objectness, prop_valid, seg_features,
                image_size: Tuple[int, int]
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (scores (P, K+1), boxes (P, 4), masks (K, H, W) sigmoid
        probabilities at image size). Per-detection mask cropping
        (_get_ins_seg_result) is a post-NMS host step: use
        :func:`crop_instance_masks`."""
        scores = self.scores(pooled, objectness, prop_valid, train=False)
        scores = jnp.concatenate(
            [scores, jnp.zeros((scores.shape[0], 1), scores.dtype)], axis=1)
        seg_logits = self.sem_seg_head(seg_features, train=False)
        seg_up = resize_bilinear(jax.nn.sigmoid(seg_logits), image_size)
        return scores, boxes, jnp.moveaxis(seg_up, -1, 0)


def crop_instance_masks(masks: jnp.ndarray, pred_boxes: jnp.ndarray,
                        pred_classes: jnp.ndarray) -> jnp.ndarray:
    """_get_ins_seg_result (wsjds_heads.py:679-718): each detection's mask is
    its class's semantic mask zeroed outside the integer-truncated box.
    masks: (K, H, W); pred_boxes: (N, 4); returns (N, H, W)."""
    k, h, w = masks.shape
    per_det = masks[pred_classes]                       # (N, H, W)
    x0 = pred_boxes[:, 0].astype(jnp.int32)
    y0 = pred_boxes[:, 1].astype(jnp.int32)
    x1 = pred_boxes[:, 2].astype(jnp.int32)
    y1 = pred_boxes[:, 3].astype(jnp.int32)
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    inside = ((ys >= y0[:, None, None]) & (ys < y1[:, None, None])
              & (xs >= x0[:, None, None]) & (xs < x1[:, None, None]))
    return jnp.where(inside, per_det, 0.0)
