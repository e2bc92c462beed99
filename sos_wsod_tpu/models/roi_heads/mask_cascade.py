"""Mask head and Cascade ROI heads for the stage-2/3 Faster R-CNN stack.

Parity targets:
 - MaskRCNNConvUpsampleHead / StandardROIMaskHeadsPseudoLab (reference:
   unbias/ubteacher/modeling/roi_heads/mask_heads.py + roi_heads.py:549-793,
   stock d2 mask_head.py): 4x conv3x3(256) + ReLU, 2x2 stride-2 deconv +
   ReLU, 1x1 predictor with K channels; loss = BCE-with-logits on the
   gt-class channel over foreground samples against the GT mask cropped to
   the proposal and resized to 28x28 (d2 crop_and_resize);
 - CascadeROIHeadsPseudoLab (roi_heads.py:39-374, stock d2 cascade_rcnn.py):
   3 stages with IoU thresholds (0.5, 0.6, 0.7) and class-agnostic box
   regression; stage k>0 RE-MATCHES the boxes decoded by stage k-1 (no
   re-sampling); inference averages the per-stage class scores and decodes
   boxes from the last stage.

TPU notes: the mask crop is our roi_align over the per-sample matched GT
bit-mask (vmapped, static 28x28 output); cascade stages are a Python loop of
three static stages inside one jit program.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core import boxes as box_ops
from ...core.matcher import Matcher
from ...ops.roi_align import roi_align
from .standard import (FastRCNNConvFCHead, FastRCNNOutputLayers,
                       add_ground_truth_to_proposals, fast_rcnn_losses,
                       label_and_sample_proposals, multilevel_roi_align)

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class MaskRCNNConvUpsampleHead(nn.Module):
    num_classes: int = 20
    num_conv: int = 4
    conv_dim: int = 256
    cls_agnostic_mask: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (S, R, R, C) -> mask logits (S, 2R, 2R, K or 1)."""
        for i in range(self.num_conv):
            x = nn.Conv(self.conv_dim, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=_conv_init, name=f"mask_fcn{i + 1}")(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(self.conv_dim, (2, 2), strides=(2, 2),
                             dtype=self.dtype, kernel_init=_conv_init,
                             name="deconv")(x)
        x = nn.relu(x)
        k = 1 if self.cls_agnostic_mask else self.num_classes
        return nn.Conv(k, (1, 1), dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.001),
                       name="predictor")(x)


def crop_gt_masks(gt_masks: jnp.ndarray, boxes: jnp.ndarray,
                  matched: jnp.ndarray, out_size: int = 28) -> jnp.ndarray:
    """d2 BitMasks.crop_and_resize: per sample, the matched GT bit-mask
    cropped to the proposal box and resized to (out_size, out_size) with
    aligned bilinear sampling, then thresholded at 0.5.

    gt_masks: (G, Hm, Wm) {0,1}; boxes: (S, 4); matched: (S,) gt index.
    Returns (S, out_size, out_size) float targets."""
    per_sample = gt_masks[matched].astype(jnp.float32)        # (S, Hm, Wm)

    def one(mask, box):
        pooled = roi_align(mask[:, :, None], box[None], jnp.ones(1, bool),
                           spatial_scale=1.0, output_size=(out_size, out_size),
                           sampling_ratio=0, aligned=True)     # (1,1,R,R)
        return pooled.reshape(out_size, out_size)

    crops = jax.vmap(one)(per_sample, boxes)
    return (crops >= 0.5).astype(jnp.float32)


def mask_rcnn_loss(mask_logits: jnp.ndarray, gt_classes: jnp.ndarray,
                   fg: jnp.ndarray, mask_targets: jnp.ndarray,
                   cls_agnostic: bool = False) -> jnp.ndarray:
    """BCE-with-logits on the gt-class channel over fg samples, mean over
    fg*R*R elements (d2 mask_rcnn_loss)."""
    s, r, _, k = mask_logits.shape
    if cls_agnostic:
        logits = mask_logits[..., 0]
    else:
        safe = jnp.clip(gt_classes, 0, k - 1)
        logits = jnp.take_along_axis(
            mask_logits, safe[:, None, None, None], axis=3)[..., 0]
    z = jnp.asarray(logits, jnp.float32)
    t = mask_targets
    bce = jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))
    bce = jnp.where(fg[:, None, None], bce, 0.0)
    denom = jnp.maximum(jnp.sum(fg.astype(jnp.float32)) * r * r, 1.0)
    return jnp.sum(bce) / denom


class MaskROIHeads(nn.Module):
    """Mask branch to pair with StandardROIHeads (the reference's
    StandardROIMaskHeadsPseudoLab keeps box and mask branches in one class;
    here the mask branch is a separate module sharing the same proposals).
    """

    in_features: Sequence[str] = ("p2", "p3", "p4", "p5")
    strides: Sequence[int] = (4, 8, 16, 32)
    num_classes: int = 20
    pooler_resolution: int = 14
    num_conv: int = 4
    conv_dim: int = 256
    cls_agnostic_mask: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.mask_head = MaskRCNNConvUpsampleHead(
            num_classes=self.num_classes, num_conv=self.num_conv,
            conv_dim=self.conv_dim, cls_agnostic_mask=self.cls_agnostic_mask,
            dtype=self.dtype)

    def _pool(self, features, boxes, valid):
        feats = [features[f] for f in self.in_features]
        pooled = multilevel_roi_align(
            feats, self.strides, boxes, valid,
            output_size=self.pooler_resolution, sampling_ratio=0,
            aligned=True)                                     # (S, C, R, R)
        return jnp.transpose(pooled, (0, 2, 3, 1))

    def losses(self, features, boxes, valid, gt_classes, fg, gt_masks,
               matched) -> Dict[str, jnp.ndarray]:
        logits = self.mask_head(self._pool(features, boxes, valid))
        targets = crop_gt_masks(gt_masks, boxes,
                                matched, self.pooler_resolution * 2)
        return {"loss_mask": mask_rcnn_loss(
            logits, gt_classes, fg & valid, targets, self.cls_agnostic_mask)}

    def predict(self, features, boxes, valid, pred_classes) -> jnp.ndarray:
        """Returns per-detection (S, 2R, 2R) mask probabilities."""
        logits = self.mask_head(self._pool(features, boxes, valid))
        if self.cls_agnostic_mask:
            sel = logits[..., 0]
        else:
            safe = jnp.clip(pred_classes, 0, self.num_classes - 1)
            sel = jnp.take_along_axis(
                logits, safe[:, None, None, None], axis=3)[..., 0]
        return jax.nn.sigmoid(jnp.asarray(sel, jnp.float32))


class CascadeROIHeads(nn.Module):
    """3-stage cascade with class-agnostic regression."""

    in_features: Sequence[str] = ("p2", "p3", "p4", "p5")
    strides: Sequence[int] = (4, 8, 16, 32)
    num_classes: int = 20
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    cascade_ious: Sequence[float] = (0.5, 0.6, 0.7)
    cascade_weights: Sequence[Tuple[float, float, float, float]] = (
        (10.0, 10.0, 5.0, 5.0), (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0))
    proposal_append_gt: bool = True
    pooler_resolution: int = 7
    num_fc: int = 2
    fc_dim: int = 1024
    smooth_l1_beta: float = 0.0
    loss_type: str = "CrossEntropy"
    dtype: Any = jnp.float32

    def setup(self):
        n = len(self.cascade_ious)
        self.box_heads = [
            FastRCNNConvFCHead(num_conv=0, conv_dim=256, num_fc=self.num_fc,
                               fc_dim=self.fc_dim, dtype=self.dtype,
                               name=f"box_head_{k}")
            for k in range(n)
        ]
        self.box_predictors = [
            FastRCNNOutputLayers(num_classes=self.num_classes,
                                 cls_agnostic_bbox_reg=True, dtype=self.dtype,
                                 name=f"box_predictor_{k}")
            for k in range(n)
        ]
        self.matchers = [
            Matcher([iou], [0, 1]) for iou in self.cascade_ious
        ]

    def _run_stage(self, k, features, boxes, valid):
        feats = [features[f] for f in self.in_features]
        pooled = multilevel_roi_align(
            feats, self.strides, boxes, valid,
            output_size=self.pooler_resolution, sampling_ratio=0,
            aligned=True)
        x = jnp.transpose(pooled, (0, 2, 3, 1))
        x = self.box_heads[k](x)
        return self.box_predictors[k](x)  # (scores (S, K+1), deltas (S, 4))

    def _decode(self, k, deltas, boxes, image_hw):
        out = box_ops.apply_deltas(jnp.asarray(deltas, jnp.float32), boxes,
                                   self.cascade_weights[k])[:, :4]
        return box_ops.clip_boxes(out, (image_hw[0], image_hw[1]))

    def losses(self, features, prop_boxes, prop_logits, prop_valid,
               gt_boxes, gt_classes, gt_valid, rng, image_hw,
               *, append_gt: bool = True) -> Dict[str, jnp.ndarray]:
        if self.proposal_append_gt and append_gt:
            prop_boxes, prop_logits, prop_valid = add_ground_truth_to_proposals(
                prop_boxes, prop_logits, prop_valid, gt_boxes, gt_valid)
        losses = {}
        boxes, valid = prop_boxes, prop_valid
        s_cls = s_match = fg = None
        for k, iou in enumerate(self.cascade_ious):
            if k == 0:
                boxes, s_cls, s_match, valid, fg, _ = label_and_sample_proposals(
                    boxes, valid, gt_boxes, gt_classes, gt_valid,
                    self.matchers[0], rng,
                    batch_size_per_image=self.batch_size_per_image,
                    positive_fraction=self.positive_fraction,
                    num_classes=self.num_classes)
            else:
                # re-match WITHOUT sampling (d2 _match_and_label_boxes)
                quality = box_ops.pairwise_iou(gt_boxes, boxes)
                matched, labels = self.matchers[k](quality, gt_valid)
                has_gt = jnp.any(gt_valid)
                m_cls = gt_classes[matched]
                s_cls = jnp.where(labels == 1, m_cls, self.num_classes)
                s_cls = jnp.where(has_gt, s_cls, self.num_classes)
                s_match = matched
                fg = valid & (s_cls < self.num_classes)
            scores, deltas = self._run_stage(k, features, boxes, valid)
            stage_losses = fast_rcnn_losses(
                scores, deltas, boxes, s_cls, gt_boxes[s_match], valid, fg,
                num_classes=self.num_classes,
                bbox_reg_weights=self.cascade_weights[k],
                smooth_l1_beta=self.smooth_l1_beta,
                loss_type=self.loss_type)
            losses.update({f"{n}_stage{k}": v for n, v in stage_losses.items()})
            boxes = jax.lax.stop_gradient(
                self._decode(k, deltas, boxes, image_hw))
        return losses

    def predict_scores_boxes(self, features, prop_boxes, prop_valid,
                             image_hw):
        """Mean class scores across stages; boxes from the last stage
        (d2 CascadeROIHeads inference). Returns (scores (S, K+1),
        boxes (S, 4))."""
        boxes, valid = prop_boxes, prop_valid
        all_scores = []
        for k in range(len(self.cascade_ious)):
            scores, deltas = self._run_stage(k, features, boxes, valid)
            all_scores.append(jax.nn.softmax(
                jnp.asarray(scores, jnp.float32), axis=-1))
            boxes = self._decode(k, deltas, boxes, image_hw)
        mean_scores = sum(all_scores) / len(all_scores)
        return mean_scores, boxes
