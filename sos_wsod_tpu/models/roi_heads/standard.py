"""Standard (Faster R-CNN) ROI heads, fixed-shape, with pseudo-label gating.

Parity targets:
 - detectron2 StandardROIHeads + FastRCNNConvFCHead + FastRCNNOutputLayers
   (reference: detectron2/detectron2/modeling/roi_heads/roi_heads.py:530-730,
   box_head.py, fast_rcnn.py — gt-append, IoU-0.5 matching, 512@25% sampling,
   CE + smooth_l1 losses, softmax/NMS inference) including the fork's
   ``smooth_l1_mean`` reg variant (fast_rcnn.py:311,534);
 - ubteacher StandardROIHeadsPseudoLab + FastRCNNFocaltLossOutputLayers
   (unbias/ubteacher/modeling/roi_heads/roi_heads.py:377-546, fast_rcnn.py:12-105):
   branch-gated loss computation and the (1-p)^gamma focal CE.

TPU-native: sampling/compaction are rank-based masked ops at a static 512
capacity; multi-level ROIAlign computes each level's pooled value and selects
by the box's assigned level (masked sum) — no dynamic gathers across levels.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import boxes as box_ops
from ...core.matcher import Matcher
from ...core.sampling import subsample_masks
from ...ops.roi_align import roi_align

_xavier_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def assign_boxes_to_levels(
    boxes: jnp.ndarray, min_level: int, max_level: int,
    canonical_box_size: float = 224.0, canonical_level: int = 4,
) -> jnp.ndarray:
    """d2 poolers.assign_boxes_to_levels: floor(canonical + log2(sqrt(area)/224))."""
    area = jnp.clip(box_ops.box_area(boxes), 1e-8, None)
    lvl = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(area) / canonical_box_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32) - min_level


def multilevel_roi_align(
    features: Sequence[jnp.ndarray],   # per level (H, W, C)
    strides: Sequence[int],
    boxes: jnp.ndarray,                # (P, 4)
    valid: jnp.ndarray,                # (P,)
    *,
    output_size: int = 7,
    sampling_ratio: int = 0,
    aligned: bool = True,
    min_level: int = 2,
) -> jnp.ndarray:
    """(P, C, S, S): ROIAlign each box on its assigned pyramid level.

    Each level pools only the boxes assigned to it (others masked invalid so
    their windows are degenerate), then a masked sum recombines — static
    shapes, level-count x pooling cost, vmap-friendly.
    """
    n_levels = len(features)
    lvl = assign_boxes_to_levels(boxes, min_level, min_level + n_levels - 1)
    out = None
    for i, (feat, stride) in enumerate(zip(features, strides)):
        sel = valid & (lvl == i)
        pooled = roi_align(
            feat, boxes, sel, spatial_scale=1.0 / stride,
            output_size=(output_size, output_size),
            sampling_ratio=sampling_ratio, aligned=aligned,
        )  # (P, C, S, S); invalid slots are zero
        out = pooled if out is None else out + pooled
    return out


def add_ground_truth_to_proposals(
    prop_boxes, prop_logits, prop_valid, gt_boxes, gt_valid
):
    """d2 add_ground_truth_to_proposals: append gt boxes as proposals with
    logit(1 - 1e-10) objectness (proposal_utils.py)."""
    import math

    gt_logit = math.log((1.0 - 1e-10) / 1e-10)
    boxes = jnp.concatenate([prop_boxes, gt_boxes], axis=0)
    logits = jnp.concatenate(
        [prop_logits, jnp.full((gt_boxes.shape[0],), gt_logit, prop_logits.dtype)]
    )
    valid = jnp.concatenate([prop_valid, gt_valid])
    return boxes, logits, valid


def label_and_sample_proposals(
    prop_boxes: jnp.ndarray,       # (P, 4) (already gt-appended if desired)
    prop_valid: jnp.ndarray,       # (P,)
    gt_boxes: jnp.ndarray,         # (G, 4)
    gt_classes: jnp.ndarray,       # (G,)
    gt_valid: jnp.ndarray,         # (G,)
    matcher: Matcher,
    rng: jax.Array,
    *,
    batch_size_per_image: int = 512,
    positive_fraction: float = 0.25,
    num_classes: int = 20,
):
    """Returns fixed-size sampled set (batch_size_per_image rows):
    (boxes, classes [num_classes = bg], matched_gt_idx, sampled_valid,
    fg_mask, stats)."""
    iou = box_ops.pairwise_iou(gt_boxes, prop_boxes)
    matched, labels = matcher(iou, gt_valid)
    has_gt = jnp.any(gt_valid)
    cls = jnp.where(labels == 1, gt_classes[matched], num_classes)
    cls = jnp.where(labels == -1, -1, cls)
    cls = jnp.where(has_gt, cls, num_classes)

    pos_mask = prop_valid & (cls >= 0) & (cls < num_classes)
    neg_mask = prop_valid & (cls == num_classes)
    pos_keep, neg_keep = subsample_masks(
        pos_mask, neg_mask, batch_size_per_image, positive_fraction, rng
    )
    sampled = pos_keep | neg_keep

    # compact to a static batch_size_per_image rows: order sampled first
    # (positives first for stable fg stats), pad rows marked invalid
    pri = (
        sampled.astype(jnp.float32) * 2.0
        + pos_keep.astype(jnp.float32)
        + jax.random.uniform(rng, sampled.shape) * 0.5
    )
    k = min(batch_size_per_image, prop_boxes.shape[0])
    _, idx = jax.lax.top_k(pri, k)
    out_valid = sampled[idx]
    out_boxes = jnp.where(out_valid[:, None], prop_boxes[idx], 0.0)
    out_cls = jnp.where(out_valid, cls[idx], num_classes)
    out_match = matched[idx]
    fg = out_valid & (out_cls < num_classes)
    stats = {
        "num_fg": jnp.sum(fg.astype(jnp.int32)),
        "num_bg": jnp.sum((out_valid & ~fg).astype(jnp.int32)),
    }
    return out_boxes, out_cls, out_match, out_valid, fg, stats


class FastRCNNConvFCHead(nn.Module):
    """NUM_CONV 3x3 convs + NUM_FC FCs (voc_baseline: 0 conv, 2 fc, 1024)."""

    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_conv):
            x = nn.Conv(self.conv_dim, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                        name=f"conv{i + 1}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fc):
            x = nn.Dense(self.fc_dim, dtype=self.dtype, kernel_init=_xavier_init,
                         name=f"fc{i + 1}")(x)
            x = nn.relu(x)
        return x


class FastRCNNOutputLayers(nn.Module):
    """cls_score (K+1) + bbox_pred (4 or 4K) linear heads."""

    num_classes: int = 20
    cls_agnostic_bbox_reg: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01), name="cls_score")(x)
        nb = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(nb * 4, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.001), name="bbox_pred")(x)
        return scores, deltas


def fast_rcnn_losses(
    scores: jnp.ndarray,        # (S, K+1)
    deltas: jnp.ndarray,        # (S, 4K) or (S, 4)
    sampled_boxes: jnp.ndarray, # (S, 4)
    gt_classes: jnp.ndarray,    # (S,) in [0, K] (K = bg), invalid rows = K
    gt_boxes: jnp.ndarray,      # (S, 4) matched gt box per row
    sampled_valid: jnp.ndarray, # (S,)
    fg: jnp.ndarray,            # (S,)
    *,
    num_classes: int,
    bbox_reg_weights=(10.0, 10.0, 5.0, 5.0),
    smooth_l1_beta: float = 0.0,
    box_reg_loss_type: str = "smooth_l1",
    loss_type: str = "CrossEntropy",
    focal_gamma: float = 1.5,
) -> Dict[str, jnp.ndarray]:
    n = jnp.maximum(jnp.sum(sampled_valid.astype(jnp.float32)), 1.0)
    logits = jnp.asarray(scores, jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    cls_idx = jnp.clip(gt_classes, 0, num_classes)
    ce = -jnp.take_along_axis(logp, cls_idx[:, None], axis=-1)[:, 0]
    ce = jnp.where(sampled_valid, ce, 0.0)
    if loss_type == "FocalLoss":
        # ubteacher FocalLoss (fast_rcnn.py:60-105): CE * (1-p)^gamma, sum / N
        p = jnp.exp(-ce)
        loss_cls = jnp.sum(ce * (1.0 - p) ** focal_gamma) / n
    else:
        loss_cls = jnp.sum(ce) / n  # CE mean over sampled

    # box regression on fg rows, class-specific column
    nb = deltas.shape[-1] // 4
    d = jnp.asarray(deltas, jnp.float32).reshape(deltas.shape[0], nb, 4)
    col = jnp.where(nb == 1, 0, jnp.clip(gt_classes, 0, nb - 1))
    pred = jnp.take_along_axis(d, col[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    tgt = box_ops.get_deltas(sampled_boxes, gt_boxes, bbox_reg_weights)
    diff = jnp.abs(pred - tgt)
    if smooth_l1_beta > 0:
        l1 = jnp.where(diff < smooth_l1_beta,
                       0.5 * diff * diff / smooth_l1_beta, diff - 0.5 * smooth_l1_beta)
    else:
        l1 = diff
    l1 = jnp.where(fg[:, None], l1, 0.0)
    if box_reg_loss_type == "smooth_l1_mean":
        n_fg_el = jnp.maximum(jnp.sum(fg.astype(jnp.float32)) * 4.0, 1.0)
        loss_box = jnp.sum(l1) / n_fg_el
    else:
        loss_box = jnp.sum(l1) / n
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}


class StandardROIHeads(nn.Module):
    """Box-only StandardROIHeads (mask head optional, added separately)."""

    in_features: Sequence[str] = ("p2", "p3", "p4", "p5")
    strides: Sequence[int] = (4, 8, 16, 32)
    num_classes: int = 20
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    iou_thresholds: Sequence[float] = (0.5,)
    iou_labels: Sequence[int] = (0, 1)
    proposal_append_gt: bool = True
    pooler_resolution: int = 7
    pooler_sampling_ratio: int = 0
    pooler_aligned: bool = True
    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    cls_agnostic_bbox_reg: bool = False
    bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    smooth_l1_beta: float = 0.0
    box_reg_loss_type: str = "smooth_l1"
    loss_type: str = "CrossEntropy"  # or "FocalLoss" (ubteacher)
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.box_head = FastRCNNConvFCHead(
            num_conv=self.num_conv, conv_dim=self.conv_dim,
            num_fc=self.num_fc, fc_dim=self.fc_dim, dtype=self.dtype,
        )
        self.box_predictor = FastRCNNOutputLayers(
            num_classes=self.num_classes,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg, dtype=self.dtype,
        )
        self.matcher = Matcher(list(self.iou_thresholds), list(self.iou_labels))

    def _pool_and_predict(self, features, boxes, valid):
        feats = [features[f] for f in self.in_features]
        pooled = multilevel_roi_align(
            feats, self.strides, boxes, valid,
            output_size=self.pooler_resolution,
            sampling_ratio=self.pooler_sampling_ratio,
            aligned=self.pooler_aligned,
        )  # (S, C, R, R)
        x = jnp.transpose(pooled, (0, 2, 3, 1))  # NHWC for the conv/fc head
        x = self.box_head(x)
        return self.box_predictor(x)

    def losses(
        self,
        features: Dict[str, jnp.ndarray],
        prop_boxes: jnp.ndarray, prop_logits: jnp.ndarray, prop_valid: jnp.ndarray,
        gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray, gt_valid: jnp.ndarray,
        rng: jax.Array,
        *,
        append_gt: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        if self.proposal_append_gt and append_gt:
            prop_boxes, prop_logits, prop_valid = add_ground_truth_to_proposals(
                prop_boxes, prop_logits, prop_valid, gt_boxes, gt_valid
            )
        s_boxes, s_cls, s_match, s_valid, fg, _ = label_and_sample_proposals(
            prop_boxes, prop_valid, gt_boxes, gt_classes, gt_valid,
            self.matcher, rng,
            batch_size_per_image=self.batch_size_per_image,
            positive_fraction=self.positive_fraction,
            num_classes=self.num_classes,
        )
        scores, deltas = self._pool_and_predict(features, s_boxes, s_valid)
        return fast_rcnn_losses(
            scores, deltas, s_boxes, s_cls, gt_boxes[s_match], s_valid, fg,
            num_classes=self.num_classes,
            bbox_reg_weights=self.bbox_reg_weights,
            smooth_l1_beta=self.smooth_l1_beta,
            box_reg_loss_type=self.box_reg_loss_type,
            loss_type=self.loss_type,
        )

    def predict(
        self,
        features: Dict[str, jnp.ndarray],
        prop_boxes: jnp.ndarray, prop_valid: jnp.ndarray,
        image_hw: jnp.ndarray,
        *,
        score_thresh: float = None,
    ):
        from ..postprocess import fast_rcnn_inference_single

        scores, deltas = self._pool_and_predict(features, prop_boxes, prop_valid)
        probs = jax.nn.softmax(jnp.asarray(scores, jnp.float32), axis=-1)
        pred_boxes = box_ops.apply_deltas(
            jnp.asarray(deltas, jnp.float32), prop_boxes, self.bbox_reg_weights
        )
        det = fast_rcnn_inference_single(
            pred_boxes, probs, prop_valid, image_hw,
            score_thresh=self.score_thresh_test if score_thresh is None else score_thresh,
            nms_thresh=self.nms_thresh_test,
            topk=self.detections_per_image,
        )
        return det, probs, pred_boxes

    @classmethod
    def from_cfg(cls, cfg, dtype=jnp.float32):
        strides_map = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
        in_features = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        return cls(
            in_features=in_features,
            strides=tuple(strides_map[f] for f in in_features),
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            iou_thresholds=tuple(cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS),
            iou_labels=tuple(cfg.MODEL.ROI_HEADS.IOU_LABELS),
            proposal_append_gt=cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT,
            pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            pooler_sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
            pooler_aligned=cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE == "ROIAlignV2",
            num_conv=cfg.MODEL.ROI_BOX_HEAD.NUM_CONV,
            conv_dim=cfg.MODEL.ROI_BOX_HEAD.CONV_DIM,
            num_fc=cfg.MODEL.ROI_BOX_HEAD.NUM_FC,
            fc_dim=cfg.MODEL.ROI_BOX_HEAD.FC_DIM,
            cls_agnostic_bbox_reg=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
            bbox_reg_weights=tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
            smooth_l1_beta=cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            box_reg_loss_type=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE,
            loss_type=cfg.MODEL.ROI_HEADS.LOSS,
            score_thresh_test=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            nms_thresh_test=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            dtype=dtype,
        )
