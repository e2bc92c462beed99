"""Faster R-CNN meta-architecture with pseudo-label branch gating (stages 2-3).

Parity targets:
 - detectron2 GeneralizedRCNN (reference: detectron2/detectron2/modeling/
   meta_arch/rcnn.py) — backbone -> RPN -> ROI heads;
 - ubteacher TwoStagePseudoLabGeneralizedRCNN (unbias/ubteacher/modeling/
   meta_arch/rcnn.py:7-105): forward(branch=...) with
   "supervised" (losses), "unsup_data_weak" (no-grad proposals + ROI
   predictions for pseudo-labeling), "val_loss" (losses without gt-append).

TPU-native: per-image computation; the trainer vmaps over the batch and the
teacher/student pair shares this module with different param pytrees.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.fpn import ResNetFPN
from ..proposal_generator.rpn import RPN
from ..roi_heads.standard import StandardROIHeads


class GeneralizedRCNN(nn.Module):
    num_classes: int = 20
    pixel_mean: Sequence[float] = (103.530, 116.280, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    depth: int = 50
    freeze_at: int = 2
    fpn_out_channels: int = 256
    rpn_kw: Dict[str, Any] = None
    roi_kw: Dict[str, Any] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNetFPN(
            depth=self.depth, freeze_at=self.freeze_at,
            out_channels=self.fpn_out_channels, dtype=self.dtype,
        )
        rpn_kw = dict(self.rpn_kw or {})
        roi_kw = dict(self.roi_kw or {})
        rpn_kw.setdefault("in_channels", self.fpn_out_channels)
        roi_kw.setdefault("num_classes", self.num_classes)
        self.proposal_generator = RPN(dtype=self.dtype, **rpn_kw)
        self.roi_heads = StandardROIHeads(dtype=self.dtype, **roi_kw)

    def _normalize(self, image: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, self.dtype)
        std = jnp.asarray(self.pixel_std, self.dtype)
        return (image.astype(self.dtype) - mean) / std

    def _features(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """image: (H, W, 3) single image -> per-level (h, w, C) features."""
        feats = self.backbone(self._normalize(image)[None])
        return {k: v[0] for k, v in feats.items()}

    def losses(
        self,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        *,
        compute_proposal_loss: bool = True,
        append_gt: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """batch (single image): image (H, W, 3), image_hw (2,),
        gt_boxes (G, 4), gt_classes (G,), gt_valid (G,)."""
        k_rpn, k_roi = jax.random.split(rng)
        feats = self._features(batch["image"])
        (pb, pl, pv), rpn_loss = self.proposal_generator(
            feats, batch["image_hw"],
            batch["gt_boxes"], batch["gt_valid"], k_rpn,
            train=True, compute_loss=compute_proposal_loss,
        )
        roi_loss = self.roi_heads.losses(
            feats, pb, pl, pv,
            batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
            k_roi, append_gt=append_gt,
        )
        out = dict(roi_loss)
        out.update(rpn_loss)
        return out

    def predict(self, batch: Dict[str, jnp.ndarray], *, score_thresh=None):
        feats = self._features(batch["image"])
        (pb, pl, pv), _ = self.proposal_generator(
            feats, batch["image_hw"], train=False
        )
        det, probs, pred_boxes = self.roi_heads.predict(
            feats, pb, pv, batch["image_hw"], score_thresh=score_thresh
        )
        return det, (pb, pl, pv), (probs, pred_boxes)

    def __call__(self, batch, rng=None, branch: str = "supervised"):
        """ubteacher branch dispatch (rcnn.py:30-105)."""
        if branch == "supervised":
            return self.losses(batch, rng)
        if branch == "val_loss":
            return self.losses(batch, rng, append_gt=False)
        if branch == "unsup_data_weak":
            # teacher inference for pseudo-labels: raw ROI probs, no NMS thresh
            return self.predict(batch)
        if branch == "inference":
            return self.predict(batch)
        raise ValueError(f"Unknown branch {branch}")

    @classmethod
    def from_cfg(cls, cfg, **overrides):
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        rpn = RPN.from_cfg(cfg, dtype=dtype)
        rpn_kw = {
            f: getattr(rpn, f)
            for f in (
                "in_features", "strides", "anchor_sizes", "aspect_ratios",
                "anchor_offset", "in_channels", "iou_thresholds", "iou_labels",
                "batch_size_per_image", "positive_fraction", "smooth_l1_beta",
                "nms_thresh", "min_size", "pre_nms_topk_train", "post_nms_topk_train",
                "pre_nms_topk_test", "post_nms_topk_test", "loss_weight",
            )
        }
        roi = StandardROIHeads.from_cfg(cfg, dtype=dtype)
        roi_kw = {
            f: getattr(roi, f)
            for f in (
                "in_features", "strides", "num_classes", "batch_size_per_image",
                "positive_fraction", "iou_thresholds", "iou_labels",
                "proposal_append_gt", "pooler_resolution", "pooler_sampling_ratio",
                "pooler_aligned", "num_conv", "conv_dim", "num_fc", "fc_dim",
                "cls_agnostic_bbox_reg", "bbox_reg_weights", "smooth_l1_beta",
                "box_reg_loss_type", "loss_type", "score_thresh_test",
                "nms_thresh_test", "detections_per_image",
            )
        }
        kw = dict(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            depth=cfg.MODEL.RESNETS.DEPTH,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
            fpn_out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
            rpn_kw=rpn_kw,
            roi_kw=roi_kw,
            dtype=dtype,
        )
        kw.update(overrides)
        return cls(**kw)


# ubteacher alias: the branch-gated model IS GeneralizedRCNN here
TwoStagePseudoLabGeneralizedRCNN = GeneralizedRCNN
