"""GeneralizedRCNNWSL: single-view WSOD meta-architecture.

Parity target: reference GeneralizedRCNNWSL (uwsod/projects/WSL/wsl/modeling/
meta_arch/rcnn.py:24-371): backbone (VGG16 or dilated-C5 ResNet) + precomputed
proposals + a WSOD ROI head (WSDDN / OICR / OICR+). Used by the non-"multi"
configs and by the WSL TTA wrappers. Empty-proposal inputs fall back to a
whole-image box (rcnn.py:196-212) — here padded slots simply stay masked and
the whole-image fallback is applied in the data mapper.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.roi_align import roi_align
from ...ops.roi_loop_pool import roi_loop_pool
from ...ops.roi_pool import roi_pool
from ..backbones.vgg import VGG16
from ..heads.single_view import OICRROIHead, WSDDNROIHead
from ..postprocess import fast_rcnn_inference_single


class GeneralizedRCNNWSL(nn.Module):
    num_classes: int = 20
    head: str = "WSDDN"  # "WSDDN" | "OICR"
    pixel_mean: Sequence[float] = (103.939, 116.779, 123.68)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    conv5_dilation: int = 2
    freeze_at: int = 2
    pooler_type: str = "ROIPool"
    pooler_resolution: int = 7
    refine_k: int = 3
    refine_reg: Sequence[bool] = (False, False, False)
    mean_loss: bool = True
    dan_dims: Sequence[int] = (4096, 4096)
    score_thresh: float = 1e-6
    nms_thresh: float = 0.3
    detections_per_image: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = VGG16(
            conv5_dilation=self.conv5_dilation, freeze_at=self.freeze_at,
            out_features=("plain5",), dtype=self.dtype,
        )
        if self.head == "WSDDN":
            self.roi_heads = WSDDNROIHead(
                num_classes=self.num_classes, mean_loss=self.mean_loss,
                dan_dims=tuple(self.dan_dims), dtype=self.dtype,
            )
        elif self.head == "OICR":
            self.roi_heads = OICRROIHead(
                num_classes=self.num_classes, refine_k=self.refine_k,
                refine_reg=tuple(self.refine_reg), mean_loss=self.mean_loss,
                dan_dims=tuple(self.dan_dims), dtype=self.dtype,
            )
        else:
            raise ValueError(f"Unknown WSL head {self.head}")
        self.stride = 8 if self.conv5_dilation == 2 else 16

    def _normalize(self, images):
        mean = jnp.asarray(self.pixel_mean, self.dtype)
        std = jnp.asarray(self.pixel_std, self.dtype)
        return (images.astype(self.dtype) - mean) / std

    def _pool(self, feat, boxes, valid):
        scale = 1.0 / self.stride
        res = (self.pooler_resolution, self.pooler_resolution)
        if self.pooler_type == "ROIPool":
            return roi_pool(feat, boxes, valid, spatial_scale=scale, output_size=res)
        if self.pooler_type == "ROILoopPool":
            return roi_loop_pool(feat, boxes, valid, spatial_scale=scale, output_size=res)
        if self.pooler_type in ("ROIAlign", "ROIAlignV2"):
            return roi_align(feat, boxes, valid, spatial_scale=scale, output_size=res,
                             sampling_ratio=0, aligned=self.pooler_type == "ROIAlignV2")
        raise ValueError(f"Unsupported pooler {self.pooler_type}")

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """batch: image (H, W, 3), valid_hw (2,), boxes (P, 4),
        objectness (P,), prop_valid (P,), gt_classes_oh (K,)."""
        feat = self.backbone(self._normalize(batch["image"][None]), batch["valid_hw"][None])["plain5"][0]
        pooled = self._pool(feat, batch["boxes"], batch["prop_valid"])
        if self.head == "WSDDN":
            return self.roi_heads.losses(
                pooled, batch["objectness"], batch["prop_valid"], batch["gt_classes_oh"]
            )
        return self.roi_heads.losses(
            pooled, batch["boxes"], batch["objectness"], batch["prop_valid"],
            batch["gt_classes_oh"],
        )

    def predict(self, batch: Dict[str, jnp.ndarray]):
        feat = self.backbone(self._normalize(batch["image"][None]), batch["valid_hw"][None])["plain5"][0]
        pooled = self._pool(feat, batch["boxes"], batch["prop_valid"])
        scores, pred_boxes = self.roi_heads.predict(
            pooled, batch["boxes"], batch["objectness"], batch["prop_valid"]
        )
        det = fast_rcnn_inference_single(
            pred_boxes, scores, batch["prop_valid"], batch["image_hw"],
            score_thresh=self.score_thresh, nms_thresh=self.nms_thresh,
            topk=self.detections_per_image,
        )
        return det, scores, pred_boxes

    def __call__(self, batch, train: bool = False):
        return self.loss(batch) if train else self.predict(batch)
