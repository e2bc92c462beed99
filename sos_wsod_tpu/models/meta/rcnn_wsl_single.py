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

import jax

from ...ops.roi_align import roi_align
from ...ops.roi_loop_pool import roi_loop_pool
from ...ops.roi_pool import roi_pool
from ...ops.pallas.roi_pool_fused import roi_pool_fused, roi_pool_fused_supported
from ..backbones.vgg import VGG16
from ..heads.cmil import CMILROIHead
from ..heads.contextlocnet import ContextLocNetROIHead
from ..heads.csc import CSCROIHead, compute_cpg
from ..heads.pcl import PCLROIHead
from ..heads.single_view import OICRROIHead, WSDDNROIHead
from ..heads.wsjds import WSJDSROIHead
from ..postprocess import fast_rcnn_inference_single

# reference ROI_HEADS.NAME -> head key (wsl/modeling/roi_heads/*.py registry)
HEAD_NAME_MAP = {
    "WSDDNROIHeads": "WSDDN",
    "OICRROIHeads": "OICR",
    "PCLROIHeads": "PCL",
    "CMILROIHeads": "CMIL",
    "ContextLocNetROIHeads": "ContextLocNet",
    "CSCROIHeads": "CSC",
    "WSJDSROIHeads": "WSJDS",
}


class GeneralizedRCNNWSL(nn.Module):
    num_classes: int = 20
    head: str = "WSDDN"  # WSDDN|OICR|PCL|CMIL|ContextLocNet|CSC|WSJDS
    # backbone: "vgg16" (build_vgg_backbone) or "ws_resnet" (WSL
    # build_ws_resnet_backbone, resnet_ws.py:635 — stride-8 dilated R-50/101)
    backbone_name: str = "vgg16"
    resnet_depth: int = 50
    pixel_mean: Sequence[float] = (103.939, 116.779, 123.68)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    conv5_dilation: int = 2
    freeze_at: int = 2
    pooler_type: str = "ROIPool"
    pool_impl: str = "auto"  # TPU.POOL_IMPL: auto | table | pallas
    pooler_resolution: int = 7
    refine_k: int = 3
    refine_reg: Sequence[bool] = (False, False, False)
    mean_loss: bool = True
    dan_dims: Sequence[int] = (4096, 4096)
    score_thresh: float = 1e-6
    nms_thresh: float = 0.3
    detections_per_image: int = 100
    # CMIL continuation schedule (fast_rcnn_wsddn.py:534-537)
    size_epoch: int = 5000
    max_iter: int = 200000
    # CSC / WSJDS (roi_heads_csc.py:103-120, wsjds_heads.py:115-137)
    csc_tau: float = 0.7
    csc_max_iter: int = 35000
    wsjds_constraint: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        if self.backbone_name == "vgg16":
            self.backbone = VGG16(
                conv5_dilation=self.conv5_dilation, freeze_at=self.freeze_at,
                out_features=("plain5",), dtype=self.dtype,
            )
            self.feature_key = "plain5"
        elif self.backbone_name == "ws_resnet":
            from ..backbones.resnet_ws import WSResNet

            self.backbone = WSResNet(
                depth=self.resnet_depth, freeze_at=self.freeze_at,
                res5_dilation=self.conv5_dilation,
                out_features=("res5",), dtype=self.dtype,
            )
            self.feature_key = "res5"
        else:
            raise ValueError(f"Unknown WSL backbone {self.backbone_name}")
        common = dict(num_classes=self.num_classes, mean_loss=self.mean_loss,
                      dan_dims=tuple(self.dan_dims), dtype=self.dtype)
        if self.head == "WSDDN":
            self.roi_heads = WSDDNROIHead(**common)
        elif self.head == "OICR":
            self.roi_heads = OICRROIHead(
                refine_k=self.refine_k, refine_reg=tuple(self.refine_reg),
                **common)
        elif self.head == "PCL":
            self.roi_heads = PCLROIHead(refine_k=self.refine_k, **common)
        elif self.head == "CMIL":
            self.roi_heads = CMILROIHead(
                refine_k=self.refine_k, size_epoch=self.size_epoch,
                max_iter=self.max_iter, **common)
        elif self.head == "ContextLocNet":
            assert self.pooler_type == "ROILoopPool", (
                "ContextLocNet requires ROILoopPool "
                "(roi_heads_contextlocnet.py:129)")
            self.roi_heads = ContextLocNetROIHead(**common)
        elif self.head == "CSC":
            self.roi_heads = CSCROIHead(tau=self.csc_tau, **common)
        elif self.head == "WSJDS":
            self.roi_heads = WSJDSROIHead(
                tau=self.csc_tau, constraint=self.wsjds_constraint, **common)
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
            h, w, c = feat.shape
            if (self.pool_impl == "pallas"
                    and roi_pool_fused_supported(h, w, c, feat.dtype)):
                # fused Pallas kernel (channels-last) -> d2 NCHW layout the
                # single-view heads consume (explicit opt-in via
                # TPU.POOL_IMPL=pallas; see rcnn_wsl.py for why auto does
                # not select it yet)
                pooled = roi_pool_fused(feat, boxes, valid, None, scale, res)
                return jnp.transpose(pooled, (0, 3, 1, 2))
            return roi_pool(feat, boxes, valid, spatial_scale=scale, output_size=res)
        if self.pooler_type == "ROILoopPool":
            return roi_loop_pool(feat, boxes, valid, spatial_scale=scale, output_size=res)
        if self.pooler_type in ("ROIAlign", "ROIAlignV2"):
            return roi_align(feat, boxes, valid, spatial_scale=scale, output_size=res,
                             sampling_ratio=0, aligned=self.pooler_type == "ROIAlignV2")
        raise ValueError(f"Unsupported pooler {self.pooler_type}")

    def _features(self, batch):
        if self.backbone_name == "vgg16":
            out = self.backbone(self._normalize(batch["image"][None]),
                                batch["valid_hw"][None])
        else:
            out = self.backbone(self._normalize(batch["image"][None]))
        return out[self.feature_key][0]

    def forward_scores(self, batch: Dict[str, jnp.ndarray],
                       train: bool = True) -> jnp.ndarray:
        """Image -> WSDDN MIL proposal scores (P, K). The differentiable
        surface for CPG computation (CSC/WSJDS heads): take jax.vjp of
        ``lambda im: apply(..., {**batch, "image": im}, method="forward_scores")``
        w.r.t. the image (see heads/csc.py:compute_cpg). Mirrors the
        reference's autograd.grad through the whole model
        (roi_heads_csc.py:423-476)."""
        assert self.head in ("CSC", "WSJDS"), self.head
        feat = self._features(batch)
        pooled = self._pool(feat, batch["boxes"], batch["prop_valid"])
        return self.roi_heads.scores(pooled, batch["objectness"],
                                     batch["prop_valid"], train=train)

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """batch: image (H, W, 3), valid_hw (2,), boxes (P, 4),
        objectness (P,), prop_valid (P,), gt_classes_oh (K,).
        CMIL additionally needs "iter"; CSC/WSJDS need "cpgs" (K, H, W)
        (precompute via :meth:`forward_scores` + compute_cpg) and "iter"."""
        feat = self._features(batch)
        pooled = self._pool(feat, batch["boxes"], batch["prop_valid"])
        boxes = batch["boxes"]
        obj = batch["objectness"]
        pv = batch["prop_valid"]
        gt_oh = batch["gt_classes_oh"]
        if self.head == "WSDDN":
            return self.roi_heads.losses(pooled, obj, pv, gt_oh)
        if self.head == "CMIL":
            return self.roi_heads.losses(pooled, boxes, obj, pv, gt_oh,
                                         batch["iter"])
        if self.head == "ContextLocNet":
            return self.roi_heads.losses(pooled, obj, pv, gt_oh)
        if self.head == "CSC":
            use_csc = batch["iter"] <= self.csc_max_iter
            return self.roi_heads.losses(pooled, boxes, obj, pv, gt_oh,
                                         batch["cpgs"], use_csc)
        if self.head == "WSJDS":
            use_csc = batch["iter"] <= self.csc_max_iter
            return self.roi_heads.losses(pooled, boxes, obj, pv, gt_oh,
                                         batch["cpgs"], feat, batch["image"],
                                         use_csc)
        return self.roi_heads.losses(pooled, boxes, obj, pv, gt_oh)

    def compute_cpgs(self, variables, batch, rngs=None) -> jnp.ndarray:
        """Convenience (outer-level, NOT inside apply): batched-vjp CPG maps
        for the CSC/WSJDS losses."""
        def scores_fn(im):
            return self.apply(variables, {**batch, "image": im}, True,
                              method=self.forward_scores, rngs=rngs)

        scores = scores_fn(batch["image"])
        preds_img = jnp.clip(jnp.sum(scores, axis=0), 1e-6, 1 - 1e-6)
        return compute_cpg(scores_fn, batch["image"], batch["gt_classes_oh"],
                           preds_img, tau=self.csc_tau)

    def predict(self, batch: Dict[str, jnp.ndarray]):
        feat = self._features(batch)
        pooled = self._pool(feat, batch["boxes"], batch["prop_valid"])
        if self.head == "WSJDS":
            scores, pred_boxes, masks = self.roi_heads.predict(
                pooled, batch["boxes"], batch["objectness"],
                batch["prop_valid"], feat,
                (batch["image"].shape[0], batch["image"].shape[1]))
        else:
            scores, pred_boxes = self.roi_heads.predict(
                pooled, batch["boxes"], batch["objectness"],
                batch["prop_valid"])
            masks = None
        det = fast_rcnn_inference_single(
            pred_boxes, scores, batch["prop_valid"], batch["image_hw"],
            score_thresh=self.score_thresh, nms_thresh=self.nms_thresh,
            topk=self.detections_per_image,
        )
        if masks is not None:
            return det, scores, pred_boxes, masks
        return det, scores, pred_boxes

    def __call__(self, batch, train: bool = False):
        return self.loss(batch) if train else self.predict(batch)

    @classmethod
    def from_cfg(cls, cfg, **overrides):
        head = HEAD_NAME_MAP.get(cfg.MODEL.ROI_HEADS.NAME,
                                 cfg.MODEL.ROI_HEADS.NAME)
        backbone = ("ws_resnet" if "resnet" in cfg.MODEL.BACKBONE.NAME.lower()
                    else "vgg16")
        kw = dict(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            head=head,
            backbone_name=backbone,
            resnet_depth=cfg.MODEL.RESNETS.DEPTH,
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            conv5_dilation=cfg.MODEL.VGG.CONV5_DILATION,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
            pooler_type=cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE,
            pool_impl=getattr(cfg.TPU, "POOL_IMPL", "auto"),
            pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            refine_k=cfg.WSL.REFINE_NUM,
            refine_reg=tuple(cfg.WSL.REFINE_REG),
            mean_loss=cfg.WSL.MEAN_LOSS,
            dan_dims=tuple(cfg.MODEL.ROI_BOX_HEAD.DAN_DIM),
            score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            size_epoch=cfg.WSL.SIZE_EPOCH,
            max_iter=cfg.SOLVER.MAX_ITER,
            csc_max_iter=cfg.WSL.CSC_MAX_ITER,
            dtype=jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32,
        )
        kw.update(overrides)
        return cls(**kw)
