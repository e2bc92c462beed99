"""MultiInputRCNN meta-architecture: stage-1 WSOD model.

Parity target: reference MultiInputRCNN
(uwsod/detectron2/modeling/meta_arch/rcnn_multi.py:22-292): training consumes 4
synchronized views (two scales x {identity, hflip}) of one image with
precomputed proposals and only image-level labels; inference is a plain
single-image path (and also serves GeneralizedRCNNWSL,
wsl/modeling/meta_arch/rcnn.py:24-371).

TPU-native: the two images of each scale run through the backbone as one
(2, H, W, 3) batch — the reference concatenates [img, img_flip] the same way
(rcnn_multi.py:179-184) — and the whole 4-view loss is a single jit program.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roi_align import roi_align
from ...ops.roi_pool import roi_pool, roi_pool_multi
from ...ops.pallas.roi_pool_fused import roi_pool_fused, roi_pool_fused_supported
from ..backbones.vgg import VGG16
from ..heads.oicr_plus import OICRPlusHead
from ..postprocess import fast_rcnn_inference_single


class MultiInputRCNN(nn.Module):
    num_classes: int = 20
    pixel_mean: Sequence[float] = (103.939, 116.779, 123.68)  # BGR, voc07_oicr_plus.yaml
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    conv5_dilation: int = 2
    freeze_at: int = 2
    pooler_type: str = "ROIPool"
    pooler_resolution: int = 7
    pool_impl: str = "auto"  # TPU.POOL_IMPL: auto | table | pallas
    pool_row_chunks: int = 0  # TPU.POOL_ROW_CHUNKS; 0 = env default
    refine_k: int = 4
    refine_reg: Sequence[bool] = (True, True, True, True)
    refine_mist: bool = True
    mist_type: str = "nms"
    mist_p: float = 0.10
    mist_thre: float = 0.05
    bbox_update: bool = False
    mean_loss: bool = True
    seed_cap: int = 1024
    dan_dims: Sequence[int] = (4096, 4096)
    dan_dropout: float = 0.5  # tests set 0 for deterministic goldens
    score_thresh: float = 1e-6
    nms_thresh: float = 0.3
    detections_per_image: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = VGG16(
            conv5_dilation=self.conv5_dilation,
            freeze_at=self.freeze_at,
            out_features=("plain5",),
            dtype=self.dtype,
        )
        self.roi_heads = OICRPlusHead(
            num_classes=self.num_classes,
            refine_k=self.refine_k,
            refine_reg=tuple(self.refine_reg),
            refine_mist=self.refine_mist,
            mist_type=self.mist_type,
            mist_p=self.mist_p,
            mist_thre=self.mist_thre,
            bbox_update=self.bbox_update,
            mean_loss=self.mean_loss,
            seed_cap=self.seed_cap,
            dan_dims=tuple(self.dan_dims),
            dan_dropout=self.dan_dropout,
            fused_pool=self.pooler_type == "ROIPool",
            dtype=self.dtype,
        )
        self.stride = 8 if self.conv5_dilation == 2 else 16

    def _normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, self.dtype)
        std = jnp.asarray(self.pixel_std, self.dtype)
        return (images.astype(self.dtype) - mean) / std

    def _pool(self, feat: jnp.ndarray, boxes: jnp.ndarray, valid: jnp.ndarray,
              row_scale: jnp.ndarray = None) -> jnp.ndarray:
        scale = 1.0 / self.stride
        res = (self.pooler_resolution, self.pooler_resolution)
        if self.pooler_type == "ROIPool":
            h, w, c = feat.shape
            # "auto" resolves to the XLA table path (the measured winner —
            # retired claim, r5): the fused kernel's (C/128, P, 7) = 114k-
            # step grid pays a per-step pipeline tax plus an int32 pos
            # output stream that the table path doesn't, and loses at
            # production P=4096 (r3 measurement; standing A/B re-runs via
            # tools/bench_pool_impls.py). The table path sits AT the XLA
            # row gather/scatter descriptor floors (~14/22 ns/row, r5
            # device trace) — a Pallas rewrite only wins if it amortizes
            # reads across a ROI's bins better than those floors, which
            # the per-(roi, ph) horizontal-table rebuild does not.
            use_fused = (self.pool_impl == "pallas"
                         and roi_pool_fused_supported(h, w, c, feat.dtype))
            if use_fused:
                # fused Pallas kernel: VMEM-resident key table, exact
                # first-scan-hit argmax backward, objectness epilogue fused
                return roi_pool_fused(feat, boxes, valid, row_scale,
                                      scale, res)
            # XLA doubling-table path: channels-last output + objectness
            # weighting fused into the pool epilogue (see ops/roi_pool.py)
            return roi_pool(feat, boxes, valid, row_scale,
                            spatial_scale=scale, output_size=res,
                            channels_last=True)
        if self.pooler_type in ("ROIAlign", "ROIAlignV2"):
            return roi_align(
                feat, boxes, valid, spatial_scale=scale, output_size=res,
                sampling_ratio=0, aligned=self.pooler_type == "ROIAlignV2",
            )
        raise ValueError(f"Unsupported pooler {self.pooler_type}")

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """batch (one image, 4 views):
          images_s1: (2, H1, W1, 3) BGR raw [view, hflipped-view]
          images_s2: (2, H2, W2, 3)
          valid_hw_s1 / valid_hw_s2: (2, 2) true extents inside padded canvas
          boxes: (4, P, 4) per-view proposal coords [s1, s1f, s2, s2f]
          objectness: (P,); prop_valid: (P,); gt_classes_oh: (K,)

        Note: the flip views' backbone features CANNOT be derived by mirroring
        the identity views' (cross-correlation does not commute with
        reflection for asymmetric kernels — that is the point of flip
        augmentation), so all 4 views run conv + pool, like the reference
        (rcnn_multi.py:179-184).
        """
        boxes = batch["boxes"]
        pv = batch["prop_valid"]
        obn = None
        if self.pooler_type == "ROIPool":
            obn = (batch["objectness"] + 1.0).astype(self.dtype)
        f1 = self.backbone(self._normalize(batch["images_s1"]), batch["valid_hw_s1"])["plain5"]
        f2 = self.backbone(self._normalize(batch["images_s2"]), batch["valid_hw_s2"])["plain5"]
        views = (f1[0], f1[1], f2[0], f2[1])
        if self.pooler_type == "ROIPool" and self.pool_impl in ("auto", "table"):
            # all 4 views through ONE fused gather + ONE backward scatter
            # over a concatenated doubling table — kills the per-view
            # stack/pad/copy relayout chain (see roi_pool_multi docstring)
            pooled = roi_pool_multi(
                views, boxes, pv, obn,
                spatial_scale=1.0 / self.stride,
                output_size=(self.pooler_resolution, self.pooler_resolution),
                row_chunks=self.pool_row_chunks,
            )
        else:
            pooled = jnp.stack(
                [self._pool(views[i], boxes[i], pv, obn) for i in range(4)]
            )
        return self.roi_heads.losses(
            pooled, boxes, batch["objectness"], pv, batch["gt_classes_oh"]
        )

    def predict(self, batch: Dict[str, jnp.ndarray]):
        """Single-image inference. batch:
          image: (H, W, 3) BGR raw (padded); valid_hw: (2,)
          boxes/objectness/prop_valid: (P, 4)/(P,)/(P,)
          image_hw: (2,) the true resized input size (for clipping)
        Returns (Detections, all_scores (P, K+1), all_boxes (P, K*4))."""
        feats = self.backbone(self._normalize(batch["image"][None]), batch["valid_hw"][None])
        feat = feats["plain5"][0]
        obn = None
        if self.pooler_type == "ROIPool":
            obn = (batch["objectness"] + 1.0).astype(self.dtype)
        pooled = self._pool(feat, batch["boxes"], batch["prop_valid"], obn)
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

    @classmethod
    def from_cfg(cls, cfg, **overrides):
        kw = dict(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            conv5_dilation=cfg.MODEL.VGG.CONV5_DILATION,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
            pooler_type=cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE,
            pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            pool_impl=getattr(cfg.TPU, "POOL_IMPL", "auto"),
            pool_row_chunks=int(getattr(cfg.TPU, "POOL_ROW_CHUNKS", 0) or 0),
            refine_k=cfg.WSL.REFINE_NUM,
            refine_reg=tuple(cfg.WSL.REFINE_REG),
            refine_mist=cfg.WSL.REFINE_MIST,
            mist_type=cfg.WSL.MIST_TYPE,
            mist_p=cfg.WSL.MIST_P,
            mist_thre=cfg.WSL.MIST_THRE,
            bbox_update=cfg.OICRPLUS.BBOX_UPDATE,
            mean_loss=cfg.WSL.MEAN_LOSS,
            seed_cap=cfg.TPU.PGT_SEED_CAPACITY,
            dan_dims=tuple(cfg.MODEL.ROI_BOX_HEAD.DAN_DIM),
            score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            dtype=jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32,
        )
        kw.update(overrides)
        return cls(**kw)
