"""UWSOD meta-architecture: weakly-supervised RPN + UWSOD ROI head.

Parity target: the UWSOD configuration of GeneralizedRCNNWSL with
PROPOSAL_GENERATOR "RPNWSL" (reference: uwsod/projects/WSL/wsl/modeling/
proposal_generator/rpn.py:107-563 + roi_heads_uwsod.py). The reference RPN
stashes its anchor predictions during forward and receives losses later,
once the ROI head has mined pseudo boxes (rpn.py:459-488 get_losses);
functionally that is just deferred argument plumbing: here the RPN module is
invoked twice inside one jitted step — once proposals-only, once loss-only
with the head's pseudo-GT — sharing parameters (the second invocation
re-runs two small convs, negligible next to the backbone).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.roi_pool import roi_pool
from ..backbones.vgg import VGG16
from ..heads.uwsod import UWSODROIHead
from ..postprocess import fast_rcnn_inference_single
from ..proposal_generator.rpn import RPN


class UWSODRCNN(nn.Module):
    num_classes: int = 20
    pixel_mean: Sequence[float] = (103.939, 116.779, 123.68)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    conv5_dilation: int = 2
    freeze_at: int = 2
    pooler_resolution: int = 7
    refine_k: int = 4
    refine_reg: Sequence[bool] = (True, True, True, True)
    refine_mist: bool = False
    sampling_on: bool = False
    batch_sizes: Sequence[int] = (4096, 4096, 4096, 4096)
    positive_fractions: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    mean_loss: bool = True
    dan_dims: Sequence[int] = (4096, 4096)
    anchor_sizes: Sequence[float] = (32, 64, 128, 256, 512)
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    rpn_batch_size: int = 256
    rpn_positive_fraction: float = 0.5
    pre_nms_topk: int = 2000
    post_nms_topk: int = 1000
    score_thresh: float = 1e-6
    nms_thresh: float = 0.3
    detections_per_image: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = VGG16(
            conv5_dilation=self.conv5_dilation, freeze_at=self.freeze_at,
            out_features=("plain5",), dtype=self.dtype)
        self.stride = 8 if self.conv5_dilation == 2 else 16
        self.proposal_generator = RPN(
            in_features=("plain5",), strides=(self.stride,),
            anchor_sizes=(tuple(self.anchor_sizes),),
            aspect_ratios=(tuple(self.aspect_ratios),),
            in_channels=512,
            batch_size_per_image=self.rpn_batch_size,
            positive_fraction=self.rpn_positive_fraction,
            pre_nms_topk_train=self.pre_nms_topk,
            post_nms_topk_train=self.post_nms_topk,
            pre_nms_topk_test=self.pre_nms_topk,
            post_nms_topk_test=self.post_nms_topk,
            dtype=self.dtype)
        self.roi_heads = UWSODROIHead(
            num_classes=self.num_classes, refine_k=self.refine_k,
            refine_reg=tuple(self.refine_reg), refine_mist=self.refine_mist,
            rpn_on=True, sampling_on=self.sampling_on,
            batch_sizes=tuple(self.batch_sizes),
            positive_fractions=tuple(self.positive_fractions),
            mean_loss=self.mean_loss, dan_dims=tuple(self.dan_dims),
            dtype=self.dtype)

    def _normalize(self, images):
        mean = jnp.asarray(self.pixel_mean, self.dtype)
        std = jnp.asarray(self.pixel_std, self.dtype)
        return (images.astype(self.dtype) - mean) / std

    def _features(self, batch):
        return self.backbone(self._normalize(batch["image"][None]),
                             batch["valid_hw"][None])["plain5"][0]

    def loss(self, batch: Dict[str, jnp.ndarray], rng: jax.Array
             ) -> Dict[str, jnp.ndarray]:
        """batch: image (H, W, 3), valid_hw (2,), image_hw (2,),
        gt_classes_oh (K,)."""
        feat = self._features(batch)
        fdict = {"plain5": feat}
        (pboxes, plogits, pvalid), _ = self.proposal_generator(
            fdict, batch["image_hw"], train=True, compute_loss=False)
        pooled = roi_pool(feat, pboxes, pvalid,
                          spatial_scale=1.0 / self.stride,
                          output_size=(self.pooler_resolution,) * 2)
        rng, head_rng, rpn_rng = jax.random.split(rng, 3)
        losses, rpn_gt = self.roi_heads.losses(
            pooled, pboxes, plogits, pvalid, batch["gt_classes_oh"], head_rng)
        # deferred weak-RPN loss with the head's pseudo boxes (rpn.py:480-488)
        _, rpn_losses = self.proposal_generator(
            fdict, batch["image_hw"], gt_boxes=rpn_gt.boxes,
            gt_valid=rpn_gt.valid, rng=rpn_rng, train=True, compute_loss=True)
        losses.update(rpn_losses)
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]):
        feat = self._features(batch)
        (pboxes, plogits, pvalid), _ = self.proposal_generator(
            {"plain5": feat}, batch["image_hw"], train=False)
        pooled = roi_pool(feat, pboxes, pvalid,
                          spatial_scale=1.0 / self.stride,
                          output_size=(self.pooler_resolution,) * 2)
        scores, pred_boxes = self.roi_heads.predict(pooled, pboxes, plogits,
                                                    pvalid)
        det = fast_rcnn_inference_single(
            pred_boxes, scores, pvalid, batch["image_hw"],
            score_thresh=self.score_thresh, nms_thresh=self.nms_thresh,
            topk=self.detections_per_image)
        return det, scores, pred_boxes

    def __call__(self, batch, rng=None, train: bool = False):
        if train:
            return self.loss(batch, rng)
        return self.predict(batch)


class MRRPUWSODRCNN(nn.Module):
    """UWSOD over the MRRP multi-dilation backbone.

    Parity target: MODEL.MRRP.MRRP_ON configurations (reference: RPNWSL
    rpn.py:432-439 chunks the concatenated branch features and generates
    anchors per branch; roi_heads_uwsod.py:429-439 pools each proposal from
    its source branch via level_ids). Here the B branches enter the RPN as B
    same-stride "levels" (which reproduces the per-branch anchors + joint
    NMS) and ROI pooling is per-branch with masked recombination."""

    num_classes: int = 20
    pixel_mean: Sequence[float] = (103.939, 116.779, 123.68)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    freeze_at: int = 2
    num_branch: int = 3
    branch_dilations: Sequence[int] = (1, 2, 3)
    pooler_resolution: int = 7
    refine_k: int = 4
    refine_reg: Sequence[bool] = (True, True, True, True)
    mean_loss: bool = True
    dan_dims: Sequence[int] = (4096, 4096)
    anchor_sizes: Sequence[float] = (32, 64, 128, 256, 512)
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    pre_nms_topk: int = 2000
    post_nms_topk: int = 1000
    score_thresh: float = 1e-6
    nms_thresh: float = 0.3
    detections_per_image: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        from ..backbones.mrrp import MRRPVGG16

        self.backbone = MRRPVGG16(
            freeze_at=self.freeze_at, num_branch=self.num_branch,
            branch_dilations=tuple(self.branch_dilations), dtype=self.dtype)
        self.stride = 8
        names = tuple(f"b{i}" for i in range(self.num_branch))
        self.branch_names = names
        self.proposal_generator = RPN(
            in_features=names,
            strides=(self.stride,) * self.num_branch,
            anchor_sizes=(tuple(self.anchor_sizes),) * self.num_branch,
            aspect_ratios=(tuple(self.aspect_ratios),) * self.num_branch,
            in_channels=512,
            pre_nms_topk_train=self.pre_nms_topk,
            post_nms_topk_train=self.post_nms_topk,
            pre_nms_topk_test=self.pre_nms_topk,
            post_nms_topk_test=self.post_nms_topk,
            dtype=self.dtype)
        self.roi_heads = UWSODROIHead(
            num_classes=self.num_classes, refine_k=self.refine_k,
            refine_reg=tuple(self.refine_reg), rpn_on=True,
            mean_loss=self.mean_loss, dan_dims=tuple(self.dan_dims),
            dtype=self.dtype)

    def _normalize(self, images):
        mean = jnp.asarray(self.pixel_mean, self.dtype)
        std = jnp.asarray(self.pixel_std, self.dtype)
        return (images.astype(self.dtype) - mean) / std

    def _features(self, batch):
        out = self.backbone(self._normalize(batch["image"][None]))["plain5"]
        branches = out[0]                       # (B, H', W', 512)
        return {f"b{i}": branches[i] for i in range(self.num_branch)}

    def _pool_by_branch(self, fdict, boxes, valid, levels):
        """Each proposal pools from its source branch (masked recombine)."""
        pooled = None
        for i in range(self.num_branch):
            sel = valid & (levels == i)
            p = roi_pool(fdict[f"b{i}"], boxes, sel,
                         spatial_scale=1.0 / self.stride,
                         output_size=(self.pooler_resolution,) * 2,
                         channels_last=True)
            pooled = p if pooled is None else pooled + p
        return pooled

    def loss(self, batch: Dict[str, jnp.ndarray], rng: jax.Array
             ) -> Dict[str, jnp.ndarray]:
        fdict = self._features(batch)
        (pboxes, plogits, pvalid, plvl), _ = self.proposal_generator(
            fdict, batch["image_hw"], train=True, compute_loss=False,
            return_levels=True)
        pooled = self._pool_by_branch(fdict, pboxes, pvalid, plvl)
        rng, head_rng, rpn_rng = jax.random.split(rng, 3)
        losses, rpn_gt = self.roi_heads.losses(
            pooled, pboxes, plogits, pvalid, batch["gt_classes_oh"], head_rng)
        _, rpn_losses = self.proposal_generator(
            fdict, batch["image_hw"], gt_boxes=rpn_gt.boxes,
            gt_valid=rpn_gt.valid, rng=rpn_rng, train=True, compute_loss=True)
        losses.update(rpn_losses)
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]):
        fdict = self._features(batch)
        (pboxes, plogits, pvalid, plvl), _ = self.proposal_generator(
            fdict, batch["image_hw"], train=False, return_levels=True)
        pooled = self._pool_by_branch(fdict, pboxes, pvalid, plvl)
        scores, pred_boxes = self.roi_heads.predict(pooled, pboxes, plogits,
                                                    pvalid)
        det = fast_rcnn_inference_single(
            pred_boxes, scores, pvalid, batch["image_hw"],
            score_thresh=self.score_thresh, nms_thresh=self.nms_thresh,
            topk=self.detections_per_image)
        return det, scores, pred_boxes

    def __call__(self, batch, rng=None, train: bool = False):
        if train:
            return self.loss(batch, rng)
        return self.predict(batch)
