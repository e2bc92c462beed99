"""Region Proposal Network (FPN multi-level), fixed-shape.

Parity targets:
 - detectron2 RPN + StandardRPNHead (reference: detectron2/detectron2/modeling/
   proposal_generator/rpn.py — 3x3 conv head, anchor matching [0.3, 0.7] with
   low-quality matches, 256-anchor subsampling at 0.5 positive fraction,
   smooth-l1 + BCE losses normalized by batch*256, find_top_rpn_proposals);
 - ubteacher PseudoLabRPN (unbias/ubteacher/modeling/proposal_generator/
   rpn.py:11-58): loss computation gated by compute_loss / compute_val_loss.

TPU-native: all selection steps (pre-NMS top-k per level, per-level NMS via the
coordinate-offset trick, post-NMS top-k) are static-shape masked ops; per-image
logic is vmapped by the meta-architecture.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import boxes as box_ops
from ...core.matcher import Matcher
from ...core.sampling import subsample_masks
from ...ops.nms import batched_nms_mask


class RPNHead(nn.Module):
    """3x3 conv + 1x1 objectness/delta heads, shared across levels."""

    in_channels: int = 256
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        conv = nn.Conv(self.in_channels, (3, 3), padding=1, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01), name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      kernel_init=nn.initializers.normal(0.01), name="objectness_logits")
        dlt = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      kernel_init=nn.initializers.normal(0.01), name="anchor_deltas")
        logits, deltas = [], []
        for f in features:
            t = nn.relu(conv(f))
            logits.append(obj(t))   # (..., H, W, A)
            deltas.append(dlt(t))   # (..., H, W, A*4)
        return logits, deltas


def _flatten_level(logits: jnp.ndarray, deltas: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(H, W, A) -> (H*W*A,); (H, W, A*4) -> (H*W*A, 4). Order matches
    AnchorGenerator's (H, W, A) row-major layout."""
    h, w, a = logits.shape
    return logits.reshape(h * w * a), deltas.reshape(h * w * a, 4)


def label_and_sample_anchors(
    anchors: jnp.ndarray,          # (N, 4) all levels concatenated
    gt_boxes: jnp.ndarray,         # (G, 4)
    gt_valid: jnp.ndarray,         # (G,)
    matcher: Matcher,
    batch_size_per_image: int,
    positive_fraction: float,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (pos_keep, neg_keep, matched_gt_idx)."""
    iou = box_ops.pairwise_iou(gt_boxes, anchors)
    matched, labels = matcher(iou, gt_valid)
    has_gt = jnp.any(gt_valid)
    labels = jnp.where(has_gt, labels, jnp.zeros_like(labels))  # all-negative when no gt
    pos_keep, neg_keep = subsample_masks(
        labels == 1, labels == 0, batch_size_per_image, positive_fraction, rng
    )
    return pos_keep, neg_keep, matched


def rpn_losses(
    pred_logits: jnp.ndarray,      # (N,)
    pred_deltas: jnp.ndarray,      # (N, 4)
    anchors: jnp.ndarray,          # (N, 4)
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    matcher: Matcher,
    rng: jax.Array,
    *,
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
    smooth_l1_beta: float = 0.0,
    bbox_reg_weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> Dict[str, jnp.ndarray]:
    pos, neg, matched = label_and_sample_anchors(
        anchors, gt_boxes, gt_valid, matcher, batch_size_per_image, positive_fraction, rng
    )
    normalizer = float(batch_size_per_image)

    # localization: smooth-l1 on positive anchors against matched gt deltas
    tgt = box_ops.get_deltas(anchors, gt_boxes[matched], bbox_reg_weights)
    diff = jnp.abs(jnp.asarray(pred_deltas, jnp.float32) - tgt)
    if smooth_l1_beta > 0:
        l1 = jnp.where(diff < smooth_l1_beta,
                       0.5 * diff * diff / smooth_l1_beta,
                       diff - 0.5 * smooth_l1_beta)
    else:
        l1 = diff
    loss_loc = jnp.sum(jnp.where(pos[:, None], l1, 0.0)) / normalizer

    # objectness BCE over sampled anchors
    logits = jnp.asarray(pred_logits, jnp.float32)
    labels = pos.astype(jnp.float32)
    sampled = pos | neg
    bce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss_cls = jnp.sum(jnp.where(sampled, bce, 0.0)) / normalizer
    return {"loss_rpn_cls": loss_cls, "loss_rpn_loc": loss_loc}


def find_top_rpn_proposals(
    level_logits: List[jnp.ndarray],   # per level (HWA,)
    level_boxes: List[jnp.ndarray],    # per level decoded (HWA, 4)
    image_hw: jnp.ndarray,             # (2,) valid extent of this image
    *,
    pre_nms_topk: int,
    post_nms_topk: int,
    nms_thresh: float = 0.7,
    min_size: float = 0.0,
    return_levels: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """d2 find_top_rpn_proposals as fixed-shape ops. Returns
    (boxes (post_nms_topk, 4), logits (post_nms_topk,), valid (post_nms_topk,))
    plus the source level/branch id per proposal when ``return_levels``
    (consumed by the MRRP meta-arch to pool each proposal from its own
    branch, reference rpn.py level_ids / roi_heads_uwsod.py:436-439)."""
    cand_scores, cand_boxes, cand_lvl = [], [], []
    h = image_hw[0].astype(jnp.float32)
    w = image_hw[1].astype(jnp.float32)
    for lvl, (logits, boxes) in enumerate(zip(level_logits, level_boxes)):
        k = min(pre_nms_topk, logits.shape[0])
        scores, idx = jax.lax.top_k(jnp.asarray(logits, jnp.float32), k)
        b = boxes[idx]
        b = jnp.stack([
            jnp.clip(b[:, 0], 0, w), jnp.clip(b[:, 1], 0, h),
            jnp.clip(b[:, 2], 0, w), jnp.clip(b[:, 3], 0, h),
        ], axis=-1)
        keep = ((b[:, 2] - b[:, 0]) > min_size) & ((b[:, 3] - b[:, 1]) > min_size)
        keep &= jnp.isfinite(scores)
        cand_scores.append(jnp.where(keep, scores, -jnp.inf))
        cand_boxes.append(b)
        cand_lvl.append(jnp.full((k,), lvl, jnp.int32))
    scores = jnp.concatenate(cand_scores)
    boxes = jnp.concatenate(cand_boxes)
    lvls = jnp.concatenate(cand_lvl)
    valid = jnp.isfinite(scores)

    keep = batched_nms_mask(boxes, scores, lvls, valid, nms_thresh) & valid
    sel_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(sel_scores, post_nms_topk)
    out_valid = jnp.isfinite(top_scores)
    out_boxes = jnp.where(out_valid[:, None], boxes[top_idx], 0.0)
    out_scores = jnp.where(out_valid, top_scores, 0.0)
    if return_levels:
        return out_boxes, out_scores, out_valid, lvls[top_idx]
    return out_boxes, out_scores, out_valid


class RPN(nn.Module):
    """Multi-level RPN; per-image operation (vmapped by the meta-arch).

    Config mirror: MODEL.RPN.* (voc_baseline: IN_FEATURES p2..p6, IOU [0.3,0.7],
    BATCH 256, FRACTION 0.5, NMS 0.7, PRE/POST topk from cfg).
    """

    in_features: Sequence[str] = ("p2", "p3", "p4", "p5", "p6")
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    anchor_sizes: Sequence[Sequence[float]] = ((32,), (64,), (128,), (256,), (512,))
    aspect_ratios: Sequence[Sequence[float]] = ((0.5, 1.0, 2.0),)
    anchor_offset: float = 0.0
    in_channels: int = 256
    iou_thresholds: Sequence[float] = (0.3, 0.7)
    iou_labels: Sequence[int] = (0, -1, 1)
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    smooth_l1_beta: float = 0.0
    nms_thresh: float = 0.7
    min_size: float = 0.0
    pre_nms_topk_train: int = 2000
    post_nms_topk_train: int = 1000
    pre_nms_topk_test: int = 1000
    post_nms_topk_test: int = 1000
    loss_weight: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        from ..anchors import AnchorGenerator

        ratios = list(self.aspect_ratios)
        # A = sizes-per-level * ratios-per-level, uniform across levels (d2
        # StandardRPNHead asserts this too)
        self.head = RPNHead(
            in_channels=self.in_channels,
            num_anchors=len(self.anchor_sizes[0]) * len(ratios[0]),
            dtype=self.dtype,
        )
        self.anchor_gen = AnchorGenerator(
            sizes=self.anchor_sizes, aspect_ratios=ratios,
            strides=list(self.strides), offset=self.anchor_offset,
        )
        self.matcher = Matcher(
            list(self.iou_thresholds), list(self.iou_labels), allow_low_quality_matches=True
        )

    def __call__(
        self,
        features: Dict[str, jnp.ndarray],   # per level (H, W, C) single image
        image_hw: jnp.ndarray,              # (2,)
        gt_boxes: jnp.ndarray = None,       # (G, 4)
        gt_valid: jnp.ndarray = None,       # (G,)
        rng: jax.Array = None,
        *,
        train: bool = False,
        compute_loss: bool = True,
        return_levels: bool = False,
    ):
        feats = [features[f] for f in self.in_features]
        logits_l, deltas_l = self.head(feats)
        flat = [_flatten_level(l, d) for l, d in zip(logits_l, deltas_l)]
        anchors_l = [
            jnp.asarray(a) for a in self.anchor_gen([f.shape[:2] for f in feats])
        ]
        boxes_l = [
            box_ops.apply_deltas(jnp.asarray(d, jnp.float32), a, (1.0, 1.0, 1.0, 1.0))
            for (_, d), a in zip(flat, anchors_l)
        ]
        pre = self.pre_nms_topk_train if train else self.pre_nms_topk_test
        post = self.post_nms_topk_train if train else self.post_nms_topk_test
        props = find_top_rpn_proposals(
            [jax.lax.stop_gradient(l) for l, _ in flat],
            [jax.lax.stop_gradient(b) for b in boxes_l],
            image_hw,
            pre_nms_topk=pre, post_nms_topk=post,
            nms_thresh=self.nms_thresh, min_size=self.min_size,
            return_levels=return_levels,
        )
        prop_boxes, prop_logits, prop_valid = props[:3]
        losses = {}
        if train and compute_loss:
            all_logits = jnp.concatenate([l for l, _ in flat])
            all_deltas = jnp.concatenate([d for _, d in flat])
            all_anchors = jnp.concatenate(anchors_l)
            losses = rpn_losses(
                all_logits, all_deltas, all_anchors, gt_boxes, gt_valid,
                self.matcher, rng,
                batch_size_per_image=self.batch_size_per_image,
                positive_fraction=self.positive_fraction,
                smooth_l1_beta=self.smooth_l1_beta,
            )
            losses = {k: v * self.loss_weight for k, v in losses.items()}
        return props, losses

    @classmethod
    def from_cfg(cls, cfg, strides=None, dtype=jnp.float32):
        strides = tuple(strides or (4, 8, 16, 32, 64))
        return cls(
            in_features=tuple(cfg.MODEL.RPN.IN_FEATURES),
            strides=strides,
            anchor_sizes=tuple(tuple(s) for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES),
            aspect_ratios=tuple(tuple(a) for a in cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS),
            anchor_offset=cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
            in_channels=cfg.MODEL.FPN.OUT_CHANNELS,
            iou_thresholds=tuple(cfg.MODEL.RPN.IOU_THRESHOLDS),
            iou_labels=tuple(cfg.MODEL.RPN.IOU_LABELS),
            batch_size_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
            smooth_l1_beta=cfg.MODEL.RPN.SMOOTH_L1_BETA,
            nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
            min_size=cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE,
            pre_nms_topk_train=cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
            post_nms_topk_train=cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
            pre_nms_topk_test=cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
            post_nms_topk_test=cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
            loss_weight=cfg.MODEL.RPN.LOSS_WEIGHT,
            dtype=dtype,
        )
