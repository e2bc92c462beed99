"""OICR+ head: MIL + K refinement branches over 4 synchronized views.

Parity target: reference OICRPlusHeads
(uwsod/projects/WSL/wsl/modeling/roi_heads/roi_heads_oicrplus.py:36-757) and the
WSL base ROIHeads matcher/labeling (roi_heads.py:256-357). The whole training
computation — objectness-weighted pooled features, DAN, WSDDN MIL loss over 4
views, K=4 rounds of MIST pseudo-GT mining / IoU labeling / weighted-CE(+reg)
refinement — is one fixed-shape jit program; all dynamic reference constructs
(per-class variable top-k, masked_select, NMS keep lists, Instances surgery)
become masked fixed-capacity ops.

Reference quirk reproduced on purpose: the 4th view's branch CE/reg loss is
computed from the 3rd view's predictions (roi_heads_oicrplus.py:381 passes
``predictions_k2`` with ``proposals_k2_flip``).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import boxes as box_ops
from ...core.instances import GroundTruth
from ...core.matcher import Matcher
from ...ops.nms import nms_mask
from .dan import DAN
from .oicr import OICRBranch, box_reg_loss, weighted_ce_loss
from .wsddn import WSDDNHead, mil_loss, wsddn_scores


def mist_mining(
    prev_scores: jnp.ndarray,
    prop_boxes: jnp.ndarray,
    prop_valid: jnp.ndarray,
    gt_classes_oh: jnp.ndarray,
    *,
    mist_p: float = 0.10,
    mist_thre: float = 0.05,
    nms_thresh: float = 0.01,
    seed_cap: int = 1024,
) -> GroundTruth:
    """MIST pseudo-GT mining (get_pgt_top_k + get_pgt_mist, "nms" type).

    Per present class: take top max(int(n_valid*mist_p), 1) proposals by score;
    the top-1 is always kept, lower ranks need score >= mist_thre
    (roi_heads_oicrplus.py:607-733). Surviving seeds from all classes then pass
    one class-AGNOSTIC NMS at iou 0.01 (:576-586, idxs are zeros).

    prev_scores: (P, K) or (P, K+1); only the first K class columns are used.
    Returns GroundTruth with capacity ``seed_cap``.
    """
    p = prop_boxes.shape[0]
    k = gt_classes_oh.shape[0]
    scores = prev_scores[:, :k]
    kmax = min(int(p * mist_p) + 1, p)

    n_valid = jnp.sum(prop_valid.astype(jnp.int32))
    top_k_count = jnp.maximum((n_valid.astype(jnp.float32) * mist_p).astype(jnp.int32), 1)

    masked = jnp.where(prop_valid[:, None], jnp.asarray(scores, jnp.float32), -jnp.inf)
    vals, idxs = jax.lax.top_k(masked.T, kmax)  # (K, kmax) per-class ranking
    rank = jnp.broadcast_to(jnp.arange(kmax)[None, :], (k, kmax))
    cls_present = gt_classes_oh.astype(bool)[:, None]
    seed_valid = (
        cls_present
        & (rank < top_k_count)
        & ((rank == 0) | (vals >= mist_thre))
        & jnp.isfinite(vals)
    )

    # flatten and compact to seed_cap (rank-0 seeds get a selection bonus so the
    # always-kept top-1 per class can never be dropped by truncation)
    flat_vals = vals.reshape(-1)
    flat_idxs = idxs.reshape(-1)
    flat_cls = jnp.broadcast_to(jnp.arange(k)[:, None], (k, kmax)).reshape(-1)
    flat_valid = seed_valid.reshape(-1)
    sel = jnp.where(flat_valid, flat_vals + jnp.where(rank.reshape(-1) == 0, 1e4, 0.0), -jnp.inf)
    _, take = jax.lax.top_k(sel, min(seed_cap, flat_vals.shape[0]))

    s_scores = flat_vals[take]
    s_idx = flat_idxs[take]
    s_cls = flat_cls[take]
    s_valid = flat_valid[take]
    s_boxes = prop_boxes[s_idx]

    keep = nms_mask(s_boxes, s_scores, s_valid, nms_thresh)
    return GroundTruth(
        boxes=s_boxes,
        classes=s_cls.astype(jnp.int32),
        scores=s_scores,
        weights=s_scores,
        index=s_idx.astype(jnp.int32),
        valid=keep & s_valid,
    )


def top_k_mining(
    prev_scores: jnp.ndarray,
    prop_boxes: jnp.ndarray,
    prop_valid: jnp.ndarray,
    gt_classes_oh: jnp.ndarray,
) -> GroundTruth:
    """Pseudo-GT mining for ``WSL.REFINE_MIST: False``: plain get_pgt_top_k
    with its defaults (top_k=1, thres=0, roi_heads_oicrplus.py:321-323 calling
    :617 with no top_k/thres) — the single highest-scoring proposal of every
    present class becomes a seed, weights = scores, no NMS.

    Returns GroundTruth with capacity K (one slot per class)."""
    k = gt_classes_oh.shape[0]
    scores = prev_scores[:, :k]
    masked = jnp.where(prop_valid[:, None], jnp.asarray(scores, jnp.float32),
                       -jnp.inf)
    vals = jnp.max(masked, axis=0)                       # (K,)
    idxs = jnp.argmax(masked, axis=0).astype(jnp.int32)  # first hit on ties,
    # like torch.topk(k=1) CPU/CUDA scan order
    valid = gt_classes_oh.astype(bool) & jnp.isfinite(vals)
    safe = jnp.where(valid, vals, 0.0)
    return GroundTruth(
        boxes=prop_boxes[idxs],
        classes=jnp.arange(k, dtype=jnp.int32),
        scores=safe,
        weights=safe,
        index=idxs,
        valid=valid,
    )


def mist_mining_wetectron(
    prev_scores: jnp.ndarray,
    prop_boxes: jnp.ndarray,
    prop_valid: jnp.ndarray,
    gt_classes_oh: jnp.ndarray,
    *,
    mist_p: float = 0.10,
    mist_thre: float = 0.05,
    iou_thre: float = 0.2,
    seed_cap: int = 1024,
) -> GroundTruth:
    """"wetectron"-type MIST (``WSL.MIST_TYPE: "wetectron"``), the intended
    semantics of reference get_pgt_mist_mist (roi_heads_oicrplus.py:477-553):

    Per present class, rank the top max(int(n_valid*mist_p), 1) proposals by
    score. Rank 0 is always kept; rank ii survives iff its IoU against EVERY
    higher-ranked candidate of the same class (kept or not — the reference
    checks ``iou_matrix[:, ii, :ii]``, not the kept subset, :530-532) is
    < 0.2 AND its score >= mist_thre. No cross-class NMS afterwards.

    Two latent reference bugs are documented rather than reproduced: the
    reference call site unpacks 4 of get_pgt_top_k's 5 no-instance returns
    (:484-493 — a ValueError as released) and builds targets without
    gt_index (:545-553) which the cross-view mirroring at :330-344 requires;
    we carry the mined proposal index like the "nms" variant so the 4-view
    broadcast works."""
    p = prop_boxes.shape[0]
    k = gt_classes_oh.shape[0]
    scores = prev_scores[:, :k]
    kmax = min(int(p * mist_p) + 1, p)

    n_valid = jnp.sum(prop_valid.astype(jnp.int32))
    top_k_count = jnp.maximum(
        (n_valid.astype(jnp.float32) * mist_p).astype(jnp.int32), 1)

    masked = jnp.where(prop_valid[:, None], jnp.asarray(scores, jnp.float32),
                       -jnp.inf)
    vals, idxs = jax.lax.top_k(masked.T, kmax)     # (K, kmax) rank-ordered
    rank = jnp.arange(kmax, dtype=jnp.int32)
    cls_present = gt_classes_oh.astype(bool)[:, None]
    cand = cls_present & (rank[None, :] < top_k_count) & jnp.isfinite(vals)

    boxes_k = prop_boxes[idxs]                     # (K, kmax, 4)
    iou = jax.vmap(box_ops.pairwise_iou)(boxes_k, boxes_k)  # (K, kmax, kmax)
    prev_mask = rank[None, :] < rank[:, None]      # [ii, j]: j ranks above ii
    max_prev = jnp.max(
        jnp.where(prev_mask[None] & cand[:, None, :], iou, 0.0), axis=-1)
    keep = ((max_prev < iou_thre) & (vals >= mist_thre)) | (rank[None, :] == 0)
    seed_valid = cand & keep

    # compact to seed_cap; rank-0 bonus so per-class top-1 survives truncation
    flat_vals = vals.reshape(-1)
    flat_rank = jnp.broadcast_to(rank[None, :], (k, kmax)).reshape(-1)
    sel = jnp.where(seed_valid.reshape(-1),
                    flat_vals + jnp.where(flat_rank == 0, 1e4, 0.0), -jnp.inf)
    _, take = jax.lax.top_k(sel, min(seed_cap, flat_vals.shape[0]))

    s_vals = flat_vals[take]
    s_valid = seed_valid.reshape(-1)[take]
    s_scores = jnp.where(s_valid, s_vals, 0.0)
    return GroundTruth(
        boxes=boxes_k.reshape(-1, 4)[take],
        classes=jnp.broadcast_to(
            jnp.arange(k, dtype=jnp.int32)[:, None], (k, kmax)).reshape(-1)[take],
        scores=s_scores,
        weights=s_scores,
        index=idxs.reshape(-1)[take].astype(jnp.int32),
        valid=s_valid,
    )


def label_and_sample(
    gt: GroundTruth,
    prop_boxes: jnp.ndarray,
    prop_valid: jnp.ndarray,
    matcher: Matcher,
    num_classes: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assign every proposal a class/weight/pgt-index (no subsampling — the WSL
    fork keeps all proposals, roi_heads.py:256-257).

    Returns (gt_classes (P,), weights (P,), index (P,), fg_mask (P,)).
    """
    iou = box_ops.pairwise_iou(gt.boxes, prop_boxes)
    matched, labels = matcher(iou, gt.valid)
    m_cls = gt.classes[matched]
    cls = jnp.where(labels == 1, m_cls, jnp.where(labels == 0, num_classes, -1))
    weights = gt.weights[matched]
    weights = jnp.where(cls == -1, 0.0, weights)
    any_gt = jnp.any(gt.valid)
    weights = jnp.where(any_gt, weights, 0.0)
    index = gt.index[matched]
    fg = prop_valid & (cls >= 0) & (cls < num_classes)
    return cls, weights, index, fg


class OICRPlusHead(nn.Module):
    """DAN + WSDDN + K OICR branches; multi-view loss and single-view inference."""

    num_classes: int = 20
    refine_k: int = 4
    refine_reg: Sequence[bool] = (True, True, True, True)
    refine_mist: bool = True
    # WSL.MIST_TYPE (defaults.py:244): "nms" = get_pgt_mist (MIST + one
    # class-agnostic NMS, roi_heads_oicrplus.py:561-605); "wetectron" =
    # get_pgt_mist_mist (per-class rank suppression at IoU 0.2, :477-553).
    # Only read when refine_mist is True, like the reference (:307-318).
    mist_type: str = "nms"
    mist_p: float = 0.10
    mist_thre: float = 0.05
    # OICRPLUS.BBOX_UPDATE (roi_heads_oicrplus.py:398-425): average the 4
    # views' regression deltas flip-consistently (dx antisymmetric under
    # hflip, dy/dw/dh symmetric) and feed the decoded class-specific boxes to
    # the next branch's mining/labeling instead of the raw proposals.
    bbox_update: bool = False
    mean_loss: bool = True
    smooth_l1_beta: float = 0.0
    bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    iou_thresholds: Sequence[float] = (0.5, 0.6)
    iou_labels: Sequence[int] = (0, -1, 1)
    seed_cap: int = 1024
    dan_dims: Sequence[int] = (4096, 4096)
    # 0.5 like the reference box_head (box_head.py:62-75); tests set 0 to make
    # composed train-step goldens deterministic on both sides
    dan_dropout: float = 0.5
    # fused_pool: pooled features arrive channels-last (.., P, PH, PW, C) with
    # the objectness weighting already fused into the pooler epilogue
    # (ops/roi_pool.py row_scale) — the TPU fast path, saving a full pass
    # over the 4-view pooled tensor plus its layout transposes.
    fused_pool: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        if self.refine_mist and self.mist_type not in ("nms", "wetectron"):
            # reference asserts the same at :317-318
            raise ValueError(
                f"WSL.MIST_TYPE must be 'nms' or 'wetectron', got {self.mist_type!r}")
        self.dan = DAN(fc_dims=tuple(self.dan_dims),
                       dropout_rate=self.dan_dropout,
                       channels_last=self.fused_pool, dtype=self.dtype)
        self.wsddn = WSDDNHead(self.num_classes, dtype=self.dtype)
        self.refine = [
            OICRBranch(self.num_classes, has_reg=self.refine_reg[k], dtype=self.dtype,
                       name=f"box_refinery_{k}")
            for k in range(self.refine_k)
        ]
        self.matcher = Matcher(list(self.iou_thresholds), list(self.iou_labels))

    def _features(self, pooled: jnp.ndarray, objectness: jnp.ndarray, train: bool) -> jnp.ndarray:
        """pooled: (..., P, C, PH, PW); objectness: (P,) raw MCG/SS logits.
        Objectness weighting: feats * (objectness + 1) (roi_heads_oicrplus.py:200-221).
        With ``fused_pool`` the weighting already happened inside the pooler."""
        if self.fused_pool:
            x = pooled
        else:
            w = (objectness + 1.0).astype(pooled.dtype)
            x = pooled * w[..., :, None, None, None]
        flat = x.reshape((-1,) + x.shape[-3:])
        f = self.dan(flat, train=train)
        return f.reshape(x.shape[:-3] + (f.shape[-1],))

    def losses(
        self,
        pooled: jnp.ndarray,        # (4, P, C, PH, PW) views: s1, s1_flip, s2, s2_flip
        boxes: jnp.ndarray,         # (4, P, 4) per-view proposal coords
        objectness: jnp.ndarray,    # (P,)
        prop_valid: jnp.ndarray,    # (P,)
        gt_classes_oh: jnp.ndarray, # (K,)
    ) -> Dict[str, jnp.ndarray]:
        v, p = pooled.shape[0], pooled.shape[1]
        feats = self._features(pooled, objectness, train=True)  # (4, P, F)

        c, d = self.wsddn(feats.reshape(v * p, -1))
        c = c.reshape(v, p, -1)
        d = d.reshape(v, p, -1)
        scores_v = jax.vmap(lambda cc, dd: wsddn_scores(cc, dd, prop_valid))(c, d)
        mil = jnp.mean(
            jnp.stack([mil_loss(scores_v[i], gt_classes_oh, self.mean_loss) for i in range(v)])
        )
        losses = {"loss_cls": mil}

        prev = jax.lax.stop_gradient(jnp.mean(scores_v, axis=0))  # (P, K)
        prev_boxes_v = None  # (4, P, K, 4) once BBOX_UPDATE kicks in
        for k in range(self.refine_k):
            term_weight = 1.0
            if k == 0 and (not self.refine_mist) and (not self.refine_reg[0]):
                term_weight = 3.0  # roi_heads_oicrplus.py:305-306
            # mining dispatch, reference roi_heads_oicrplus.py:307-323
            if not self.refine_mist:
                gt = top_k_mining(prev, boxes[0], prop_valid, gt_classes_oh)
            elif self.mist_type == "wetectron":
                gt = mist_mining_wetectron(
                    prev, boxes[0], prop_valid, gt_classes_oh,
                    mist_p=self.mist_p, mist_thre=self.mist_thre,
                    seed_cap=self.seed_cap,
                )
            else:  # "nms"
                gt = mist_mining(
                    prev, boxes[0], prop_valid, gt_classes_oh,
                    mist_p=self.mist_p, mist_thre=self.mist_thre,
                    seed_cap=self.seed_cap,
                )
            if prev_boxes_v is not None:
                # mining seeds carry the flip-averaged regressed box of their
                # (proposal, class) instead of the raw proposal
                import dataclasses

                gt = dataclasses.replace(
                    gt, boxes=prev_boxes_v[0][gt.index, gt.classes])
            cls, weights, index, _ = label_and_sample(
                gt, boxes[0], prop_valid, self.matcher, self.num_classes
            )
            safe_cls = jnp.clip(cls, 0, self.num_classes - 1)

            sc, dl = self.refine[k](feats.reshape(v * p, -1))
            sc = sc.reshape(v, p, -1)
            dl = dl.reshape(v, p, -1)

            # reference quirk: view 3 losses reuse view 2 predictions (:381)
            pred_view = [0, 1, 2, 2]
            ce_terms = []
            reg_terms = []
            for view in range(v):
                pv = pred_view[view]
                ce_terms.append(weighted_ce_loss(sc[pv], cls, weights, prop_valid))
                if self.refine_reg[k]:
                    # Under BBOX_UPDATE only view 0 regresses toward the
                    # flip-averaged regressed pgt box; views 1-3 use their RAW
                    # proposal boxes at gt_index (roi_heads_oicrplus.py
                    # proposals_k1_flip/k2/k2_flip build from `boxes`, not the
                    # regressed pgt).
                    if prev_boxes_v is not None and view == 0:
                        gt_boxes_view = prev_boxes_v[0][index, safe_cls]
                    else:
                        gt_boxes_view = boxes[view][index]
                    reg_terms.append(
                        box_reg_loss(
                            dl[pv], boxes[view], gt_boxes_view, cls, prop_valid,
                            num_classes=self.num_classes, beta=self.smooth_l1_beta,
                            weights=self.bbox_reg_weights,
                        )
                    )
            losses[f"loss_cls_r{k}"] = jnp.mean(jnp.stack(ce_terms)) * term_weight
            if self.refine_reg[k]:
                losses[f"loss_box_reg_r{k}"] = jnp.mean(jnp.stack(reg_terms)) * term_weight

            # per-branch training metrics (reference _log_accuracy,
            # fast_rcnn_oicr.py:245-256, and the fg/bg/ig counters of
            # label_and_sample_proposals, roi_heads.py:360-373). Keys do NOT
            # start with "loss" so the train step excludes them from the
            # total; view accuracies are averaged instead of logged 4x.
            nv = jnp.sum(prop_valid).astype(jnp.float32)
            ig = prop_valid & (cls == -1)
            bg = prop_valid & (cls == self.num_classes)
            fgm = prop_valid & (cls >= 0) & (cls < self.num_classes)
            n_fg = jnp.sum(fgm).astype(jnp.float32)
            pred = jnp.argmax(jax.lax.stop_gradient(sc), axis=-1)  # (4, P)
            acc = jnp.sum((pred == cls[None]) & prop_valid[None], axis=1) / jnp.maximum(nv, 1)
            fg_acc = jnp.sum((pred == cls[None]) & fgm[None], axis=1) / jnp.maximum(n_fg, 1)
            fneg = jnp.sum((pred == self.num_classes) & fgm[None], axis=1) / jnp.maximum(n_fg, 1)
            losses[f"roi_head/num_fg_samples_r{k}"] = n_fg
            losses[f"roi_head/num_bg_samples_r{k}"] = jnp.sum(bg).astype(jnp.float32)
            losses[f"roi_head/num_ig_samples_r{k}"] = jnp.sum(ig).astype(jnp.float32)
            losses[f"fast_rcnn/cls_accuracy_r{k}"] = jnp.mean(acc)
            losses[f"fast_rcnn/fg_cls_accuracy_r{k}"] = jnp.mean(fg_acc)
            losses[f"fast_rcnn/false_negative_r{k}"] = jnp.mean(fneg)

            probs = jax.nn.softmax(jnp.asarray(sc, jnp.float32), axis=-1)  # (4, P, K+1)
            prev = jax.lax.stop_gradient(jnp.mean(probs, axis=0))
            if self.bbox_update and self.refine_reg[k]:
                # flip-consistent average (roi_heads_oicrplus.py:398-425):
                # views 1 and 3 are hflipped -> their dx enters negated
                d = jax.lax.stop_gradient(
                    jnp.asarray(dl, jnp.float32).reshape(v, p, self.num_classes, 4))
                sign = jnp.asarray([1.0, -1.0, 1.0, -1.0])[:, None, None]
                dx = jnp.mean(d[..., 0] * sign, axis=0)         # (P, K)
                rest = jnp.mean(d[..., 1:], axis=0)             # (P, K, 3)
                prev_boxes_v = jnp.stack([
                    box_ops.apply_deltas(
                        jnp.concatenate(
                            [(dx * s)[..., None], rest], axis=-1
                        ).reshape(p, self.num_classes * 4),
                        boxes[view], self.bbox_reg_weights,
                    ).reshape(p, self.num_classes, 4)
                    for view, s in zip(range(v), (1.0, -1.0, 1.0, -1.0))
                ])
        return losses

    def predict(
        self,
        pooled: jnp.ndarray,       # (P, C, PH, PW) single view
        boxes: jnp.ndarray,        # (P, 4)
        objectness: jnp.ndarray,   # (P,)
        prop_valid: jnp.ndarray,   # (P,)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Branch-ensembled inference (fast_rcnn_oicr.py:674-736): mean softmax
        over the K branches and mean deltas, decoded against the proposals.

        Returns (scores (P, K+1), pred_boxes (P, K*4))."""
        feats = self._features(pooled, objectness, train=False)  # (P, F)
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
        pred_boxes = box_ops.apply_deltas(deltas, boxes, self.bbox_reg_weights)
        return probs, pred_boxes
