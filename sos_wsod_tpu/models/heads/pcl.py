"""PCL (Proposal Cluster Learning) ROI head.

Parity targets:
 - PCLROIHeads (reference: uwsod/projects/WSL/wsl/modeling/roi_heads/
   roi_heads_pcl.py:30-354): DAN + WSDDN MIL predictor + K refinement
   branches whose losses are the custom PCL loss over proposal clusters;
 - the host clustering logic (reference: .../roi_heads/third_party/pcl.py:
   24-199): per present class, k-means(3) top-ranking proposal selection,
   IoU>0.4 graph-center extraction (greedy max-degree), top-5 centers per
   class; then every proposal is assigned to its max-IoU center
   (fg >= 0.5, bg < 0.5, ignored < 0.1) and per-cluster mean probabilities
   feed the custom-gradient ``pcl_loss`` op;
 - PCLOutputs.losses / inference with bg-at-column-0 convention
   (fast_rcnn_oicr.py:738-1014: branch logits put background at channel 0;
   inference rolls it to the last column, ``:603-605``).

TPU design: the clustering is inherently sequential, data-dependent host
logic (the reference also runs it on CPU, with sklearn KMeans); it crosses
the host boundary via ``jax.pure_callback`` with FIXED padded output shapes
(R proposals, 5*num_classes max cluster centers), while the differentiable
loss (``ops.pcl_loss``) and everything around it stays in XLA.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ...ops.pcl_loss import pcl_loss
from .dan import DAN
from .oicr import OICRBranch
from .wsddn import WSDDNHead, mil_loss, wsddn_scores

NUM_KMEANS_CLUSTER = 3
RNG_SEED = 3
GRAPH_IOU_THRESHOLD = 0.4
MAX_PC_NUM = 5
FG_THRESH = 0.5
BG_THRESH = 0.1
_EPS = 1e-9


def _pairwise_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def top_ranking_proposals(probs: np.ndarray) -> np.ndarray:
    """k-means(3) over 1-D class probabilities; members of the highest-center
    cluster (pcl.py:62-73)."""
    from sklearn.cluster import KMeans

    n_clusters = min(NUM_KMEANS_CLUSTER, probs.shape[0])
    km = KMeans(n_clusters=n_clusters, random_state=RNG_SEED, n_init=10).fit(
        probs.reshape(-1, 1)
    )
    index = np.where(km.labels_ == np.argmax(km.cluster_centers_))[0]
    if len(index) == 0:
        index = np.array([np.argmax(probs)])
    return index


def get_graph_centers(boxes: np.ndarray, cls_prob: np.ndarray,
                      im_labels: np.ndarray):
    """Greedy graph-center cluster seeds (pcl.py:87-145). Returns
    (gt_boxes (G,4), gt_classes (G,) 1-based, gt_scores (G,))."""
    num_classes = im_labels.shape[0]
    boxes = boxes.copy()
    cls_prob = cls_prob.copy()
    gt_boxes = np.zeros((0, 4), np.float32)
    gt_classes = np.zeros((0,), np.int32)
    gt_scores = np.zeros((0,), np.float32)
    for i in range(num_classes):
        if im_labels[i] != 1:
            continue
        cls_prob_tmp = cls_prob[:, i].copy()
        idxs = np.where(cls_prob_tmp >= 0)[0]
        idxs = idxs[top_ranking_proposals(cls_prob_tmp[idxs])]
        boxes_tmp = boxes[idxs, :].copy()
        cls_prob_tmp = cls_prob_tmp[idxs]
        graph = (_pairwise_iou_np(boxes_tmp, boxes_tmp) > GRAPH_IOU_THRESHOLD
                 ).astype(np.float32)

        keep_idxs = []
        scores_tmp = []
        count = cls_prob_tmp.size
        while True:
            order = np.sum(graph, axis=1).argsort()[::-1]
            tmp = order[0]
            keep_idxs.append(tmp)
            inds = np.where(graph[tmp, :] > 0)[0]
            scores_tmp.append(np.max(cls_prob_tmp[inds]) if len(inds)
                              else cls_prob_tmp[tmp])
            graph[:, inds] = 0
            graph[inds, :] = 0
            count = count - len(inds)
            if count <= 5:
                break

        keep_idxs = np.array(keep_idxs)
        scores_tmp = np.array(scores_tmp, np.float32)
        keep_new = np.argsort(scores_tmp)[-1:(-1 - min(len(scores_tmp), MAX_PC_NUM)):-1]
        gt_boxes = np.vstack((gt_boxes, boxes_tmp[keep_new, :]))
        gt_scores = np.concatenate((gt_scores, scores_tmp[keep_new]))
        gt_classes = np.concatenate(
            (gt_classes, np.full(len(keep_new), i + 1, np.int32)))
        # chosen centers leave the candidate pool (pcl.py:138-141)
        delete = idxs[keep_idxs][keep_new]
        cls_prob = np.delete(cls_prob, delete, axis=0)
        boxes = np.delete(boxes, delete, axis=0)
    return gt_boxes, gt_classes, gt_scores


def get_proposal_clusters(all_rois: np.ndarray, gt_boxes: np.ndarray,
                          gt_classes: np.ndarray, gt_scores: np.ndarray,
                          cls_prob_new: np.ndarray):
    """Assign every proposal to its max-IoU cluster center (pcl.py:148-199)."""
    overlaps = _pairwise_iou_np(all_rois, gt_boxes)
    gt_assignment = overlaps.argmax(axis=1)
    max_overlaps = overlaps.max(axis=1)
    labels = gt_classes[gt_assignment].astype(np.int32)
    cls_loss_weights = gt_scores[gt_assignment].astype(np.float32)

    bg_inds = max_overlaps < FG_THRESH
    ig_inds = max_overlaps < BG_THRESH
    cls_loss_weights[ig_inds] = 0.0
    labels[bg_inds] = 0
    gt_assignment = np.where(bg_inds, -1, gt_assignment)

    g = gt_boxes.shape[0]
    img_cls_loss_weights = np.zeros(g, np.float32)
    pc_probs = np.zeros(g, np.float32)
    pc_count = np.zeros(g, np.float32)
    for i in range(g):
        po = np.where(gt_assignment == i)[0]
        img_cls_loss_weights[i] = np.sum(cls_loss_weights[po])
        pc_count[i] = len(po)
        if len(po):
            pc_probs[i] = np.average(cls_prob_new[po, gt_classes[i]])
    return (labels, cls_loss_weights, gt_assignment.astype(np.int32),
            gt_classes.astype(np.int32), pc_probs, pc_count,
            img_cls_loss_weights)


def pcl_targets_np(boxes: np.ndarray, cls_prob: np.ndarray,
                   im_labels: np.ndarray, cls_prob_new: np.ndarray,
                   valid: np.ndarray, max_pc: int):
    """Full PCL target computation (pcl.py:24-59) with fixed padded output
    shapes for the device boundary. ``cls_prob`` may be (R, C) (MIL scores)
    or (R, C+1) with background at column 0 (refinement probs); ``cls_prob_new``
    is always (R, C+1) bg-first."""
    r = boxes.shape[0]
    c = im_labels.shape[0]
    nvalid = int(valid.sum())
    out = {
        "labels": np.zeros(r, np.int32),
        "cls_loss_weights": np.zeros(r, np.float32),
        "gt_assignment": np.zeros(r, np.int32),
        "pc_labels": np.zeros(max_pc, np.int32),
        "pc_probs": np.zeros(max_pc, np.float32),
        "pc_count": np.zeros(max_pc, np.float32),
        "img_cls_loss_weights": np.zeros(max_pc, np.float32),
        "im_labels_real": np.concatenate(
            ([1.0], im_labels.astype(np.float32))),
    }
    if nvalid == 0 or im_labels.sum() == 0:
        return tuple(out.values())

    boxes_v = np.asarray(boxes[:nvalid], np.float32)
    cls_prob_v = np.asarray(cls_prob[:nvalid], np.float32)
    if cls_prob_v.shape[1] != c:
        cls_prob_v = cls_prob_v[:, 1:]
    new_v = np.clip(np.asarray(cls_prob_new[:nvalid], np.float32), _EPS, 1 - _EPS)
    cls_prob_v = np.clip(cls_prob_v, _EPS, 1 - _EPS)

    gt_boxes, gt_classes, gt_scores = get_graph_centers(
        boxes_v, cls_prob_v, im_labels)
    if gt_boxes.shape[0] == 0:
        return tuple(out.values())
    (labels, w, assign, pc_labels, pc_probs, pc_count, img_w) = \
        get_proposal_clusters(boxes_v, gt_boxes, gt_classes, gt_scores, new_v)

    g = min(len(pc_labels), max_pc)
    out["labels"][:nvalid] = labels
    out["cls_loss_weights"][:nvalid] = w
    out["gt_assignment"][:nvalid] = np.clip(assign, 0, max(max_pc - 1, 0))
    out["pc_labels"][:g] = pc_labels[:g]
    out["pc_probs"][:g] = pc_probs[:g]
    out["pc_count"][:g] = pc_count[:g]
    out["img_cls_loss_weights"][:g] = img_w[:g]
    return tuple(out.values())


class PCLROIHead(nn.Module):
    """DAN + WSDDN MIL + K PCL refinement branches (bg at column 0)."""

    num_classes: int = 20
    refine_k: int = 3
    mean_loss: bool = True
    dan_dims: Sequence[int] = (4096, 4096)
    dtype: Any = jnp.float32

    def setup(self):
        self.dan = DAN(fc_dims=tuple(self.dan_dims), dtype=self.dtype)
        self.wsddn = WSDDNHead(self.num_classes, dtype=self.dtype)
        self.refine = [
            OICRBranch(self.num_classes, has_reg=False, dtype=self.dtype,
                       name=f"box_refinery_{k}")
            for k in range(self.refine_k)
        ]

    def _features(self, pooled, objectness, train):
        w = (objectness + 1.0).astype(pooled.dtype)
        x = pooled * w[:, None, None, None]
        return self.dan(x, train=train)

    def _branch_loss(self, logits, boxes, prop_valid, prev_scores,
                     gt_classes_oh):
        """One PCL refinement loss: host clustering -> device pcl_loss."""
        r = boxes.shape[0]
        max_pc = MAX_PC_NUM * self.num_classes
        probs = jax.nn.softmax(jnp.asarray(logits, jnp.float32), axis=-1)

        def host(b, prev, oh, new, v):
            return pcl_targets_np(np.asarray(b), np.asarray(prev),
                                  np.asarray(oh), np.asarray(new),
                                  np.asarray(v), max_pc)

        shapes = (
            jax.ShapeDtypeStruct((r,), jnp.int32),
            jax.ShapeDtypeStruct((r,), jnp.float32),
            jax.ShapeDtypeStruct((r,), jnp.int32),
            jax.ShapeDtypeStruct((max_pc,), jnp.int32),
            jax.ShapeDtypeStruct((max_pc,), jnp.float32),
            jax.ShapeDtypeStruct((max_pc,), jnp.float32),
            jax.ShapeDtypeStruct((max_pc,), jnp.float32),
            jax.ShapeDtypeStruct((self.num_classes + 1,), jnp.float32),
        )
        (labels, w, assign, pc_labels, pc_probs, pc_count, img_w,
         im_labels_real) = jax.pure_callback(
            host, shapes,
            jax.lax.stop_gradient(boxes),
            jax.lax.stop_gradient(prev_scores),
            gt_classes_oh.astype(jnp.float32),
            jax.lax.stop_gradient(probs),
            prop_valid,
        )
        # invalid padded rows have cls_loss_weights 0 -> no contribution
        per_channel = pcl_loss(probs, labels, w, assign, pc_labels, pc_probs,
                               pc_count, img_w, im_labels_real)
        return jnp.sum(per_channel), probs

    def losses(self, pooled, boxes, objectness, prop_valid,
               gt_classes_oh) -> Dict[str, jnp.ndarray]:
        feats = self._features(pooled, objectness, train=True)
        c, d = self.wsddn(feats)
        mil_scores = wsddn_scores(c, d, prop_valid)
        losses = {"loss_cls": mil_loss(mil_scores, gt_classes_oh, self.mean_loss)}

        prev = jax.lax.stop_gradient(mil_scores)  # (P, C) for branch 0
        for k in range(self.refine_k):
            logits, _ = self.refine[k](feats)
            loss_k, probs = self._branch_loss(
                logits, boxes, prop_valid, prev, gt_classes_oh)
            losses[f"loss_cls_r{k}"] = loss_k
            prev = jax.lax.stop_gradient(probs)  # (P, C+1) bg-first for k>0
        return losses

    def predict(self, pooled, boxes, objectness, prop_valid
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Mean of K branch softmaxes with bg rolled from column 0 to the
        last column (fast_rcnn_oicr.py:603-605)."""
        feats = self._features(pooled, objectness, train=False)
        probs = None
        for k in range(self.refine_k):
            logits, _ = self.refine[k](feats)
            pk = jax.nn.softmax(jnp.asarray(logits, jnp.float32), axis=-1)
            probs = pk if probs is None else probs + pk
        probs = probs / self.refine_k
        probs = jnp.concatenate([probs[:, 1:], probs[:, :1]], axis=1)
        pred_boxes = jnp.tile(boxes, (1, self.num_classes))
        return probs, pred_boxes
