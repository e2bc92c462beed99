"""CSC ROI head: WSDDN MIL with CPG-derived spatial constraints.

Parity targets:
 - CSCROIHeads (reference: uwsod/projects/WSL/wsl/modeling/roi_heads/
   roi_heads_csc.py:35-551): DAN + WSDDN predictor; per present class whose
   image score exceeds tau, a Class Peak Gradient map (|d score_c / d image|
   maxed over channels, peak-normalised, roi_heads_csc.py:423-476) feeds the
   CSC op to produce per-ROI positive/negative weights; the loss is a
   positive BCE on sum(scores * W_pos) against PL plus a negative BCE on
   sum(scores * W_neg) against NL (fast_rcnn_wsddn.py:1020-1066,
   CSCOutputs.csc_loss);
 - after WSL.CSC_MAX_ITER the constraints freeze to W_pos=1/W_neg=0
   (roi_heads_csc.py:477-495), recovering plain MIL.

TPU design: the reference computes one autograd.grad per present class in a
Python loop; here one ``jax.vjp`` of the image->scores function is pulled
back under ``vmap`` over all C one-hot cotangents at once — a single batched
backward pass. The max-iter switch is a traced boolean (``use_csc``) so the
two regimes share one compiled program.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.csc import csc
from .dan import DAN
from .wsddn import WSDDNHead, mil_image_scores, wsddn_scores


def compute_cpg(
    scores_fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,          # (H, W, 3) or (3, H, W)
    gt_classes_oh: jnp.ndarray,  # (C,)
    preds_img: jnp.ndarray,      # (C,) image-level class scores
    tau: float = 0.7,
    channel_axis: int = -1,
) -> jnp.ndarray:
    """Class Peak Gradient maps (roi_heads_csc.py:423-476): per class,
    |d sum_p scores[p, c] / d image| maxed over channels, normalised to
    peak 1; zeroed for absent or low-confidence classes. Returns (C, H, W)."""
    scores = scores_fn(image)  # (P, C) — traced once for the vjp
    c = scores.shape[1]

    _, pullback = jax.vjp(lambda im: jnp.sum(scores_fn(im), axis=0), image)
    grads = jax.vmap(lambda ct: pullback(ct)[0])(jnp.eye(c, dtype=scores.dtype))
    cpg = jnp.max(jnp.abs(grads), axis=channel_axis if channel_axis >= 0
                  else grads.ndim + channel_axis)          # (C, H, W)
    peak = jnp.maximum(jnp.max(cpg, axis=(1, 2), keepdims=True), 1e-12)
    cpg = cpg / peak
    active = (gt_classes_oh >= 0.5) & (preds_img >= tau)
    return jnp.where(active[:, None, None], cpg, 0.0)


def csc_mil_loss(
    scores: jnp.ndarray,         # (P, C) WSDDN proposal scores
    w_pos: jnp.ndarray,          # (P, C)
    w_neg: jnp.ndarray,          # (P, C)
    pl: jnp.ndarray,             # (C,)
    nl: jnp.ndarray,             # (C,)
    mean_loss: bool = True,
) -> Dict[str, jnp.ndarray]:
    """CSCOutputs.csc_loss (fast_rcnn_wsddn.py:1020-1066)."""
    def bce(p, t):
        p32 = jnp.asarray(p, jnp.float32)
        terms = -(t * jnp.log(p32) + (1.0 - t) * jnp.log(1.0 - p32))
        return jnp.mean(terms) if mean_loss else jnp.sum(terms)

    img_pos = jnp.clip(jnp.sum(scores * w_pos, axis=0), 1e-20, 1 - 1e-20)
    img_neg = jnp.clip(jnp.sum(scores * w_neg, axis=0), 1e-20, 1 - 1e-20)
    return {"loss_cls_pos": bce(img_pos, pl), "loss_cls_neg": bce(img_neg, nl)}


class CSCROIHead(nn.Module):
    """DAN + WSDDN with CSC positive/negative spatial constraints."""

    num_classes: int = 20
    mean_loss: bool = True
    tau: float = 0.7
    fg_threshold: float = 0.1
    context_scale: float = 1.8
    area_sqrt: bool = True
    dan_dims: Sequence[int] = (4096, 4096)
    dtype: Any = jnp.float32

    def setup(self):
        self.dan = DAN(fc_dims=tuple(self.dan_dims), dtype=self.dtype)
        self.wsddn = WSDDNHead(self.num_classes, dtype=self.dtype)

    def _features(self, pooled, objectness, train):
        w = (objectness + 1.0).astype(pooled.dtype)
        x = pooled * w[:, None, None, None]
        return self.dan(x, train=train)

    def scores(self, pooled, objectness, prop_valid, train: bool = True):
        feats = self._features(pooled, objectness, train=train)
        c, d = self.wsddn(feats)
        return wsddn_scores(c, d, prop_valid)

    def losses(self, pooled, boxes, objectness, prop_valid, gt_classes_oh,
               cpgs: jnp.ndarray, use_csc: jnp.ndarray
               ) -> Dict[str, jnp.ndarray]:
        """cpgs: (C, H, W) from :func:`compute_cpg` (in image coordinates,
        matching ``boxes``); use_csc: traced bool — False past CSC_MAX_ITER."""
        scores = self.scores(pooled, objectness, prop_valid, train=True)
        preds_img = mil_image_scores(scores)
        w, pl, nl = csc(cpgs, gt_classes_oh, preds_img, boxes, prop_valid,
                        fg_threshold=self.fg_threshold,
                        area_sqrt=self.area_sqrt,
                        context_scale=self.context_scale)
        w_pos = jnp.abs(jnp.maximum(w, 0.0))
        w_neg = jnp.abs(jnp.minimum(w, 0.0))
        # past CSC_MAX_ITER: W_pos = 1, W_neg = 0 (roi_heads_csc.py:477-495)
        w_pos = jnp.where(use_csc, w_pos, 1.0)
        w_neg = jnp.where(use_csc, w_neg, 0.0)
        w_pos = jnp.where(prop_valid[:, None], w_pos, 0.0)
        w_neg = jnp.where(prop_valid[:, None], w_neg, 0.0)
        return csc_mil_loss(scores, w_pos, w_neg, pl, nl, self.mean_loss)

    def predict(self, pooled, boxes, objectness, prop_valid
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """WSDDN inference: MIL scores with a zero background column."""
        scores = self.scores(pooled, objectness, prop_valid, train=False)
        scores = jnp.concatenate(
            [scores, jnp.zeros((scores.shape[0], 1), scores.dtype)], axis=1)
        return scores, boxes
