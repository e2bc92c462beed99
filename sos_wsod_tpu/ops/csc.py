"""CSC: Class-Specific pooling of CPG (Class Peak Gradient) evidence.

Parity target: the wsl csc kernel (uwsod/projects/WSL/wsl/layers/csrc/csc/
csc_cuda.cu:184-548, wrapper wsl/layers/csc.py:6-97). For every present
class (label >= 0.5), the class's CPG map is binarised at ``fg_threshold``,
turned into an integral image, and each ROI is scored by the frame/context
contrast

    score = sum(frame) / sqrt(area(frame)) - sum(context) / sqrt(area(context))

where frame = roi minus roi/context_scale and context = roi*context_scale
minus roi (coordinates rounded exactly like the kernel). Scores are then
per-class normalised (positives / max, negatives / |min|; all-ones when no
positive score exists) and blended with the image-level prediction
confidence: W = pred * W + (1 - pred). Absent classes keep W = 1.

Unlike the reference (a CUDA kernel inside a per-class host loop), the whole
computation is expressed as batched XLA ops — binarise + two cumsums per
class, then pure gathers per ROI — so it fuses and runs on-device. The op is
non-differentiable by construction (the reference Function returns None
grads); wrap inputs in stop_gradient at call sites.

``csc_constraint`` reproduces the _CSCConstraint autograd Function
(csc.py:102-137): Y = X * clamp(W) with gradient dX = dY * clamp(W) and no
gradient to W.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

KMIN_SCORE = -1.0e20


def _round_half_up(x: jnp.ndarray) -> jnp.ndarray:
    """C round() for the non-negative coordinates used here."""
    return jnp.floor(x + 0.5)


def _integral_lookup(ipad: jnp.ndarray, y0, x0, y1, x1) -> jnp.ndarray:
    """Inclusive rectangle sum over the zero-padded integral image.
    ipad has shape (H+1, W+1) with ipad[0,:] = ipad[:,0] = 0."""
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = y1.astype(jnp.int32)
    x1 = x1.astype(jnp.int32)
    a1 = ipad[y1 + 1, x1 + 1]
    a2 = ipad[y1 + 1, x0]
    a3 = ipad[y0, x1 + 1]
    a4 = ipad[y0, x0]
    return a1 - a2 - a3 + a4


def _csc_scores_one_class(cpg: jnp.ndarray, rois: jnp.ndarray,
                          fg_threshold: float, area_sqrt: bool,
                          context_scale: float) -> jnp.ndarray:
    """(H, W) cpg + (N, 4) rois -> (N,) contrast scores (csc_cuda.cu:184-348)."""
    h, w = cpg.shape
    binary = (cpg >= fg_threshold).astype(jnp.float32)
    integral = jnp.cumsum(jnp.cumsum(binary, axis=0), axis=1)
    ipad = jnp.pad(integral, ((1, 0), (1, 0)))

    wstart = jnp.clip(_round_half_up(rois[:, 0]), 0, w - 1)
    hstart = jnp.clip(_round_half_up(rois[:, 1]), 0, h - 1)
    wend = jnp.clip(_round_half_up(rois[:, 2]), 0, w - 1)
    hend = jnp.clip(_round_half_up(rois[:, 3]), 0, h - 1)

    width_roi = wend - wstart
    height_roi = hend - hstart
    wcenter = (wend + wstart) / 2.0
    hcenter = (hend + hstart) / 2.0

    wstart_inner = _round_half_up(wcenter - width_roi / context_scale / 2.0)
    hstart_inner = _round_half_up(hcenter - height_roi / context_scale / 2.0)
    wend_inner = _round_half_up(wcenter + width_roi / context_scale / 2.0)
    hend_inner = _round_half_up(hcenter + height_roi / context_scale / 2.0)

    wstart_outer = _round_half_up(jnp.maximum(wcenter - width_roi * context_scale / 2.0, 0.0))
    hstart_outer = _round_half_up(jnp.maximum(hcenter - height_roi * context_scale / 2.0, 0.0))
    wend_outer = _round_half_up(jnp.minimum(wcenter + width_roi * context_scale / 2.0, w - 1.0))
    hend_outer = _round_half_up(jnp.minimum(hcenter + height_roi * context_scale / 2.0, h - 1.0))

    sum_roi = _integral_lookup(ipad, hstart, wstart, hend, wend)
    sum_inner = _integral_lookup(ipad, hstart_inner, wstart_inner,
                                 hend_inner, wend_inner)
    sum_outer = _integral_lookup(ipad, hstart_outer, wstart_outer,
                                 hend_outer, wend_outer)

    area_roi = (hend - hstart + 1) * (wend - wstart + 1)
    area_inner = (hend_inner - hstart_inner + 1) * (wend_inner - wstart_inner + 1)
    area_outer = (hend_outer - hstart_outer + 1) * (wend_outer - wstart_outer + 1)
    area_frame = jnp.maximum(area_roi - area_inner, 1.0)
    area_context = jnp.maximum(area_outer - area_roi, 1.0)

    sum_frame = sum_roi - sum_inner
    sum_context = sum_outer - sum_roi
    if area_sqrt:
        return (sum_frame / jnp.sqrt(area_frame)
                - sum_context / jnp.sqrt(area_context))
    return sum_frame / area_frame - sum_context / area_context


def _normalize_one_class(scores: jnp.ndarray, pred: jnp.ndarray,
                         active: jnp.ndarray, valid: jnp.ndarray
                         ) -> jnp.ndarray:
    """Per-class normalisation + confidence blend (csc_cuda.cu:487-530)."""
    s = jnp.where(valid, scores, 0.0)
    max_value = jnp.maximum(jnp.max(s), 0.0)
    min_value = jnp.minimum(jnp.min(s), 0.0)
    norm_both = jnp.where(scores > 0,
                          scores / jnp.where(max_value > 0, max_value, 1.0),
                          scores / jnp.where(min_value < 0, -min_value, 1.0))
    norm_pos = scores / jnp.where(max_value > 0, max_value, 1.0)
    w = jnp.where(
        (max_value > 0) & (min_value < 0), norm_both,
        jnp.where((max_value > 0) & (min_value == 0), norm_pos,
                  jnp.ones_like(scores)))
    w = pred * w + (1.0 - pred)
    w = jnp.where(valid, w, 1.0)
    return jnp.where(active, w, jnp.ones_like(scores))


@partial(jax.jit, static_argnames=("fg_threshold", "area_sqrt",
                                   "context_scale"))
def csc(cpgs: jnp.ndarray,        # (C, H, W) class peak gradient maps
        labels: jnp.ndarray,      # (C,) image labels (one-hot)
        preds: jnp.ndarray,       # (C,) image-level predicted class scores
        rois: jnp.ndarray,        # (N, 4) xyxy in image coordinates
        valid: jnp.ndarray,       # (N,) roi validity mask
        *,
        fg_threshold: float = 0.1,
        area_sqrt: bool = True,
        context_scale: float = 1.8,
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (W (N, C), PL (C,), NL (C,)) — W in [-1, 1], PL = labels,
    NL = zeros, as in the reference Function (csc.py:27-42)."""
    cpgs = jax.lax.stop_gradient(jnp.asarray(cpgs, jnp.float32))
    rois = jax.lax.stop_gradient(jnp.asarray(rois, jnp.float32))
    preds = jax.lax.stop_gradient(jnp.asarray(preds, jnp.float32))
    active = labels >= 0.5

    scores = jax.vmap(
        lambda m: _csc_scores_one_class(m, rois, fg_threshold, area_sqrt,
                                        context_scale)
    )(cpgs)                                   # (C, N)
    w = jax.vmap(_normalize_one_class, in_axes=(0, 0, 0, None))(
        scores, preds, active, valid)          # (C, N)
    pl = labels.astype(jnp.float32)
    nl = jnp.zeros_like(pl)
    return w.T, pl, nl


def csc_constraint(x: jnp.ndarray, w: jnp.ndarray, polar: bool
                   ) -> jnp.ndarray:
    """Y = X * clamp(W); gradient flows as dX = dY * clamp(W), none to W
    (reference _CSCConstraint, csc.py:102-131)."""
    w_ = jnp.maximum(w, 0.0) if polar else -jnp.minimum(w, 0.0)
    return x * jax.lax.stop_gradient(w_)
