"""ROIAlign (V1/V2-aligned) as masked bilinear gathers.

Parity target: detectron2's ROIAlign CUDA/CPU kernels (reference:
uwsod/detectron2/layers/csrc/ROIAlign/ROIAlign_cuda.cu, consumed via
``ROIAlign(aligned=True)`` — "ROIAlignV2" — for the stage-2/3 FPN heads).

Semantics reproduced exactly for sampling_ratio > 0; for the adaptive case
(sampling_ratio == 0, grid = ceil(bin_size) per ROI) the per-ROI dynamic grid
is realized as a static ``sample_cap`` grid with validity masking and division
by the true sample count — exact whenever the adaptive grid fits the cap
(always true for FPN-level-assigned ROIs; pathological mega-bins fall back to a
cap x cap subsample of the bin).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_weights(y, x, h, w):
    """d2 bilinear with border snapping. y,x: float arrays. Returns 4 (idx, weight)."""
    oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = jnp.minimum(y.astype(jnp.int32), h - 1)
    x_low = jnp.minimum(x.astype(jnp.int32), w - 1)
    y_high = jnp.minimum(y_low + 1, h - 1)
    x_high = jnp.minimum(x_low + 1, w - 1)
    y = jnp.where(y_low >= h - 1, jnp.float32(h - 1), y)
    x = jnp.where(x_low >= w - 1, jnp.float32(w - 1), x)
    ly = y - y_low.astype(y.dtype)
    lx = x - x_low.astype(x.dtype)
    hy, hx = 1.0 - ly, 1.0 - lx
    idx = [
        y_low * w + x_low,
        y_low * w + x_high,
        y_high * w + x_low,
        y_high * w + x_high,
    ]
    wts = [hy * hx, hy * lx, ly * hx, ly * lx]
    wts = [jnp.where(oob, 0.0, wt) for wt in wts]
    return idx, wts


@partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "sampling_ratio", "aligned", "sample_cap"),
)
def roi_align(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    spatial_scale: float,
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 0,
    aligned: bool = True,
    sample_cap: int = 8,
) -> jnp.ndarray:
    """feat (H, W, C), boxes (P, 4) XYXY, valid (P,) -> (P, C, PH, PW)."""
    h, w, c = feat.shape
    ph_out, pw_out = output_size
    cap = sampling_ratio if sampling_ratio > 0 else sample_cap
    boxes = jnp.where(valid[:, None], boxes, 0.0)
    offset = 0.5 if aligned else 0.0
    scaled = boxes.astype(jnp.float32) * spatial_scale - offset
    roi_w = scaled[:, 2] - scaled[:, 0]
    roi_h = scaled[:, 3] - scaled[:, 1]
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_h = roi_h / ph_out  # (P,)
    bin_w = roi_w / pw_out
    if sampling_ratio > 0:
        grid_h = jnp.full(boxes.shape[:1], sampling_ratio, jnp.int32)
        grid_w = grid_h
    else:
        grid_h = jnp.clip(jnp.ceil(bin_h).astype(jnp.int32), 1, cap)
        grid_w = jnp.clip(jnp.ceil(bin_w).astype(jnp.int32), 1, cap)
    count = jnp.maximum(grid_h * grid_w, 1).astype(jnp.float32)  # (P,)

    feat_flat = feat.reshape(h * w, c)
    ph_idx = jnp.arange(ph_out, dtype=jnp.float32)
    pw_idx = jnp.arange(pw_out, dtype=jnp.float32)

    acc = jnp.zeros((boxes.shape[0], ph_out, pw_out, c), dtype=jnp.float32)
    for iy in range(cap):
        y_frac = (iy + 0.5) / grid_h.astype(jnp.float32)  # (P,)
        y = (
            scaled[:, 1][:, None]
            + ph_idx[None, :] * bin_h[:, None]
            + y_frac[:, None] * bin_h[:, None]
        )  # (P, PH)
        y_ok = iy < grid_h  # (P,)
        for ix in range(cap):
            x_frac = (ix + 0.5) / grid_w.astype(jnp.float32)
            x = (
                scaled[:, 0][:, None]
                + pw_idx[None, :] * bin_w[:, None]
                + x_frac[:, None] * bin_w[:, None]
            )  # (P, PW)
            ok = (y_ok & (ix < grid_w)).astype(jnp.float32)  # (P,)
            yy = jnp.broadcast_to(y[:, :, None], y.shape + (pw_out,))
            xx = jnp.broadcast_to(x[:, None, :], (x.shape[0], ph_out, pw_out))
            idxs, wts = _bilinear_weights(yy, xx, h, w)
            sample = jnp.zeros_like(acc)
            for ii, wt in zip(idxs, wts):
                sample = sample + jnp.take(feat_flat, ii, axis=0) * wt[..., None]
            acc = acc + sample * ok[:, None, None, None]
    out = acc / count[:, None, None, None]
    out = jnp.where(valid[:, None, None, None], out, 0.0).astype(feat.dtype)
    return jnp.transpose(out, (0, 3, 1, 2))
