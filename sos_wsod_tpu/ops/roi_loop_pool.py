"""ROILoopPool: 3-region ROI max pooling (box / frame ring / context ring).

Parity target: the reference's wsl ROILoopPool CUDA kernel
(uwsod/projects/WSL/wsl/layers/csrc/ROILoopPool/ROILoopPool_cuda.cu:10-203,
context_ratio=1.8 at :309; wrapper wsl/layers/roi_loop_pool.py:9-58). Output is
3 stacked ROI blocks:
  block 0 (box):     RoIPool over the box window; max initialized at 0
                     (the kernel assumes non-negative inputs)
  block 1 (frame):   same windows, excluding cells STRICTLY inside the
                     inner box (sides scaled by 1/ratio around the center)
  block 2 (context): windows from the outer box (sides x ratio), excluding
                     cells strictly inside the original box

TPU-native: reuses roi_pool's sparse-table windowed max. "Window minus inner
rect" = max over four overlapping boundary strips (top/bottom/left/right),
each itself a rectangle answered by the same table — 4 extra rect-max queries
per bin instead of a scan, fully vectorized.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .roi_pool import _bin_bounds, _floor_log2, _num_levels, build_max_table

_NEG = -3.0e38


def _rect_max(t2_flat, lw, h, w, hs, he, ws, we):
    """Max over [hs, he) x [ws, we) per (P, PH, PW) rect set via 4 corner
    lookups into the (lh, lw, H, W, C) doubling table. Empty rects -> -inf."""
    nh = he - hs
    nw = we - ws
    empty = (nh <= 0) | (nw <= 0)
    kh = _floor_log2(nh)
    kw = _floor_log2(nw)
    h2 = jnp.maximum(he - (1 << kh), 0)
    w2 = jnp.maximum(we - (1 << kw), 0)

    def flat_idx(hb, wb):
        return ((kh * lw + kw) * h + hb) * w + wb

    out = None
    for hb in (hs, h2):
        for wb in (ws, w2):
            v = jnp.take(t2_flat, flat_idx(hb, wb), axis=0)
            out = v if out is None else jnp.maximum(out, v)
    return jnp.where(empty[..., None], _NEG, out)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale", "context_ratio"))
def roi_loop_pool(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    spatial_scale: float,
    output_size: Tuple[int, int] = (7, 7),
    context_ratio: float = 1.8,
) -> jnp.ndarray:
    """feat (H, W, C), boxes (P, 4) XYXY, valid (P,) ->
    (3P, C, PH, PW) stacked [box; frame; context] like the reference kernel."""
    h, w, c = feat.shape
    ph_out, pw_out = output_size
    lh = _num_levels(int(h * context_ratio) // ph_out + 5)
    lw = _num_levels(int(w * context_ratio) // pw_out + 5)
    t2 = build_max_table(feat, lh, lw)
    t2_flat = t2.reshape(lh * lw * h * w, c)

    boxes = jnp.where(valid[:, None], boxes, 0.0).astype(jnp.float32)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    rw = x2 - x1
    rh = y2 - y1
    inner_res_w = (rw - rw / context_ratio) / 2
    inner_res_h = (rh - rh / context_ratio) / 2
    outer_res_w = (rw * context_ratio - rw) / 2
    outer_res_h = (rh * context_ratio - rh) / 2
    max_x = w / spatial_scale
    max_y = h / spatial_scale
    x1_in = jnp.clip(x1 + inner_res_w, 0, max_x)
    y1_in = jnp.clip(y1 + inner_res_h, 0, max_y)
    x2_in = jnp.clip(x2 - inner_res_w, 0, max_x)
    y2_in = jnp.clip(y2 - inner_res_h, 0, max_y)
    x1_out = jnp.clip(x1 - outer_res_w, 0, max_x)
    y1_out = jnp.clip(y1 - outer_res_h, 0, max_y)
    x2_out = jnp.clip(x2 + outer_res_w, 0, max_x)
    y2_out = jnp.clip(y2 + outer_res_h, 0, max_y)

    def snap(v):
        return jnp.floor(v * spatial_scale + 0.5).astype(jnp.int32)

    def windows(xs1, ys1, xs2, ys2):
        """Pooling-bin bounds [hs,he)x[ws,we) (P, PH/PW) for given roi rect."""
        rs_w, rs_h, re_w, re_h = snap(xs1), snap(ys1), snap(xs2), snap(ys2)
        roi_w = jnp.maximum(re_w - rs_w + 1, 1)
        roi_h = jnp.maximum(re_h - rs_h + 1, 1)
        hs, he = _bin_bounds(rs_h, roi_h, ph_out, h)
        ws, we = _bin_bounds(rs_w, roi_w, pw_out, w)
        return hs, he, ws, we

    def bcast(hb, wb):
        """(P, PH) x (P, PW) -> (P, PH, PW)"""
        return jnp.broadcast_to(hb[:, :, None], hb.shape + (pw_out,)), jnp.broadcast_to(
            wb[:, None, :], (wb.shape[0], ph_out, wb.shape[1])
        )

    def full_max(hs, he, ws, we):
        HS, WS = bcast(hs, ws)
        HE, WE = bcast(he, we)
        return _rect_max(t2_flat, lw, h, w, HS, HE, WS, WE)

    def ring_max(hs, he, ws, we, in_h1, in_h2, in_w1, in_w2):
        """Max over window minus strict-interior of inner rect.
        Kept cells: h <= in_h1 or h >= in_h2 or w <= in_w1 or w >= in_w2,
        where interior excludes boundary (> in_h1 and < in_h2)."""
        HS, WS = bcast(hs, ws)
        HE, WE = bcast(he, we)
        IH1, IW1 = bcast(jnp.broadcast_to(in_h1[:, None], hs.shape),
                         jnp.broadcast_to(in_w1[:, None], ws.shape))
        IH2, IW2 = bcast(jnp.broadcast_to(in_h2[:, None], hs.shape),
                         jnp.broadcast_to(in_w2[:, None], ws.shape))
        m = _rect_max(t2_flat, lw, h, w, HS, jnp.minimum(HE, IH1 + 1), WS, WE)
        m = jnp.maximum(m, _rect_max(t2_flat, lw, h, w, jnp.maximum(HS, IH2), HE, WS, WE))
        m = jnp.maximum(m, _rect_max(t2_flat, lw, h, w, HS, HE, WS, jnp.minimum(WE, IW1 + 1)))
        m = jnp.maximum(m, _rect_max(t2_flat, lw, h, w, HS, HE, jnp.maximum(WS, IW2), WE))
        return m

    # block 0: plain box pool
    bh_s, bh_e, bw_s, bw_e = windows(x1, y1, x2, y2)
    out_box = full_max(bh_s, bh_e, bw_s, bw_e)

    # block 1: frame — box windows minus inner-box interior
    ih1, iw1 = snap(y1_in), snap(x1_in)
    ih2, iw2 = snap(y2_in), snap(x2_in)
    out_frame = ring_max(bh_s, bh_e, bw_s, bw_e, ih1, ih2, iw1, iw2)

    # block 2: context — outer-box windows minus original-box interior
    oh_s, oh_e, ow_s, ow_e = windows(x1_out, y1_out, x2_out, y2_out)
    bh1, bw1 = snap(y1), snap(x1)
    bh2, bw2 = snap(y2), snap(x2)
    out_ctx = ring_max(oh_s, oh_e, ow_s, ow_e, bh1, bh2, bw1, bw2)

    def finish(o):
        o = jnp.maximum(o, 0.0)  # kernel inits max at 0 (non-negative inputs)
        o = jnp.where(valid[:, None, None, None], o, 0.0)
        return jnp.transpose(o, (0, 3, 1, 2)).astype(feat.dtype)

    return jnp.concatenate([finish(out_box), finish(out_frame), finish(out_ctx)], axis=0)
