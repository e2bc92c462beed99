"""ROI max pooling with exact torchvision semantics, TPU-native formulation.

Parity target: torchvision ``roi_pool`` as consumed by the reference's WSL
pooler (reference: uwsod/projects/WSL/wsl/modeling/poolers.py:183-185; CUDA
kernel semantics mirrored from torchvision's ROIPool_cuda.cu). Semantics:

    rs = round(coord * spatial_scale)                     (round half up)
    roi_w = max(re_w - rs_w + 1, 1);  bin_w = roi_w / PW
    wstart = clamp(floor(pw * bin_w) + rs_w, 0, W)
    wend   = clamp(ceil((pw+1) * bin_w) + rs_w, 0, W)
    out[p, ph, pw] = max over the [hstart,hend) x [wstart,wend) window,
                     0 if the window is empty.

TPU-native design (no per-bin scan loops, no dynamic shapes): windowed max is
answered with a 2D *doubling table* (sparse-table RMQ). T2[kh, kw, h, w] holds
the max over the 2^kh x 2^kw block at (h, w); any window [s,e)x[s',e') is the
max of 4 overlapping corner blocks. Build cost is O(Lh*Lw) vectorized shifted
maxes over the feature map; each of the P*PH*PW output bins then needs exactly
4 channel-vector gathers — independent of window size. Overlapping corners
double-cover some cells, which is harmless for max. Gradients flow by autodiff:
gather-VJP scatters into the tables and max-VJP routes through the build chain;
tied maxima split gradient evenly (torchvision routes ties to the first scan
position — a subgradient-level difference only).

Requires boxes roughly clipped to the image (coords are clamped to one bin of
overhang, beyond which windows would exceed the table's level range).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_NEG = -3.0e38  # sentinel below any real activation, safely inside float32


def _shift_max(x: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """max(x[i], x[i+d]) along axis, filling past the end with -inf sentinel."""
    n = x.shape[axis]
    if d >= n:
        return x
    idx_main = [slice(None)] * x.ndim
    idx_main[axis] = slice(d, None)
    pad_shape = list(x.shape)
    pad_shape[axis] = d
    shifted = jnp.concatenate(
        [x[tuple(idx_main)], jnp.full(pad_shape, _NEG, dtype=x.dtype)], axis=axis
    )
    return jnp.maximum(x, shifted)


def _num_levels(max_window: int) -> int:
    return max(1, int(math.floor(math.log2(max(max_window - 1, 1)))) + 1)


def build_max_table(feat: jnp.ndarray, lh: int, lw: int) -> jnp.ndarray:
    """feat (H, W, C) -> T2 (lh, lw, H, W, C) doubling max table."""
    rows = [feat]
    for l in range(1, lh):
        rows.append(_shift_max(rows[-1], 1 << (l - 1), axis=0))
    levels = []
    for r in rows:
        cols = [r]
        for l in range(1, lw):
            cols.append(_shift_max(cols[-1], 1 << (l - 1), axis=1))
        levels.append(jnp.stack(cols, axis=0))
    return jnp.stack(levels, axis=0)


def _bin_bounds(start: jnp.ndarray, size: jnp.ndarray, pooled: int, limit: int):
    """Integer bin boundaries for one spatial dim.

    start, size: (P,) int32 roi start / roi extent. Returns s, e: (P, pooled).
    Boundaries floor(g*size/pooled) / ceil((g+1)*size/pooled) are computed with
    exact integer arithmetic — platform-independent, unlike torchvision's f32
    products which can differ by 1 ULP around integer boundaries.
    """
    grid = jnp.arange(pooled, dtype=jnp.int32)
    lo = (grid[None, :] * size[:, None]) // pooled
    hi = ((grid[None, :] + 1) * size[:, None] + (pooled - 1)) // pooled
    s = jnp.clip(lo + start[:, None], 0, limit)
    e = jnp.clip(hi + start[:, None], 0, limit)
    return s, e


def _floor_log2(n: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(n)) for int n >= 1, exact (bit-length based)."""
    n = jnp.maximum(n, 1)
    return (31 - jax.lax.clz(n.astype(jnp.int32))).astype(jnp.int32)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale", "chunk"))
def roi_pool(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    spatial_scale: float,
    output_size: Tuple[int, int] = (7, 7),
    chunk: int = 1024,
) -> jnp.ndarray:
    """ROI max pool.

    Args:
        feat: (H, W, C) feature map (channels-last).
        boxes: (P, 4) XYXY in image coordinates.
        valid: (P,) bool; padded slots produce zeros.
    Returns:
        (P, C, PH, PW) pooled features (d2 channel-first layout for FC parity).
    """
    h, w, c = feat.shape
    ph_out, pw_out = output_size
    lh = _num_levels(h // ph_out + 4)
    lw = _num_levels(w // pw_out + 4)
    t2 = build_max_table(feat, lh, lw)  # (lh, lw, H, W, C)
    t2_flat = t2.reshape(lh * lw * h * w, c)

    # integer roi extents (round half up, torchvision `round`)
    boxes = jnp.where(valid[:, None], boxes, 0.0)  # guard padded-slot garbage
    scaled = boxes.astype(jnp.float32) * spatial_scale
    rs_w = jnp.floor(scaled[:, 0] + 0.5).astype(jnp.int32)
    rs_h = jnp.floor(scaled[:, 1] + 0.5).astype(jnp.int32)
    re_w = jnp.floor(scaled[:, 2] + 0.5).astype(jnp.int32)
    re_h = jnp.floor(scaled[:, 3] + 0.5).astype(jnp.int32)
    # clamp overhang so bin windows stay within table level range
    rs_w = jnp.clip(rs_w, 0, w + pw_out)
    rs_h = jnp.clip(rs_h, 0, h + ph_out)
    re_w = jnp.clip(re_w, -1, w + pw_out)
    re_h = jnp.clip(re_h, -1, h + ph_out)
    roi_w = jnp.maximum(re_w - rs_w + 1, 1)
    roi_h = jnp.maximum(re_h - rs_h + 1, 1)

    hs, he = _bin_bounds(rs_h, roi_h, ph_out, h)  # (P, PH)
    ws, we = _bin_bounds(rs_w, roi_w, pw_out, w)  # (P, PW)

    nh = he - hs  # (P, PH)
    nw = we - ws
    empty = (nh[:, :, None] <= 0) | (nw[:, None, :] <= 0)  # (P, PH, PW)

    kh = _floor_log2(nh)  # (P, PH)
    kw = _floor_log2(nw)
    h1, h2 = hs, jnp.maximum(he - (1 << kh), 0)
    w1, w2 = ws, jnp.maximum(we - (1 << kw), 0)

    def flat_idx(khb, kwb, hb, wb):
        # ((kh*lw + kw)*H + h)*W + w ; hb:(P,PH) wb:(P,PW) -> (P,PH,PW)
        base = (khb[:, :, None] * lw + kwb[:, None, :]) * h
        return (base + hb[:, :, None]) * w + wb[:, None, :]

    corners = [
        flat_idx(kh, kw, h1, w1),
        flat_idx(kh, kw, h1, w2),
        flat_idx(kh, kw, h2, w1),
        flat_idx(kh, kw, h2, w2),
    ]

    def pool_chunk(args):
        idx0, idx1, idx2, idx3, empty_c, valid_c = args
        out = jnp.take(t2_flat, idx0, axis=0)
        for ix in (idx1, idx2, idx3):
            out = jnp.maximum(out, jnp.take(t2_flat, ix, axis=0))
        mask = (~empty_c) & valid_c[:, None, None]
        return jnp.where(mask[..., None], out, 0.0).astype(feat.dtype)

    p = boxes.shape[0]
    if p > chunk and p % chunk == 0:
        args = tuple(x.reshape((p // chunk, chunk) + x.shape[1:]) for x in corners) + (
            empty.reshape(p // chunk, chunk, ph_out, pw_out),
            valid.reshape(p // chunk, chunk),
        )
        out = jax.lax.map(pool_chunk, args)
        out = out.reshape(p, ph_out, pw_out, c)
    else:
        out = pool_chunk((corners[0], corners[1], corners[2], corners[3], empty, valid))
    return jnp.transpose(out, (0, 3, 1, 2))  # (P, C, PH, PW)
