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
import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_NEG = -3.0e38  # sentinel below any real activation, safely inside float32


def _shift_max(x: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """max(x[i], x[i+d]) along axis, filling past the end with a minimal
    sentinel (-inf-like for floats, iinfo.min for integer key tables)."""
    n = x.shape[axis]
    if d >= n:
        return x
    idx_main = [slice(None)] * x.ndim
    idx_main[axis] = slice(d, None)
    pad_shape = list(x.shape)
    pad_shape[axis] = d
    sentinel = (jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer)
                else _NEG)
    shifted = jnp.concatenate(
        [x[tuple(idx_main)], jnp.full(pad_shape, sentinel, dtype=x.dtype)], axis=axis
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


def build_max_table_flat(feat: jnp.ndarray, lh: int, lw: int) -> jnp.ndarray:
    """feat (H, W, C) -> flat (lh*lw*H*W, C) doubling table.

    Same contents as ``build_max_table(...).reshape(lh*lw*h*w, c)`` but built
    by concatenating 2D row-blocks, so the materialized layout is already the
    row-major (rows, C) form the corner gather consumes — the 6-D stack +
    reshape variant costs ~18 ms/step in pad/copy/relayout fusions on TPU."""
    h, w, c = feat.shape
    rows = [feat]
    for l in range(1, lh):
        rows.append(_shift_max(rows[-1], 1 << (l - 1), axis=0))
    blocks = []
    for r in rows:
        col = r
        blocks.append(col.reshape(h * w, c))
        for l in range(1, lw):
            col = _shift_max(col, 1 << (l - 1), axis=1)
            blocks.append(col.reshape(h * w, c))
    return jnp.concatenate(blocks, axis=0)


def build_max_table_hexact_flat(feat: jnp.ndarray, sh: int, lw: int) -> jnp.ndarray:
    """feat (H, W, C) -> flat (sh*lw*H*W, C) exact-height x doubling-width
    max table.

    Block (s, kw) holds, at cell (h, w), the max over the s x 2^kw window
    anchored there (exact height s in 1..sh, power-of-2 width). Exact heights
    make the H dimension answerable with ONE lookup per bin (the bin height
    indexes the level directly), so a pooling window needs only TWO corner
    gathers (the doubling-W pair) instead of four — halving the gather and
    backward-scatter row counts, which dominate the stage-1 step. Build cost
    is sh + sh*(lw-1) shifted maxes (T[s] = max(T[s-1][h], T[s-1][h+1]) —
    each exact level is one shift-by-1 max over the previous)."""
    h, w, c = feat.shape
    blocks = []
    row = feat
    for s in range(sh):
        if s > 0:
            row = _shift_max(row, 1, axis=0)
        col = row
        blocks.append(col.reshape(h * w, c))
        for l in range(1, lw):
            col = _shift_max(col, 1 << (l - 1), axis=1)
            blocks.append(col.reshape(h * w, c))
    return jnp.concatenate(blocks, axis=0)


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


def _bin_windows(boxes, valid, h, w, ph_out, pw_out, spatial_scale):
    """ROI -> per-bin window bounds. Returns (hs, he) (P, PH) and (ws, we)
    (P, PW), half-open, clipped to the feature extent."""
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
    return hs, he, ws, we


def _corners_from_windows(hs, he, ws, we, h, w, lw):
    """Window bounds -> 4 flat doubling-table corner indices + empty mask."""
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
    return corners, empty


def _bin_corner_indices(boxes, valid, h, w, ph_out, pw_out, lw, spatial_scale):
    """Shared ROI->bin->4-corner-table-index computation. Returns
    (corners [4 x (P, PH, PW) flat table idx], empty (P, PH, PW))."""
    hs, he, ws, we = _bin_windows(boxes, valid, h, w, ph_out, pw_out,
                                  spatial_scale)
    return _corners_from_windows(hs, he, ws, we, h, w, lw)


def _corners_from_windows2(hs, he, ws, we, h, w, sh, lw):
    """Window bounds -> 2 flat exact-H/doubling-W table corner indices.

    The exact-height table answers the H extent with the level s = nh
    directly; only the W extent needs the overlapping power-of-2 pair."""
    nh = he - hs  # (P, PH)
    nw = we - ws  # (P, PW)
    empty = (nh[:, :, None] <= 0) | (nw[:, None, :] <= 0)

    s = jnp.clip(nh, 1, sh) - 1       # exact-height level (P, PH)
    kw = _floor_log2(nw)              # (P, PW)
    w1, w2 = ws, jnp.maximum(we - (1 << kw), 0)

    def flat_idx(wb):
        base = (s[:, :, None] * lw + kw[:, None, :]) * h
        return (base + hs[:, :, None]) * w + wb[:, None, :]

    return [flat_idx(w1), flat_idx(w2)], empty


@partial(jax.jit, static_argnames=("output_size", "spatial_scale", "chunk",
                                   "exact_argmax_grad", "channels_last"))
def roi_pool(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    row_scale: jnp.ndarray = None,
    *,
    spatial_scale: float,
    output_size: Tuple[int, int] = (7, 7),
    chunk: int = 0,
    exact_argmax_grad: bool = False,
    channels_last: bool = False,
) -> jnp.ndarray:
    """ROI max pool.

    Args:
        feat: (H, W, C) feature map (channels-last).
        boxes: (P, 4) XYXY in image coordinates.
        valid: (P,) bool; padded slots produce zeros.
        row_scale: optional (P,) per-ROI scale fused into the pooling
            epilogue (the WSL heads' objectness weighting,
            roi_heads_oicrplus.py:218-221) — saves a full read+write pass
            over the pooled tensor.
        chunk: 0 (default) pools all ROIs in one shot — the chunked lax.map
            variant serializes into while loops that cost ~25% of the stage-1
            step; use a chunk only if HBM is tight.
        exact_argmax_grad: route gradients to torchvision's first-scan-hit
            argmax via the int32-key path (bf16 feat, H*W <= 32768 only).
            Default False: the autodiff table path splits tied maxima evenly
            (subgradient-level difference) but is ~20x faster in backward on
            TPU — XLA element scatters serialize, row scatters stream.
        channels_last: return (P, PH, PW, C) and skip the NCHW transpose
            (consumers flatten in (h, w, c) order; converted torch FC weights
            need the matching input permutation, see engine/weights.py).
    Returns:
        (P, C, PH, PW) pooled features (d2 layout), or (P, PH, PW, C) when
        ``channels_last``.
    """
    h, w, c = feat.shape
    if exact_argmax_grad and feat.dtype == jnp.bfloat16 and h * w <= _POS_CAPACITY:
        out = _roi_pool_argmax(feat, boxes, valid, spatial_scale, output_size)
        if row_scale is not None:
            out = out * row_scale[:, None, None, None].astype(out.dtype)
        if channels_last:
            out = jnp.transpose(out, (0, 2, 3, 1))
        return out
    ph_out, pw_out = output_size
    lh = _num_levels(h // ph_out + 4)
    lw = _num_levels(w // pw_out + 4)
    t2_flat = build_max_table_flat(feat, lh, lw)  # (lh*lw*H*W, C)

    corners, empty = _bin_corner_indices(
        boxes, valid, h, w, ph_out, pw_out, lw, spatial_scale)

    def pool_chunk(args):
        idx4, empty_c, valid_c, scale_c = args
        # ONE gather for all 4 corners: backward then allocates a single
        # table-sized cotangent buffer instead of four (row-granular scatter)
        g = jnp.take(t2_flat, idx4, axis=0)          # (4, pc, PH, PW, C)
        out = jnp.max(g, axis=0)
        mask = (~empty_c) & valid_c[:, None, None]
        if scale_c is not None:
            out = out * scale_c[:, None, None, None].astype(out.dtype)
        return jnp.where(mask[..., None], out, 0.0).astype(feat.dtype)

    p = boxes.shape[0]
    idx4 = jnp.stack(corners, axis=0)                # (4, P, PH, PW)
    if chunk and p > chunk and p % chunk == 0:
        n = p // chunk
        args = (
            idx4.reshape(4, n, chunk, ph_out, pw_out).transpose(1, 0, 2, 3, 4),
            empty.reshape(n, chunk, ph_out, pw_out),
            valid.reshape(n, chunk),
            None if row_scale is None else row_scale.reshape(n, chunk),
        )
        if row_scale is None:
            out = jax.lax.map(lambda a: pool_chunk(a + (None,)), args[:3])
        else:
            out = jax.lax.map(pool_chunk, args)
        out = out.reshape(p, ph_out, pw_out, c)
    else:
        out = pool_chunk((idx4, empty, valid, row_scale))
    if channels_last:
        return out
    return jnp.transpose(out, (0, 3, 1, 2))  # (P, C, PH, PW)


def _pool_row_chunks() -> int:
    """Row-chunk count for the multi-view pool's gather/scatter, from
    SOS_POOL_ROW_CHUNKS (default 1 = unchunked). With n > 1 each view's
    corner gather (fwd) and update build + scatter (bwd) run as n sequential
    row blocks, capping the live (nc, rows, C) temporaries at 1/n of the
    unchunked ~820 MB/view — the term that makes batch-4 training OOM 16 GB
    HBM (BASELINE.md r4 B-table). The chunks are a static Python loop (no
    lax.map: its while-loop serialization cost ~25% of the step when tried
    on the per-ROI axis, see ``roi_pool``'s chunk arg); total gather/scatter
    rows are unchanged, so throughput at B=1 is within noise (measured r5)."""
    n = int(os.environ.get("SOS_POOL_ROW_CHUNKS", "1") or 1)
    return max(1, n)


def _chunk_slices(total: int, n: int):
    """Split range(total) into n contiguous (start, size) row blocks; the
    first blocks absorb the remainder so every size stays shape-static."""
    if n <= 1 or n > total:
        return [(0, total)]
    base, rem = divmod(total, n)
    out, start = [], 0
    for i in range(n):
        size = base + (1 if i < rem else 0)
        out.append((start, size))
        start += size
    return out


def _pool_num_corners() -> int:
    """Default corner-decomposition arity for the multi-view pool, from
    SOS_POOL_CORNERS. 4 (default) uses doubling-H x doubling-W tables
    (~5x~8 levels); 2 uses exact-H x doubling-W tables whose gather and
    backward-scatter row counts halve, but whose build/backward walk ~16
    exact-height levels instead of ~5 — measured end-to-end on v5e the
    bigger table build costs more than the halved gather rows save
    (r4 A/B: 2.29 img/s nc=4 vs 2.22 nc=2 full train step), so 4 is the
    default. Both are exact in the forward."""
    return 2 if os.environ.get("SOS_POOL_CORNERS", "4") == "2" else 4


def _view_geometry(shape, ph_out, pw_out, nc):
    """Static per-view table geometry: (h, w, lh, lw, rows). Single source
    for the build, the corner indexing, and the backward's buffer sizes
    (lh is the EXACT height-level count for nc=2, the doubling count for
    nc=4)."""
    h, w, _ = shape
    lw = _num_levels(w // pw_out + 4)
    lh = (h // ph_out + 4) if nc == 2 else _num_levels(h // ph_out + 4)
    return h, w, lh, lw, lh * lw * h * w


def _build_view_table(feat, ph_out, pw_out, nc):
    """One view's flat max table + its level geometry, by corner arity.
    Geometry comes from ``_view_geometry`` (single-sourced with the
    backward's scatter-buffer sizing)."""
    h, w, lh, lw, _ = _view_geometry(feat.shape, ph_out, pw_out, nc)
    if nc == 2:
        return build_max_table_hexact_flat(feat, lh, lw), lh, lw
    return build_max_table_flat(feat, lh, lw), lh, lw


def _multi_prep(feats, boxes, valid, spatial_scale, ph_out, pw_out, nc,
                build=True):
    """Shared fwd/bwd precompute, kept PER VIEW: max tables (optional — the
    backward reuses the forward's tables as residuals instead of rebuilding),
    plus per-view corner indices and validity masks. Concatenating the four
    views' tables into one buffer was measured at ~12 ms/step of pure copy
    (concatenate.393), so views stay separate and get one gather/scatter
    each."""
    v = len(feats)
    tables, idxs, masks, dims = [], [], [], []
    for i in range(v):
        h, w, lh, lw, rows = _view_geometry(feats[i].shape, ph_out, pw_out,
                                            nc)
        t = _build_view_table(feats[i], ph_out, pw_out, nc)[0] if build \
            else None
        hs, he, ws, we = _bin_windows(boxes[i], valid, h, w, ph_out, pw_out,
                                      spatial_scale)
        if nc == 2:
            corners, empty = _corners_from_windows2(hs, he, ws, we, h, w,
                                                    lh, lw)
        else:
            corners, empty = _corners_from_windows(hs, he, ws, we, h, w, lw)
        idxs.append(jnp.stack(corners, axis=0).reshape(nc, -1))  # (nc, B_i)
        masks.append(((~empty) & valid[:, None, None]).reshape(-1))
        tables.append(t)
        dims.append((h, w, lh, lw, rows))
    return tables, idxs, masks, dims


def _table_chain_bwd(t_flat, dt_flat, h, w, lh, lw, nc):
    """Backward of the flat table build (both arities) written against the
    forward-built table (no rebuild: the table is a custom-vjp residual —
    the nc=4 jax.vjp fallback used to re-run the whole lh*lw shift-max
    build inside the backward).

    Routes each block's cotangent down the height/width chains with
    eq-selects against the stored parent blocks. Height chain: exact levels
    shift by 1 (nc=2, build_max_table_hexact_flat) or doubling levels shift
    by 2^(s-1) (nc=4, build_max_table_flat); the width chain is the
    doubling chain in both. Ties route to the earlier (unshifted) operand —
    the same subgradient-level freedom the corner-winner routing already
    exercises (jnp.maximum autodiff would split ties evenly; for continuous
    activations both coincide)."""
    c = t_flat.shape[-1]
    T = t_flat.reshape(lh, lw, h, w, c)
    dT = dt_flat.reshape(lh, lw, h, w, c)
    neg = jnp.asarray(_NEG, t_flat.dtype)
    zero = jnp.asarray(0.0, dt_flat.dtype)
    drow = None
    for s in range(lh - 1, -1, -1):
        g = dT[s, lw - 1]
        for l in range(lw - 1, 0, -1):
            d = 1 << (l - 1)
            a = T[s, l - 1]
            if d >= w:  # build's _shift_max is identity past the extent
                g = dT[s, l - 1] + g
                continue
            # forward: T[s,l] = max(a, shift_w(a, d)); route g to the winner
            b = jnp.concatenate(
                [a[:, d:], jnp.full((h, d, c), neg, a.dtype)], axis=1)
            keep = a >= b
            to_b = jnp.where(keep, zero, g)
            g = dT[s, l - 1] + jnp.where(keep, g, zero)
            g = g + jnp.pad(to_b[:, : w - d], ((0, 0), (d, 0), (0, 0)))
        cur = g if drow is None else g + drow
        if s == 0:
            return cur
        dh = 1 if nc == 2 else (1 << (s - 1))
        if dh >= h:
            drow = cur
            continue
        a = T[s - 1, 0]
        b = jnp.concatenate(
            [a[dh:], jnp.full((dh, w, c), neg, a.dtype)], axis=0)
        keep = a >= b
        to_b = jnp.where(keep, zero, cur)
        drow = jnp.where(keep, cur, zero) + jnp.pad(
            to_b[: h - dh], ((dh, 0), (0, 0), (0, 0)))
    return drow  # unreachable (lh >= 1)


def _pairwise_max_winner(g: jnp.ndarray):
    """(nc, rows, C) -> (max over corners, int32 index of the FIRST corner
    attaining it). Unrolled pairwise tournament: >= comparisons keep the
    lower index on ties at every level, so the result is the first-scan-hit
    corner — identical to a lax.reduce with (av==bv)&(ai<=bi) tie-breaking,
    but with no materialized iota operand (everything fuses elementwise)."""
    nc = g.shape[0]
    assert nc in (2, 4), nc
    i32 = jnp.int32
    if nc == 2:
        keep0 = g[0] >= g[1]
        return jnp.where(keep0, g[0], g[1]), jnp.where(keep0, i32(0), i32(1))
    k01 = g[0] >= g[1]
    m01 = jnp.where(k01, g[0], g[1])
    i01 = jnp.where(k01, i32(0), i32(1))
    k23 = g[2] >= g[3]
    m23 = jnp.where(k23, g[2], g[3])
    i23 = jnp.where(k23, i32(2), i32(3))
    keep = m01 >= m23
    return jnp.where(keep, m01, m23), jnp.where(keep, i01, i23)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _roi_pool_multi(spatial_scale, output_size, nc, nchunks, feats, boxes,
                    valid, row_scale):
    out, _ = _roi_pool_multi_fwd(spatial_scale, output_size, nc, nchunks,
                                 feats, boxes, valid, row_scale)
    return out


def _roi_pool_multi_fwd(spatial_scale, output_size, nc, nchunks, feats,
                        boxes, valid, row_scale):
    ph_out, pw_out = output_size
    v, p = boxes.shape[0], boxes.shape[1]
    c = feats[0].shape[-1]
    tables, idxs, masks, _ = _multi_prep(feats, boxes, valid, spatial_scale,
                                         ph_out, pw_out, nc)
    # NOTE (measured dead end): bit-packing bf16 channel pairs as f32 to
    # halve the gather's lane-tile traffic is exact (bitcast round-trip) but
    # measured 143 ms vs 71 ms fwd at production shapes — the pre/post
    # bitcast relayouts cost more than the tile halving saves.
    if row_scale is not None:
        scale = jnp.broadcast_to(
            row_scale.astype(feats[0].dtype)[:, None],
            (p, ph_out * pw_out)).reshape(-1)
    outs, wins = [], []
    for i in range(v):
        out_cs, win_cs = [], []
        # row-chunked gather (SOS_POOL_ROW_CHUNKS): caps the live
        # (nc, rows, C) gather output at 1/nchunks of a view — the term that
        # OOMs batch-4 training when unchunked (see _pool_row_chunks)
        for s0, sz in _chunk_slices(idxs[i].shape[1], nchunks):
            g = jnp.take(tables[i], idxs[i][:, s0:s0 + sz], axis=0)
            # max + first-winning-corner in one pass over g (separate
            # jnp.max + jnp.argmax streamed the gather output through HBM
            # twice, ~31 ms/step). Two equivalent formulations, A/B'd on
            # chip r5 at B=1 scan=32:
            #  - variadic lax.reduce with a broadcasted_iota index operand:
            #    3.125 img/s end-to-end, but the iota materializes as
            #    (nc, rows, C) s32 HLO temps — 392 MB per row chunk, the
            #    allocations that OOM batch-4 training (19.3G/15.75G even
            #    with row-chunked gathers);
            #  - unrolled pairwise max/first-winner tournament: pure
            #    elementwise (no iota temps) but 3.059 img/s (-2.1%).
            # So: reduce on the unchunked fast path (production B=1),
            # pairwise whenever row-chunking is on — the memory-constrained
            # configuration where the iota temps are exactly what blows HBM.
            if nchunks > 1:
                out_pre, win_i = _pairwise_max_winner(g)
            else:
                iota = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)

                def _pick(a, b):
                    av, ai = a
                    bv, bi = b
                    take_a = (av > bv) | ((av == bv) & (ai <= bi))
                    return (jnp.where(take_a, av, bv),
                            jnp.where(take_a, ai, bi))

                out_pre, win_i = jax.lax.reduce(
                    (g, iota), (jnp.asarray(-jnp.inf, g.dtype),
                                jnp.int32(idxs[i].shape[0])),
                    _pick, (0,))
            # winner-corner residual: index of the FIRST corner attaining
            # the max, stored as bf16 (8-bit tensors hit Mosaic's emulated
            # int8 path); nc-x smaller than keeping g (822 MB vs 3.3 GB at
            # production shapes) — the full-g residual variant OOMs 16 GB
            # HBM alongside the DAN activations. Routing the cotangent to
            # the first tied corner (vs jnp.max's even split) is a
            # subgradient-level choice only: corners overlap, so ties are
            # overwhelmingly the SAME feature cell seen through two blocks,
            # and the table chain backward sums both routes back to that
            # one cell.
            win_cs.append(win_i.astype(feats[0].dtype))
            out = out_pre if row_scale is None \
                else out_pre * scale[s0:s0 + sz, None]
            out_cs.append(
                jnp.where(masks[i][s0:s0 + sz, None], out, 0.0)
                .astype(feats[0].dtype))
        wins.append(win_cs[0] if len(win_cs) == 1
                    else jnp.concatenate(win_cs, axis=0))
        outs.append(out_cs[0] if len(out_cs) == 1
                    else jnp.concatenate(out_cs, axis=0))
    out = jnp.concatenate(outs, axis=0).reshape(v, p, ph_out, pw_out, c)
    return out, (tuple(wins), tuple(tables), feats, boxes, valid, row_scale)


def _roi_pool_multi_bwd(spatial_scale, output_size, nc, nchunks, res, ct):
    ph_out, pw_out = output_size
    wins, tables, feats, boxes, valid, row_scale = res
    v, p = boxes.shape[0], boxes.shape[1]
    c = feats[0].shape[-1]
    dtype = feats[0].dtype
    # indices/masks only — tables come from the forward's residuals
    _, idxs, masks, dims = _multi_prep(feats, boxes, valid, spatial_scale,
                                       ph_out, pw_out, nc, build=False)
    ct_v = ct.reshape(v, -1, c).astype(dtype)      # (V, B, C)
    if row_scale is not None:
        scale = jnp.broadcast_to(
            row_scale.astype(dtype)[:, None],
            (p, ph_out * pw_out)).reshape(-1)
    dfeats = []
    for i, (h, w, lh, lw, rows) in enumerate(dims):
        ct_i = ct_v[i]
        if row_scale is not None:
            ct_i = ct_i * scale[:, None]
        ct_i = jnp.where(masks[i][:, None], ct_i, 0.0)
        # route the whole cotangent to the first tied corner (see fwd
        # comment), computed directly in the scatter's flat (nc*B, C) row
        # layout. NOTE the winner corner is PER-CHANNEL (max is
        # per-channel), so the scatter cannot be collapsed to one winner row
        # per bin — each corner row carries the channels that corner won.
        # Row-chunked like the forward (SOS_POOL_ROW_CHUNKS): the stacked
        # update tensor is the backward's 820 MB/view temp.
        dt = jnp.zeros((rows, c), dtype)
        for s0, sz in _chunk_slices(idxs[i].shape[1], nchunks):
            updates = jnp.stack(
                [jnp.where(wins[i][s0:s0 + sz] == k, ct_i[s0:s0 + sz],
                           jnp.asarray(0.0, dtype))
                 for k in range(nc)])
            dt = dt.at[idxs[i][:, s0:s0 + sz].reshape(-1)].add(
                updates.reshape(-1, c))
        if os.environ.get("SOS_POOL_BWD", "chain") == "rebuild":
            # A/B alternative: autodiff of the table build (re-runs the
            # lh*lw shift-max chain inside the backward instead of routing
            # against the stored forward tables)
            _, vjp_fn = jax.vjp(
                lambda f: _build_view_table(f, ph_out, pw_out, nc)[0],
                feats[i])
            dfeats.append(vjp_fn(dt)[0])
        else:
            dfeats.append(_table_chain_bwd(tables[i], dt, h, w, lh, lw, nc))
    return (tuple(dfeats), None, None, None)


_roi_pool_multi.defvjp(_roi_pool_multi_fwd, _roi_pool_multi_bwd)


@partial(jax.jit, static_argnames=("spatial_scale", "output_size",
                                   "channels_last", "num_corners",
                                   "row_chunks"))
def roi_pool_multi(
    feats,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    row_scale: jnp.ndarray = None,
    *,
    spatial_scale: float,
    output_size: Tuple[int, int] = (7, 7),
    channels_last: bool = True,
    num_corners: int = 0,
    row_chunks: int = 0,
):
    """ROI max pool over V synchronized views in ONE gather/scatter pair.

    The stage-1 multi-view step (4 views, reference rcnn_multi.py:179-226)
    spends >50% of its device time pooling: corner gathers, their backward
    scatter, and — under plain autodiff — ~60 ms/step of eq-select fusions
    and 3.3 GB relayout copies shuttling the (4, V, P, 7, 7, C) cotangent
    between the consumer's 6-D layout and the scatter's flat row layout.
    This variant answers each view's bins with one take over its flat max
    table and hand-writes the VJP so the backward computes its corner
    updates directly in the flat (nc*V*P*49, C) scatter layout and routes
    them down the table chain against the STORED forward tables (no
    rebuild). ``num_corners`` picks the table family: 4 (default, see
    ``_pool_num_corners``) = doubling-H x doubling-W; 2 = exact-H x
    doubling-W, which halves the gather/scatter row counts but walks ~3x
    more height levels in build/backward (measured slower end-to-end on
    v5e at stage-1 shapes — see BASELINE.md r4 A/B). Outputs are
    bit-identical either way (gradients differ only in bf16 tie routing,
    the same subgradient-level freedom both paths already have vs
    torchvision). Pass num_corners=0 to use the SOS_POOL_CORNERS env
    default.

    Args:
        feats: sequence of V (H_i, W_i, C) feature maps (channels-last);
            views may have different spatial sizes (two scales x id/flip).
        boxes: (V, P, 4) per-view XYXY proposal coordinates.
        valid: (P,) shared proposal validity.
        row_scale: optional (P,) fused epilogue scale (objectness weighting;
            no gradient — stage-1 objectness is input data, never trained).
        row_chunks: >1 splits each view's gather (fwd) and update-build +
            scatter (bwd) into that many sequential row blocks, capping the
            live (nc, rows, C) temporaries at 1/n of ~820 MB/view — required
            for per-chip batch >= 4 (see ``_pool_row_chunks``). 0 = the
            SOS_POOL_ROW_CHUNKS env default (1 = unchunked). Outputs and
            gradients are identical for any value.
    Returns:
        (V, P, PH, PW, C) pooled features, or (V, P, C, PH, PW) when
        ``channels_last=False``.
    """
    nc = num_corners or _pool_num_corners()
    assert nc in (2, 4), nc
    nchunks = row_chunks or _pool_row_chunks()
    out = _roi_pool_multi(spatial_scale, output_size, nc, nchunks,
                          tuple(feats), boxes, valid, row_scale)
    if channels_last:
        return out
    return jnp.transpose(out, (0, 1, 4, 2, 3))


# --------------------------------------------------------------------------
# argmax-key fast path (bf16): int32 key = sortable16(value) * 2^15 + rank,
# rank = (H*W - 1 - flat_pos) so the table max is the max VALUE with the
# SMALLEST position on ties — torchvision's first-scan-hit tie-break.
_POS_CAPACITY = 1 << 15


def _bf16_sortable16(feat16: jnp.ndarray) -> jnp.ndarray:
    """bf16 -> int32 in [0, 65535], monotone in the float value."""
    bits = jax.lax.bitcast_convert_type(feat16, jnp.uint16).astype(jnp.int32)
    return jnp.where(bits < 0x8000, bits + 0x8000, 0xFFFF - bits)


def _sortable16_bf16(key16: jnp.ndarray) -> jnp.ndarray:
    bits = jnp.where(key16 >= 0x8000, key16 - 0x8000, 0xFFFF - key16)
    return jax.lax.bitcast_convert_type(bits.astype(jnp.uint16), jnp.bfloat16)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _roi_pool_argmax(feat, boxes, valid, spatial_scale, output_size):
    out, _ = _roi_pool_argmax_fwd_impl(feat, boxes, valid, spatial_scale,
                                       output_size)
    return out


def _roi_pool_argmax_fwd_impl(feat, boxes, valid, spatial_scale, output_size):
    h, w, c = feat.shape
    ph_out, pw_out = output_size
    lh = _num_levels(h // ph_out + 4)
    lw = _num_levels(w // pw_out + 4)

    rank = (h * w - 1) - (jnp.arange(h * w, dtype=jnp.int32)
                          .reshape(h, w)[:, :, None])
    keys = _bf16_sortable16(feat) * _POS_CAPACITY + rank       # (H, W, C)
    # build the doubling table over integer keys (build_max_table's -inf
    # sentinel maps below any key after int cast)
    t2_flat = build_max_table_flat(keys, lh, lw)

    corners, empty = _bin_corner_indices(
        boxes, valid, h, w, ph_out, pw_out, lw, spatial_scale)
    best = jnp.take(t2_flat, corners[0], axis=0)
    for ix in corners[1:]:
        best = jnp.maximum(best, jnp.take(t2_flat, ix, axis=0))  # (P,PH,PW,C)

    mask = (~empty) & valid[:, None, None]                       # (P, PH, PW)
    vals = _sortable16_bf16(best // _POS_CAPACITY)
    vals = jnp.where(mask[..., None], vals, jnp.bfloat16(0.0))
    pos = (h * w - 1) - (best % _POS_CAPACITY)
    pos = jnp.where(mask[..., None], pos, -1)                    # (P,PH,PW,C)
    out = jnp.transpose(vals, (0, 3, 1, 2))                      # (P,C,PH,PW)
    return out, pos


def _roi_pool_argmax_fwd(feat, boxes, valid, spatial_scale, output_size):
    out, pos = _roi_pool_argmax_fwd_impl(feat, boxes, valid, spatial_scale,
                                         output_size)
    return out, (pos, feat.shape)


def _roi_pool_argmax_bwd(spatial_scale, output_size, res, g):
    pos, (h, w, c) = res
    gt = jnp.transpose(jnp.asarray(g, jnp.float32), (0, 2, 3, 1))  # (P,PH,PW,C)
    ch = jnp.arange(c, dtype=jnp.int32)
    flat = jnp.where(pos >= 0, pos * c + ch, h * w * c)            # trash row
    grad = jnp.zeros(h * w * c + 1, jnp.float32).at[flat.reshape(-1)].add(
        gt.reshape(-1))
    grad_feat = grad[:-1].reshape(h, w, c).astype(jnp.bfloat16)
    return grad_feat, None, None


_roi_pool_argmax.defvjp(_roi_pool_argmax_fwd, _roi_pool_argmax_bwd)
