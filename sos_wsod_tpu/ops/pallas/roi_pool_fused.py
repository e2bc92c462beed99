"""Fused ROI max-pool Pallas kernel (TPU) with exact torchvision semantics.

Parity target: torchvision ``roi_pool`` as consumed by the reference WSL
pooler (uwsod/projects/WSL/wsl/modeling/poolers.py:183-185), including the
CUDA kernel's first-scan-hit argmax used by its backward.

Why a kernel: the XLA doubling-table formulation (ops/roi_pool.py) is bound
by XLA's per-row gather overhead (~20 ns/row x 802816 corner rows/view at
production shapes). The only way to amortize reads across the 7 pw-bins of a
ROI row is to keep the table resident in VMEM and answer bins from on-chip
slices — which XLA cannot express (it materializes every intermediate to
HBM), but Pallas can.

Formulation (per image view):
  1. XLA precompute: int32 keys ``sortable16(val) * 2^15 + (H*W-1 - pos)`` —
     an integer max over keys yields BOTH the max bf16 value and the
     smallest flat position among ties (= torchvision's h-then-w first-hit
     scan order). Build a VERTICAL-only doubling table Tv (lh levels) with
     cheap dense shift-maxes.
  2. Pallas kernel, grid (C-chunks, P, 7):
     - Tv chunk (lh*H, W_pad, CB) stays VMEM-resident across all (P, 7)
       inner steps (constant index_map).
     - per (roi, ph): read the 2 vertical corner rows' x-slices, combine,
       build a small horizontal doubling table in scratch (3 levels for
       narrow ROIs / full levels for wide ones), then answer each pw bin
       with 2 corner lookups; decode value + position, multiply by the
       per-ROI objectness scale (roi_heads_oicrplus.py:218-221) and write.
  3. Backward: XLA element scatter-add of the cotangent to the argmax
     positions — exact first-hit routing, unlike the table path's
     split-ties subgradient. Residual-free mode recomputes positions by
     re-running the kernel in the backward pass (no 400 MB pos residuals
     under lax.scan supersteps).

Constraints (callers fall back to ops/roi_pool.py when unmet — see
``roi_pool_fused_supported``): bf16 features, H*W <= 2^15 (position must fit
beside the 16-bit value in an int32 key), W >= 32, C % CB == 0, and the
table chunk must fit VMEM.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..roi_pool import (
    _bin_windows,
    _floor_log2,
    _num_levels,
    _shift_max,
    _bf16_sortable16,
)

_POS_CAP = 1 << 15          # flat positions must fit in 15 bits
_INT_MIN = jnp.iinfo(jnp.int32).min
_NARROW_W = 32              # x-slice width for the narrow-ROI fast path
_NARROW_LEVELS = 3          # covers bin widths nw <= 8 (ceil(32/7)+1 = 6)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def roi_pool_fused_supported(h: int, w: int, c: int, dtype,
                             cb: int = 64, vmem_budget: int = 13 << 20) -> bool:
    """Static feasibility check for the fused kernel at shape (h, w, c)."""
    if dtype != jnp.bfloat16:
        return False
    if h * w > _POS_CAP or w < _NARROW_W or c % cb != 0:
        return False
    lh = _num_levels(h // 7 + 4)
    table_bytes = lh * h * _round_up(w, 8) * cb * 4
    return table_bytes <= vmem_budget


def _build_vertical_key_table(feat: jnp.ndarray, lh: int) -> jnp.ndarray:
    """bf16 (H, W, C) -> int32 (lh*H, W, C) vertical doubling table over
    sortable keys. Row block l answers max over y..y+2^l."""
    h, w, c = feat.shape
    rank = (h * w - 1) - jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)[:, :, None]
    keys = _bf16_sortable16(feat) * _POS_CAP + rank
    rows = [keys]
    for l in range(1, lh):
        rows.append(_shift_max(rows[-1], 1 << (l - 1), axis=0))
    return jnp.concatenate(rows, axis=0)


def _pack_winfo(boxes, valid, h, w, ws_pad, ph_out, pw_out, spatial_scale):
    """Per-(roi, ph) int32 records consumed by the kernel.

    Layout (32 ints): [0]=h1 row (level-premultiplied), [1]=h2 row,
    [2]=narrow x-slice start, [3]=wide flag, [4:11]=w1 local, [11:18]=w2
    local, [18:25]=kw level, [25:32]=empty flag per pw bin.
    """
    p = boxes.shape[0]
    hs, he, ws, we = _bin_windows(boxes, valid, h, w, ph_out, pw_out,
                                  spatial_scale)
    nh = he - hs
    kh = _floor_log2(nh)
    h1 = hs
    h2 = jnp.maximum(he - (1 << kh), 0)
    h_row1 = kh * h + h1                       # (P, PH)
    h_row2 = kh * h + h2
    empty_h = nh <= 0

    nw = we - ws                               # (P, PW)
    kw = _floor_log2(nw)
    w1 = ws
    w2 = jnp.maximum(we - (1 << kw), 0)
    empty_w = nw <= 0

    ws0 = jnp.clip(ws[:, 0], 0, max(ws_pad - _NARROW_W, 0))        # (P,)
    span = we[:, pw_out - 1] - ws0
    wide = (span > _NARROW_W).astype(jnp.int32)                    # (P,)
    base = jnp.where(wide == 1, 0, ws0)                            # (P,)
    w1l = w1 - base[:, None]
    w2l = w2 - base[:, None]

    empty = (empty_h[:, :, None] | empty_w[:, None, :]
             | ~valid[:, None, None]).astype(jnp.int32)            # (P,PH,PW)

    rec = jnp.concatenate([
        h_row1[:, :, None],                                        # 0
        h_row2[:, :, None],                                        # 1
        jnp.broadcast_to(base[:, None, None], (p, ph_out, 1)),     # 2
        jnp.broadcast_to(wide[:, None, None], (p, ph_out, 1)),     # 3
        jnp.broadcast_to(w1l[:, None, :], (p, ph_out, pw_out)),    # 4:11
        jnp.broadcast_to(w2l[:, None, :], (p, ph_out, pw_out)),    # 11:18
        jnp.broadcast_to(kw[:, None, :], (p, ph_out, pw_out)),     # 18:25
        empty,                                                     # 25:32
    ], axis=2).astype(jnp.int32)
    return rec


def _decode_write(key, emp, scale, h, w, pw, out_ref, pos_ref):
    """key (1, CB) int32 -> bf16 value * scale and flat argmax position."""
    val16 = jnp.right_shift(key, 15)
    bits = jnp.where(val16 >= 0x8000, val16 - 0x8000, 0xFFFF - val16)
    val = pltpu.bitcast(bits.astype(jnp.uint16), jnp.bfloat16)
    pos = (h * w - 1) - jnp.bitwise_and(key, _POS_CAP - 1)
    live = emp == 0
    out_ref[0, 0, pw, :] = jnp.where(live, val * scale, jnp.bfloat16(0.0))[0]
    pos_ref[0, 0, pw, :] = jnp.where(live, pos, -1)[0]


def _make_kernel(h: int, w: int, ws_pad: int, lw_wide: int, pw_out: int):
    def kernel(tv_ref, winfo_ref, rs_ref, out_ref, pos_ref, hl_ref):
        h1r = winfo_ref[0, 0, 0]
        h2r = winfo_ref[0, 0, 1]
        base = winfo_ref[0, 0, 2]
        wide = winfo_ref[0, 0, 3]
        scale = rs_ref[0, 0].astype(jnp.bfloat16)

        def build(width, levels):
            v = jnp.maximum(tv_ref[h1r, pl.ds(base, width), :],
                            tv_ref[h2r, pl.ds(base, width), :])
            hl_ref[0, pl.ds(0, width), :] = v
            for l in range(1, levels):
                d = 1 << (l - 1)
                cur = hl_ref[l - 1, pl.ds(0, width), :]
                if d < width:
                    shifted = jnp.concatenate(
                        [cur[d:], jnp.full((d, cur.shape[1]), _INT_MIN,
                                           jnp.int32)], axis=0)
                    nxt = jnp.maximum(cur, shifted)
                else:
                    nxt = cur
                hl_ref[l, pl.ds(0, width), :] = nxt

        @pl.when(wide == 0)
        def _():
            build(_NARROW_W, _NARROW_LEVELS)

        @pl.when(wide != 0)
        def _():
            build(ws_pad, lw_wide)

        for pw in range(pw_out):
            k = winfo_ref[0, 0, 18 + pw]
            w1 = winfo_ref[0, 0, 4 + pw]
            w2 = winfo_ref[0, 0, 11 + pw]
            emp = winfo_ref[0, 0, 25 + pw]
            a = hl_ref[k, pl.ds(w1, 1), :]
            b = hl_ref[k, pl.ds(w2, 1), :]
            _decode_write(jnp.maximum(a, b), emp, scale, h, w, pw,
                          out_ref, pos_ref)

    return kernel


@partial(jax.jit, static_argnames=("spatial_scale", "output_size", "cb",
                                   "interpret"))
def _roi_pool_fused_fwd_impl(feat, boxes, valid, row_scale, *,
                             spatial_scale: float,
                             output_size: Tuple[int, int],
                             cb: int = 64,
                             interpret: bool = False):
    h, w, c = feat.shape
    ph_out, pw_out = output_size
    assert h * w <= _POS_CAP, f"H*W={h*w} exceeds key position capacity"
    if c % cb != 0:
        assert c <= 128, f"C={c} not divisible by chunk {cb}"
        cb = c  # small channel counts (tests): single chunk
    p = boxes.shape[0]
    lh = _num_levels(h // ph_out + 4)
    lw_wide = _num_levels(w // pw_out + 4)
    ws_pad = _round_up(w, 8)

    tv = _build_vertical_key_table(feat, lh)            # (lh*H, W, C)
    if ws_pad != w:
        tv = jnp.pad(tv, ((0, 0), (0, ws_pad - w), (0, 0)),
                     constant_values=_INT_MIN)
    winfo = _pack_winfo(boxes, valid, h, w, ws_pad, ph_out, pw_out,
                        spatial_scale)
    if row_scale is None:
        rs = jnp.ones((p, 1), jnp.float32)
    else:
        rs = row_scale.reshape(p, 1).astype(jnp.float32)

    cc = c // cb
    hl_rows = max(ws_pad, _NARROW_W)
    grid = (cc, p, ph_out)
    out, pos = pl.pallas_call(
        _make_kernel(h, w, ws_pad, lw_wide, pw_out),
        grid=grid,
        in_specs=[
            pl.BlockSpec((lh * h, ws_pad, cb), lambda cc, p, ph: (0, 0, cc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 32), lambda cc, p, ph: (p, ph, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda cc, p, ph: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, pw_out, cb), lambda cc, p, ph: (p, ph, 0, cc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pw_out, cb), lambda cc, p, ph: (p, ph, 0, cc),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, ph_out, pw_out, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((p, ph_out, pw_out, c), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((max(lw_wide, _NARROW_LEVELS), hl_rows, cb),
                       jnp.int32),
        ],
        interpret=interpret,
    )(tv, winfo, rs)
    return out, pos


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def roi_pool_fused(feat, boxes, valid, row_scale,
                   spatial_scale: float,
                   output_size: Tuple[int, int] = (7, 7),
                   interpret: bool = False):
    """Fused ROIPool: (P, PH, PW, C) channels-last pooled features.

    feat (H, W, C) bf16; boxes (P, 4) XYXY image coords; valid (P,) bool;
    row_scale optional (P,) fused multiplicative epilogue (no gradient is
    propagated to it — stage-1 objectness is input data, never trained).
    """
    out, _ = _roi_pool_fused_fwd_impl(
        feat, boxes, valid, row_scale, spatial_scale=spatial_scale,
        output_size=output_size, interpret=interpret)
    return out


def _fwd(feat, boxes, valid, row_scale, spatial_scale, output_size,
         interpret):
    out, _ = _roi_pool_fused_fwd_impl(
        feat, boxes, valid, row_scale, spatial_scale=spatial_scale,
        output_size=output_size, interpret=interpret)
    # residual-free: backward re-runs the kernel for argmax positions, so
    # lax.scan supersteps never stack 400 MB position tensors
    return out, (feat, boxes, valid, row_scale)


def _bwd(spatial_scale, output_size, interpret, res, g):
    feat, boxes, valid, row_scale = res
    h, w, c = feat.shape
    _, pos = _roi_pool_fused_fwd_impl(
        feat, boxes, valid, row_scale, spatial_scale=spatial_scale,
        output_size=output_size, interpret=interpret)
    gp = jnp.asarray(g, jnp.float32)
    if row_scale is not None:
        gp = gp * row_scale.astype(jnp.float32)[:, None, None, None]
    ch = jnp.arange(c, dtype=jnp.int32)
    flat = jnp.where(pos >= 0, pos * c + ch, h * w * c)   # trash row at end
    grad = jnp.zeros(h * w * c + 1, jnp.float32).at[flat.reshape(-1)].add(
        gp.reshape(-1))
    grad_feat = grad[:-1].reshape(h, w, c).astype(feat.dtype)
    return grad_feat, None, None, None


roi_pool_fused.defvjp(_fwd, _bwd)
