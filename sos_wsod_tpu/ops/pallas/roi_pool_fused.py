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
_CB = 128                   # channel chunk: Mosaic requires lane-dim blocks
                            # divisible by 128 (or equal to the full C)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def roi_pool_fused_supported(h: int, w: int, c: int, dtype,
                             vmem_budget: int = 13 << 20) -> bool:
    """Static feasibility check for the fused kernel at shape (h, w, c).

    The 2-level key table chunk (2*H, W, 128) int32 must fit VMEM next to
    the scratch buffers, positions must fit in 15 bits beside the 16-bit
    value in an int32 key, and channel chunks must be Mosaic-tileable."""
    if dtype != jnp.bfloat16:
        return False
    if h * w > _POS_CAP or w < _NARROW_W:
        return False
    if c % _CB != 0 and c > _CB:
        return False
    table_bytes = 2 * h * w * min(c, _CB) * 4
    return table_bytes <= vmem_budget


def _build_vertical_key_table(feat: jnp.ndarray) -> jnp.ndarray:
    """bf16 (H, W, C) -> int32 (2*H, W, C): level-0 sortable keys stacked on
    the level-1 (2-row max) table. Taller windows are covered inside the
    kernel by a short loop over level-1 rows (<= ceil(nh/2) reads), which
    keeps the VMEM-resident table at 2 levels regardless of H."""
    h, w, c = feat.shape
    rank = (h * w - 1) - jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)[:, :, None]
    keys = _bf16_sortable16(feat) * _POS_CAP + rank
    return jnp.concatenate([keys, _shift_max(keys, 1, axis=0)], axis=0)


def _pack_winfo(boxes, valid, h, w, ph_out, pw_out, spatial_scale):
    """Per-(roi, ph) int32 records consumed by the kernel.

    Layout (64 ints): [0]=vertical init row into the (2H, W, C) table
    (level-0 hs for 1-high windows, level-1 he-2 otherwise), [1]=number of
    extra level-1 reads at hs+2i, [2]=hs, [3]=narrow x-slice start, [4]=wide
    flag, [5:12]=w1 local, [12:19]=w2 local, [19:26]=kw level, [26:33]=empty
    flag per pw bin, rest zero-padded (lane-dim 64 keeps the block Mosaic-
    tileable).
    """
    p = boxes.shape[0]
    hs, he, ws, we = _bin_windows(boxes, valid, h, w, ph_out, pw_out,
                                  spatial_scale)
    nh = he - hs                               # (P, PH)
    empty_h = nh <= 0
    # vertical cover of [hs, he): level-1 blocks at hs+2i (i < nh//2) plus a
    # level-1 patch at he-2; 1-high windows read level-0 at hs
    row0 = jnp.where(nh == 1, hs, h + he - 2)
    row0 = jnp.clip(row0, 0, 2 * h - 1)
    vtrip = jnp.where(nh <= 1, 0, nh // 2)
    hs_c = jnp.clip(hs, 0, h - 1)

    nw = we - ws                               # (P, PW)
    kw = _floor_log2(nw)
    w1 = ws
    w2 = jnp.maximum(we - (1 << kw), 0)
    empty_w = nw <= 0

    ws0 = jnp.clip(ws[:, 0], 0, max(w - _NARROW_W, 0))             # (P,)
    span = we[:, pw_out - 1] - ws0
    wide = (span > _NARROW_W).astype(jnp.int32)                    # (P,)
    base = jnp.where(wide == 1, 0, ws0)                            # (P,)
    w1l = jnp.clip(w1 - base[:, None], 0, w - 1)
    w2l = jnp.clip(w2 - base[:, None], 0, w - 1)

    empty = (empty_h[:, :, None] | empty_w[:, None, :]
             | ~valid[:, None, None]).astype(jnp.int32)            # (P,PH,PW)

    rec = jnp.concatenate([
        row0[:, :, None],                                          # 0
        vtrip[:, :, None],                                         # 1
        hs_c[:, :, None],                                          # 2
        jnp.broadcast_to(base[:, None, None], (p, ph_out, 1)),     # 3
        jnp.broadcast_to(wide[:, None, None], (p, ph_out, 1)),     # 4
        jnp.broadcast_to(w1l[:, None, :], (p, ph_out, pw_out)),    # 5:12
        jnp.broadcast_to(w2l[:, None, :], (p, ph_out, pw_out)),    # 12:19
        jnp.broadcast_to(kw[:, None, :], (p, ph_out, pw_out)),     # 19:26
        empty,                                                     # 26:33
        jnp.zeros((p, ph_out, 64 - 33), jnp.int32),
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


def _make_kernel(h: int, w: int, lw_wide: int, pw_out: int):
    def kernel(tv_ref, winfo_ref, rs_ref, out_ref, pos_ref, hl_ref):
        ph = pl.program_id(2)
        row0 = winfo_ref[0, ph, 0]
        vtrip = winfo_ref[0, ph, 1]
        hs = winfo_ref[0, ph, 2]
        base = winfo_ref[0, ph, 3]
        wide = winfo_ref[0, ph, 4]
        scale = rs_ref[0, 0, 0].astype(jnp.bfloat16)

        def build(width, levels):
            # vertical cover: level-1 patch at he-2 (or level-0 row for
            # 1-high windows), then level-1 blocks at hs, hs+2, ...
            def vbody(i, v):
                r = jnp.clip(h + hs + 2 * i, 0, 2 * h - 1)
                return jnp.maximum(v, tv_ref[r, pl.ds(base, width), :])

            v = jax.lax.fori_loop(
                0, vtrip, vbody, tv_ref[row0, pl.ds(base, width), :])
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
            build(w, lw_wide)

        for pw in range(pw_out):
            k = winfo_ref[0, ph, 19 + pw]
            w1 = winfo_ref[0, ph, 5 + pw]
            w2 = winfo_ref[0, ph, 12 + pw]
            emp = winfo_ref[0, ph, 26 + pw]
            a = hl_ref[k, pl.ds(w1, 1), :]
            b = hl_ref[k, pl.ds(w2, 1), :]
            _decode_write(jnp.maximum(a, b), emp, scale, h, w, pw,
                          out_ref, pos_ref)

    return kernel


@partial(jax.jit, static_argnames=("spatial_scale", "output_size",
                                   "interpret"))
def _roi_pool_fused_fwd_impl(feat, boxes, valid, row_scale, *,
                             spatial_scale: float,
                             output_size: Tuple[int, int],
                             interpret: bool = False):
    h, w, c = feat.shape
    ph_out, pw_out = output_size
    assert h * w <= _POS_CAP, f"H*W={h*w} exceeds key position capacity"
    # lane-dim blocks must be divisible by 128 or equal to the full C
    cb = _CB if c % _CB == 0 else c
    p = boxes.shape[0]
    lw_wide = _num_levels(w // pw_out + 4)

    tv = _build_vertical_key_table(feat)                # (2*H, W, C)
    winfo = _pack_winfo(boxes, valid, h, w, ph_out, pw_out, spatial_scale)
    if row_scale is None:
        rs = jnp.ones((p, 1, 128), jnp.float32)
    else:
        rs = jnp.broadcast_to(
            row_scale.astype(jnp.float32)[:, None, None], (p, 1, 128))

    cc = c // cb
    hl_rows = _round_up(max(w, _NARROW_W), 8)
    grid = (cc, p, ph_out)
    out, pos = pl.pallas_call(
        _make_kernel(h, w, lw_wide, pw_out),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * h, w, cb), lambda cc, p, ph: (0, 0, cc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ph_out, 64), lambda cc, p, ph: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda cc, p, ph: (p, 0, 0),
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
        # the table block is revisited (constant index map) but the pipeline
        # still provisions double buffers; raise the scoped-vmem cap so the
        # 2 x 11.3MB table chunk fits (v5e has headroom above the 16MB
        # default scoped limit)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
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
