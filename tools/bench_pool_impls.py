"""Benchmark the ROI-pool implementations at stage-1 production shapes (real TPU).

Times, for the 4-view multi-input configuration (2 scales x id/flip,
P=4096 proposals, C=512, 7x7 bins):
  - table:  ops.roi_pool.roi_pool_multi (XLA doubling-table gather/scatter)
  - pallas: ops.pallas.roi_pool_fused (VMEM-resident key table, one call per
    view) — the standing table-vs-pallas A/B (VERDICT r4 #4) so the
    comparison re-runs every round instead of rotting
fwd-only and fwd+bwd (vjp wrt features), using the donated chained-step
timing pattern (the only trustworthy timing through the axon tunnel — see
.claude/skills/verify/SKILL.md).

History (BASELINE.md r2-r5): a direct blocked Pallas kernel (per-ROI VMEM
windows) measured 1.85 s for 24 ROIs — unaligned dynamic sublane reads are
pathologically slow in Mosaic — and a masked-reduce rewrite 16.6 s/call at
production shapes. The shipped ``roi_pool_fused`` (vertical key table in
VMEM, per-(roi, ph) horizontal scratch tables) is correct but pays a
per-grid-step pipeline tax over its (C/128, P, 7) = 114k-step grid plus an
int32 pos output stream, and loses to the table path at production P=4096;
the XLA table formulation is at the measured row-gather/scatter descriptor
floors (~14/22 ns/row) and remains the production default ("auto").
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
from sos_wsod_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()  # env vars are too late: jax pre-imports at startup
import jax.numpy as jnp
import numpy as np


def _rand_boxes(rng, p, img_h, img_w):
    x1 = rng.uniform(0, img_w - 8, p)
    y1 = rng.uniform(0, img_h - 8, p)
    # log-uniform extents: selective-search-like mix of small and large
    ww = np.exp(rng.uniform(np.log(8), np.log(img_w), p))
    hh = np.exp(rng.uniform(np.log(8), np.log(img_h), p))
    x2 = np.minimum(x1 + ww, img_w)
    y2 = np.minimum(y1 + hh, img_h)
    return np.stack([x1, y1, x2, y2], 1).astype(np.float32)


def timed(fn, args, iters=8):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--corners", type=int, default=0, choices=(0, 2, 4),
                    help="table family: 4 doubling-H, 2 exact-H, 0 env default")
    ap.add_argument("--only", default="",
                    help="comma-separated subset: table_fwd,table_fwd+bwd")
    args = ap.parse_args()

    from sos_wsod_tpu.ops.roi_pool import roi_pool_multi
    from sos_wsod_tpu.ops.pallas.roi_pool_fused import (
        roi_pool_fused, roi_pool_fused_supported)

    rng = np.random.RandomState(0)
    p, c = args.p, 512
    shapes = [(86, 128), (86, 128), (72, 108), (72, 108)]
    feats = tuple(jnp.asarray(rng.randn(h, w, c), jnp.bfloat16)
                  for h, w in shapes)
    boxes = jnp.asarray(np.stack([
        _rand_boxes(rng, p, h * 8, w * 8) for h, w in shapes]))
    valid = jnp.ones((p,), bool)
    rs = jnp.asarray(rng.uniform(1, 2, p), jnp.float32)
    ct = jnp.asarray(rng.randn(4, p, 7, 7, c), jnp.bfloat16)

    nc = args.corners

    @jax.jit
    def table_fwd(fs):
        return roi_pool_multi(fs, boxes, valid, rs, spatial_scale=0.125,
                              num_corners=nc)

    @jax.jit
    def table_fb(fs):
        out, vjp = jax.vjp(
            lambda f: roi_pool_multi(f, boxes, valid, rs,
                                     spatial_scale=0.125, num_corners=nc), fs)
        return vjp(ct.astype(out.dtype))

    variants = [("table_fwd", table_fwd), ("table_fwd+bwd", table_fb)]

    if all(roi_pool_fused_supported(h, w, c, jnp.bfloat16) for h, w in shapes):
        @jax.jit
        def pallas_fwd(fs):
            return jnp.stack([
                roi_pool_fused(fs[i], boxes[i], valid, rs, 0.125, (7, 7))
                for i in range(4)])

        @jax.jit
        def pallas_fb(fs):
            out, vjp = jax.vjp(
                lambda f: jnp.stack([
                    roi_pool_fused(f[i], boxes[i], valid, rs, 0.125, (7, 7))
                    for i in range(4)]), fs)
            return vjp(ct.astype(out.dtype))

        variants += [("pallas_fwd", pallas_fwd), ("pallas_fwd+bwd", pallas_fb)]
    else:
        print("pallas: unsupported at these shapes, skipping", flush=True)

    only = set(filter(None, args.only.split(",")))
    for name, fn in variants:
        if only and name not in only:
            continue
        print(f"compiling {name} ...", flush=True)
        ms = timed(fn, (feats,), iters=args.iters)
        print(f"{name:18s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
