"""Microbench: the multi-view ROIPool BACKWARD's two big blocks on the chip.

The r4 device profile puts the pool backward at ~91 ms/step (4 views):
row scatter-add of the corner cotangents into the flat table (~72 ms at
~22 ns/row) plus the table chain backward (_table_chain_bwd). This bench
isolates each and A/Bs candidate reformulations:

  scatter/base      : per-view jnp.zeros((rows,c)).at[idx].add(updates) x4
  scatter/onebuf    : ONE (4*rows, c) buffer, one scatter for all views
  scatter/f32       : accumulate in f32 (probes dtype-specific scatter paths)
  scatter/sorted    : indices_are_sorted hint on per-view scatter (the bin
                      order is already quasi-spatial)
  chain/base        : _table_chain_bwd as shipped (python loops s, l)
  chain/svec        : width chain vectorized over ALL height levels at once
                      (the width routing is independent across s given dT)

Timing: dispatch loop on undonated args, one device_get sync at the end
(the only trustworthy sync through the axon tunnel).
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

from sos_wsod_tpu.ops.roi_pool import _table_chain_bwd, build_max_table_flat

H, W, C = 86, 128, 512        # scale-1 production feature map
LH, LW = 4, 5                 # _view_geometry(h=86, w=128) doubling levels
ROWS = LH * LW * H * W
P, BINS, NC = 4096, 49, 4
NUPD = P * BINS * NC          # 802,816 update rows per view
V = 4


def timed(name, fn, *args, iters=6):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:18s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def chain_svec(t_flat, dt_flat, h, w, lh, lw):
    """Width chain over all height levels at once, then the height chain.

    Identical math to _table_chain_bwd (nc=4): for each s independently,
    route dT[s, l] down the width-doubling chain to dT[s, 0]; then fold the
    height-doubling chain s -> s-1 sequentially. Vectorizing over s turns
    4x(lw-1) ~45 MB fusions into (lw-1) ~180 MB fusions."""
    c = t_flat.shape[-1]
    T = t_flat.reshape(lh, lw, h, w, c)
    dT = dt_flat.reshape(lh, lw, h, w, c)
    neg = jnp.asarray(-3.0e38, t_flat.dtype)
    zero = jnp.asarray(0.0, dt_flat.dtype)
    g = dT[:, lw - 1]
    for l in range(lw - 1, 0, -1):
        d = 1 << (l - 1)
        a = T[:, l - 1]
        if d >= w:
            g = dT[:, l - 1] + g
            continue
        b = jnp.concatenate(
            [a[:, :, d:], jnp.full((lh, h, d, c), neg, a.dtype)], axis=2)
        keep = a >= b
        to_b = jnp.where(keep, zero, g)
        g = dT[:, l - 1] + jnp.where(keep, g, zero)
        g = g + jnp.pad(to_b[:, :, : w - d], ((0, 0), (0, 0), (d, 0), (0, 0)))
    # height chain: fold level s into s-1
    drow = None
    for s in range(lh - 1, -1, -1):
        cur = g[s] if drow is None else g[s] + drow
        if s == 0:
            return cur
        dh = 1 << (s - 1)
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
    return drow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()
    rng = np.random.RandomState(0)

    feat = jnp.asarray(rng.randn(H, W, C), jnp.bfloat16)
    idx = [jnp.asarray(rng.randint(0, ROWS, NUPD), jnp.int32)
           for _ in range(V)]
    upd = [jnp.asarray(rng.randn(NUPD, C), jnp.bfloat16) for _ in range(V)]

    @jax.jit
    def scatter_base(idx, upd):
        return [jnp.zeros((ROWS, C), jnp.bfloat16).at[i].add(u)
                for i, u in zip(idx, upd)]

    @jax.jit
    def scatter_onebuf(idx, upd):
        off = [i + k * ROWS for k, i in enumerate(idx)]
        return jnp.zeros((V * ROWS, C), jnp.bfloat16).at[
            jnp.concatenate(off)].add(jnp.concatenate(upd))

    @jax.jit
    def scatter_f32(idx, upd):
        return [jnp.zeros((ROWS, C), jnp.float32).at[i].add(
            u.astype(jnp.float32)).astype(jnp.bfloat16)
            for i, u in zip(idx, upd)]

    sidx = [jnp.sort(i) for i in idx]

    @jax.jit
    def scatter_sorted(idx, upd):
        return [jnp.zeros((ROWS, C), jnp.bfloat16).at[i].add(
            u, indices_are_sorted=True) for i, u in zip(idx, upd)]

    timed("scatter/base", scatter_base, idx, upd, iters=args.iters)
    timed("scatter/onebuf", scatter_onebuf, idx, upd, iters=args.iters)
    timed("scatter/f32", scatter_f32, idx, upd, iters=args.iters)
    timed("scatter/sorted", scatter_sorted, sidx, upd, iters=args.iters)

    # chain backward: one view's table + a scattered dT
    table = jax.jit(build_max_table_flat, static_argnums=(1, 2))(feat, LH, LW)
    dt = scatter_base([idx[0]], [upd[0]])[0]

    base = jax.jit(lambda t, d: _table_chain_bwd(t, d, H, W, LH, LW, 4))
    svec = jax.jit(lambda t, d: chain_svec(t, d, H, W, LH, LW))
    r0 = base(table, dt)
    r1 = svec(table, dt)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    timed("chain/base  (x1 view)", base, table, dt, iters=args.iters)
    timed("chain/svec  (x1 view)", svec, table, dt, iters=args.iters)


if __name__ == "__main__":
    main()
