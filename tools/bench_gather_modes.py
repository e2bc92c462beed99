"""Measure TPU gather cost across granularities for the ROIPool table query.

Hypothesis: XLA's TPU gather runs a scalar loop per INDEX (~20 cycles), so
cost scales with index count, not bytes. If true, gathering (1, span, C)
slices per (roi, ph, h-corner) — 57K indices — instead of (1, C) rows per
(roi, ph, pw, corner) — 802K indices — is ~10x cheaper for the same data.

Timing: chained donated steps with a device_get sync (see verify skill).
"""
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


def timed(fn, *args, iters=8):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    L, H, W, C = 20, 86, 128, 512
    rows = L * H * W
    table = jnp.asarray(rng.randn(rows, C).astype(np.float32), jnp.bfloat16)
    table3 = table.reshape(L * H, W, C)

    P = 4096
    n_row_idx = 4 * P * 49          # 802816 row indices
    n_slice_idx = P * 7 * 2         # 57344 slice starts

    row_idx = jnp.asarray(rng.randint(0, rows, n_row_idx, dtype=np.int64).astype(np.int32))
    srow = rng.randint(0, L * H, n_slice_idx).astype(np.int32)
    scol32 = rng.randint(0, W - 32, n_slice_idx).astype(np.int32)

    @jax.jit
    def g_rows(t, i):
        return jnp.take(t, i, axis=0).sum(dtype=jnp.float32)

    @jax.jit
    def g_slices32(t3, r, c):
        starts = jnp.stack([r, c], axis=1)
        out = jax.lax.gather(
            t3, starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(0,),
                start_index_map=(0, 1)),
            slice_sizes=(1, 32, C),
        )
        return out.sum(dtype=jnp.float32)

    @jax.jit
    def g_slices_full(t3, r):
        out = jnp.take(t3, r, axis=0)  # (n, W, C) full-width rows
        return out.sum(dtype=jnp.float32)

    print(f"row-gather   {n_row_idx} x (1,{C}):      {timed(g_rows, table, row_idx):7.2f} ms")
    print(f"slice-gather {n_slice_idx} x (1,32,{C}):  {timed(g_slices32, table3, srow, scol32):7.2f} ms")
    print(f"slice-gather {n_slice_idx} x (1,{W},{C}): {timed(g_slices_full, table3, srow):7.2f} ms")

    # scatter-add comparison (backward analogue)
    updates = jnp.asarray(rng.randn(n_row_idx, C).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def s_rows(i, u):
        return jnp.zeros((rows, C), jnp.bfloat16).at[i].add(u).sum(dtype=jnp.float32)

    print(f"row-scatter  {n_row_idx} x (1,{C}):      {timed(s_rows, row_idx, updates):7.2f} ms")


if __name__ == "__main__":
    main()
