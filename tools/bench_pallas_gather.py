"""Microbench: Pallas pipelined-DMA row gather vs XLA take (real TPU).

The stage-1 pool forward gathers ~1.6M random (1, 512) bf16 rows (1 KB each)
from a ~3 GB HBM table; XLA's gather measures ~14 ns/row (~71 GB/s). This
checks whether a Pallas kernel issuing many outstanding row DMAs per grid
step can beat that floor. Timing: a dispatch loop re-invoking the jitted
gather on the same (undonated) operands, synchronized once by a final
device_get readback — the only trustworthy sync through the axon tunnel
(block_until_ready can return early). There is no donation or
output-to-input chaining here; the gather reads the same table every
iteration by design. NOTE: the SOS_POOL_VARIADIC / SOS_POOL_SCATTER A/B env
knobs mentioned in earlier rounds' notes were removed when the variadic
single-pass reduce became the only forward; setting them is a no-op.
"""
from __future__ import annotations

import argparse
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_pallas_gather(rows_total: int, c: int, blk: int, dtype):
    """Gather kernel: grid over index blocks; per step, issue `blk` row DMAs
    HBM->VMEM output block, waiting on all before the block is shipped."""
    n_blocks = rows_total // blk

    @jax.jit
    def gather(table, idx):
        # idx available whole via scalar prefetch; sliced by program_id
        def kernel2(idx_pref, tbl_ref, out_ref, sems):
            b = pl.program_id(0)
            base = b * blk

            def issue(i, _):
                pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(idx_pref[base + i], 1), :],
                    out_ref.at[pl.ds(i, 1), :],
                    sems.at[i],
                ).start()
                return 0

            jax.lax.fori_loop(0, blk, issue, 0, unroll=8)

            def wait(i, _):
                pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(idx_pref[base + i], 1), :],
                    out_ref.at[pl.ds(i, 1), :],
                    sems.at[i],
                ).wait()
                return 0

            jax.lax.fori_loop(0, blk, wait, 0, unroll=8)

        return pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct((rows_total, c), dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_blocks,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((blk, c), lambda b, idx: (b, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((blk,))],
            ),
        )(idx, table)

    return gather


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)  # gathered rows
    ap.add_argument("--table-rows", type=int, default=2871180)
    ap.add_argument("--c", type=int, default=512)
    ap.add_argument("--blk", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(args.table_rows, args.c), jnp.bfloat16)
    idx = jnp.asarray(
        rng.randint(0, args.table_rows, args.rows), jnp.int32)

    bytes_moved = args.rows * args.c * 2

    @jax.jit
    def xla_take(t, i):
        return jnp.take(t, i, axis=0)

    def timed(fn, *fargs):
        out = fn(*fargs)
        jax.device_get(out.ravel()[0])
        t0 = time.perf_counter()
        o = None
        for _ in range(args.iters):
            o = fn(*fargs)
        jax.device_get(o.ravel()[0])
        dt = (time.perf_counter() - t0) / args.iters
        return dt * 1e3, bytes_moved / dt / 1e9

    ms, gbs = timed(xla_take, table, idx)
    print(f"xla_take      {ms:8.2f} ms  {gbs:7.1f} GB/s", flush=True)

    pg = make_pallas_gather(args.rows, args.c, args.blk, jnp.bfloat16)
    out_p = pg(table, idx)
    out_x = xla_take(table, idx)
    assert jnp.array_equal(out_p, out_x), "pallas gather mismatch"
    ms, gbs = timed(pg, table, idx)
    print(f"pallas_gather {ms:8.2f} ms  {gbs:7.1f} GB/s (blk={args.blk})",
          flush=True)


if __name__ == "__main__":
    main()
