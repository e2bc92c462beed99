"""Profile the stage-1 train step on the real TPU and print a per-op breakdown.

Usage: python tools/profile_stage1.py [--batch N] [--iters N] [--trace-dir D]

Captures a jax.profiler trace of a few steps and aggregates device-side op
durations (the only trustworthy timing through the axon tunnel — see
.claude/skills/verify/SKILL.md).
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--trace-dir", default="/tmp/sos_profile")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    from sos_wsod_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # env vars are too late: jax pre-imports at startup
    import jax.numpy as jnp

    from sos_wsod_tpu.engine.trainer import make_stage1_train_step
    from sos_wsod_tpu.models.meta.rcnn_wsl import MultiInputRCNN
    from sos_wsod_tpu.solver.build import torch_sgd, warmup_multistep_lr
    from __graft_entry__ import _tiny_image_batch

    rng = np.random.RandomState(0)
    p = 4096
    samples = [_tiny_image_batch(rng, p=p, h1=688, w1=1024, h2=576, w2=864)
               for _ in range(args.batch)]
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *samples)

    model = MultiInputRCNN(num_classes=20, seed_cap=1024, dtype=jnp.bfloat16)
    one = jax.tree_util.tree_map(lambda x: x[0], batch)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, one, train=True
    )["params"]
    tx = torch_sgd(warmup_multistep_lr(1e-3, (35000,)), momentum=0.9)
    state = {"params": params, "opt_state": tx.init(params), "iter": jnp.zeros((), jnp.int32)}

    step = jax.jit(make_stage1_train_step(model, tx, mesh=None, donate=True))
    key = jax.random.key(2, impl="unsafe_rbg")  # hw-RNG dropout (TPU.PRNG_IMPL)

    t0 = time.perf_counter()
    state, m = step(state, batch, key)
    jax.block_until_ready(m)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s", flush=True)

    # timed run
    t0 = time.perf_counter()
    for i in range(10):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / 10
    print(f"step time: {dt*1e3:.1f} ms -> {args.batch/dt:.3f} img/s/chip", flush=True)

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for i in range(args.iters):
            state, m = step(state, batch, jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(m)

    # aggregate device events from the chrome trace
    paths = sorted(glob.glob(os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace found under", args.trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device pids (TensorFlow device naming: "/device:TPU:0" etc.)
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm and "pjrt" not in nm.lower():
                dev_pids.add(e["pid"])
    # source attribution: join op names against the compiled HLO's metadata
    # (op_name="..." source_file=... lines). Leaf fusion names like
    # "fusion.85" appear in the optimized HLO as instruction names.
    src_of = {}
    try:
        import re

        txt = step.lower(state, batch, key).compile().as_text()
        for m in re.finditer(
            r"%?([\w.\-]+)\s*=[^\n]*?metadata=\{([^}]*)\}", txt
        ):
            name, meta = m.group(1), m.group(2)
            op = re.search(r'op_name="([^"]*)"', meta)
            sf = re.search(r'source_file="([^"]*)"', meta)
            sl = re.search(r"source_line=(\d+)", meta)
            tag = ""
            if op:
                tag = op.group(1)
            if sf:
                tag += f" [{os.path.basename(sf.group(1))}:{sl.group(1) if sl else '?'}]"
            if tag:
                src_of[name] = tag
    except Exception as exc:  # lowering twice can fail on donation; best-effort
        print(f"(no HLO attribution: {exc})")

    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e3  # us -> ms
            agg[name] += dur
            total += dur
    print(f"\ndevice total {total/args.iters:.1f} ms/step over {args.iters} steps; top ops:")
    for name, dur in agg.most_common(60):
        tag = src_of.get(name, src_of.get(name.split(":")[-1], ""))
        print(f"  {dur/args.iters:8.2f} ms  {100*dur/total:5.1f}%  {name[:60]}  {tag[:140]}")
    # grouped-by-source rollup of EVERYTHING (incl. the sub-0.5ms tail)
    by_src = collections.Counter()
    for name, dur in agg.items():
        tag = src_of.get(name, src_of.get(name.split(":")[-1], ""))
        key_ = tag.split(" [")[-1].rstrip("]") if "[" in tag else (tag or name)
        by_src[key_] += dur
    print("\nrollup by source location:")
    for key_, dur in by_src.most_common(40):
        print(f"  {dur/args.iters:8.2f} ms  {100*dur/total:5.1f}%  {key_[:120]}")


if __name__ == "__main__":
    main()
