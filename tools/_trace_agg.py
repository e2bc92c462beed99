"""Shared device-trace aggregation for the on-chip profiling tools.

Parses the newest chrome trace under a jax.profiler trace dir and prints
per-op device durations (the only trustworthy timing through the axon
tunnel — dispatch-side wall clocks include ~1 s/dispatch of tunnel latency).
Used by tools/profile_stage1.py and tools/bench_ssod.py (SOS_SSOD_TRACE).
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os


def aggregate_device_trace(trace_dir: str, iters: int, top: int = 50) -> None:
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace found under", trace_dir, flush=True)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm and "pjrt" not in nm.lower():
                dev_pids.add(e["pid"])
    agg = collections.Counter()
    long_of = {}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e3  # us -> ms
            agg[name] += dur
            total += dur
            ln = e.get("args", {}).get("long_name")
            if ln and name not in long_of:
                long_of[name] = ln
    print(f"\ndevice total {total/iters:.1f} ms/iter over {iters} iters; "
          f"top ops:", flush=True)
    for name, dur in agg.most_common(top):
        print(f"  {dur/iters:8.2f} ms  {100*dur/total:5.1f}%  {name[:50]:50s}"
              f"  {long_of.get(name, '')[:160]}", flush=True)
