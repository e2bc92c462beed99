"""Filter / downsample training metrics logs.

Parity target: uwsod/projects/WSL/tools/filter_events.py (thins tensorboard
event files for inspection). Our trainers write JSON-lines ``metrics.json``
(utils/events.py JSONWriter), so the filter operates on that: keep selected
keys and every Nth iteration, write a new metrics file.
"""
from __future__ import annotations

import argparse
import json
from typing import List, Optional, Sequence


def filter_metrics(lines: Sequence[str], keys: Optional[Sequence[str]] = None,
                   every: int = 1) -> List[dict]:
    out = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        it = rec.get("iteration", 0)
        if every > 1 and it % every != 0:
            continue
        if keys:
            kept = {k: v for k, v in rec.items()
                    if k == "iteration" or any(k.startswith(p) for p in keys)}
            if len(kept) <= 1:
                continue
            rec = kept
        out.append(rec)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="metrics.json path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--keys", nargs="*", default=None,
                    help="key prefixes to keep (default: all)")
    ap.add_argument("--every", type=int, default=1,
                    help="keep every Nth iteration")
    args = ap.parse_args(argv)
    with open(args.input) as f:
        recs = filter_metrics(f.readlines(), args.keys, args.every)
    with open(args.output, "w") as f:
        for r in recs:
            f.write(json.dumps(r, sort_keys=True) + "\n")
    print(f"kept {len(recs)} records -> {args.output}")


if __name__ == "__main__":
    main()
