#!/usr/bin/env python
"""Clean/noisy dataset split, multi-device CLI (reference unbias/split_multi.py
name + role). The reference shards images over GPU process ranks
(unbias/split_multi.py:45-160, rank r scores image (base + r) % N with an
all_gather per step); here the device mesh IS the rank axis — the shared
implementation in sos_wsod_tpu/tools/splits.py scores images in
device-parallel chunks through one jitted loss program, so this entry point
is the same program as split_single.py. Both names ship because the
reference's published recipes invoke either."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sos_wsod_tpu.tools.splits import main

if __name__ == "__main__":
    main()
