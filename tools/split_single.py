#!/usr/bin/env python
"""Clean/noisy dataset split by per-image loss (reference unbias/split_single.py
CLI role; device-parallel scoring replaces the multi-GPU split_multi.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sos_wsod_tpu.tools.splits import main

if __name__ == "__main__":
    main()
