#!/usr/bin/env python
"""Inject per-image multi-labels into pseudo-label JSONs
(reference tools/add_multi_label.py CLI contract)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sos_wsod_tpu.tools.add_multi_label import main

if __name__ == "__main__":
    main()
