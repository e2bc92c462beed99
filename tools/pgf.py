#!/usr/bin/env python
"""PGF pseudo-ground-truth filtering (reference tools/pgf.py CLI contract)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sos_wsod_tpu.tools.pgf import main

if __name__ == "__main__":
    main()
