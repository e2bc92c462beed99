#!/usr/bin/env python
"""All-but-one base dataseed (reference unbias/generate_base_split.py role:
tools/splits.py --base-only)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sos_wsod_tpu.tools.splits import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--base-only"])
