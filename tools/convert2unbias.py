#!/usr/bin/env python
"""Duplicate a plain model into the teacher/student ensemble layout
(reference tools/convert2unbias.py:16-24 CLI contract)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sos_wsod_tpu.tools.convert_checkpoints import main_convert2unbias

if __name__ == "__main__":
    main_convert2unbias()
