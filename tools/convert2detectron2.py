#!/usr/bin/env python
"""Extract the teacher/student model from a TS-ensemble checkpoint
(reference tools/convert2detectron2.py:14-24 CLI contract)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sos_wsod_tpu.tools.convert_checkpoints import main_convert2detectron2

if __name__ == "__main__":
    main_convert2detectron2()
