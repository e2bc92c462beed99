#!/bin/bash
# Stage 2: pseudo-FSOD baseline over PGF pseudo labels
# (parity with unbias/run/code_release/voc_baseline.sh).
python3 tools/train_net_unbias.py --num-gpus 8 \
  --config-file configs/stage23/voc_baseline.yaml \
  OUTPUT_DIR output/voc_baseline/ \
  SOLVER.BASE_LR 0.01 TEST.VAL_LOSS False
