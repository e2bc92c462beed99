#!/bin/bash
# Stage 2 on COCO: pseudo-FSOD baseline over PGF pseudo labels
# (parity with unbias/run/code_release/coco_baseline.sh).
python3 tools/train_net_unbias.py --num-gpus 8 \
  --config-file configs/stage23/coco_baseline.yaml \
  OUTPUT_DIR ./output/coco_baseline \
  SOLVER.BASE_LR 0.01 SOLVER.IMG_PER_BATCH_LABEL 16 SOLVER.IMG_PER_BATCH_UNLABEL 16 \
  TEST.VAL_LOSS False
