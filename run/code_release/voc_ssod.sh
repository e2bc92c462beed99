#!/bin/bash
# Stage 3: Unbiased-Teacher SSOD over the clean/noisy split
# (parity with unbias/run/code_release/voc_ssod.sh).
python3 tools/train_net_unbias.py --num-gpus 8 \
  --config-file configs/stage23/voc_ssod.yaml \
  MODEL.WEIGHTS ./output/voc_baseline/model_final \
  OUTPUT_DIR output/voc_ssod/ \
  SOLVER.BASE_LR 0.01 SOLVER.IMG_PER_BATCH_LABEL 8 SOLVER.IMG_PER_BATCH_UNLABEL 8 \
  SEMISUPNET.UNSUP_LOSS_WEIGHT 2.0 DATALOADER.SUP_PERCENT 39.92217 TEST.VAL_LOSS False
