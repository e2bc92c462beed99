#!/bin/bash
# Stage 3 on COCO: Unbiased-Teacher SSOD over the clean/noisy split
# (parity with unbias/run/code_release/coco_ssod.sh). The SUP_PERCENT printed
# by split_single/split_multi is pasted into DATALOADER.SUP_PERCENT.
python3 tools/train_net_unbias.py --num-gpus 8 \
  --config-file configs/stage23/coco_ssod.yaml \
  MODEL.WEIGHTS ./output/coco_baseline/model_final \
  OUTPUT_DIR output/coco_ssod/ \
  SOLVER.BASE_LR 0.01 SOLVER.IMG_PER_BATCH_LABEL 16 SOLVER.IMG_PER_BATCH_UNLABEL 16 \
  SEMISUPNET.UNSUP_LOSS_WEIGHT 2.0 DATALOADER.SUP_PERCENT 25.647603 TEST.VAL_LOSS False
