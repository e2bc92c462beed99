#!/bin/bash
# TTA evaluation of a trained stage-2/3 model (parity with
# unbias/run/code_release/tta_test.sh):
#   1. extract teacher (default) or student weights from the TS ensemble
#   2. run multi-scale + flip TTA over cfg.DATASETS.TEST
# Usage: MODEL_PATH=... OUTPUT_PATH=... OUTPUT_DIR=... bash tta_test.sh
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH to the TS-ensemble checkpoint}
OUTPUT_PATH=${OUTPUT_PATH:?set OUTPUT_PATH for the extracted weights}
OUTPUT_DIR=${OUTPUT_DIR:-output/tta_test}

# convert model (-m teacher|student, teacher default)
python3 tools/convert2detectron2.py "${MODEL_PATH}" "${OUTPUT_PATH}" -m "${MODE:-teacher}"

# tta test
python3 tools/train_net_test_tta.py \
  --config-file configs/stage23/voc07_tta_test.yaml --eval-only \
  MODEL.WEIGHTS "${OUTPUT_PATH}" \
  OUTPUT_DIR "${OUTPUT_DIR}"
