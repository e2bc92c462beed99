#!/bin/bash
# COCO stage 1 -> 2 interface: dump detection-result JSONs over the training
# splits (parity with oicr_plus_coco_detection_result.sh).
python3 tools/train_net_stage1.py --num-gpus 4 --resume --eval-only \
	--config-file configs/stage1/detection_result_test_coco.yaml \
	OUTPUT_DIR output/sos_release_oicr_plus_coco/
