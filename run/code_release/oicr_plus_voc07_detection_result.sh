#!/bin/bash
# Stage 1 -> 2 interface: dump detection-result JSONs over train/val/test
# (parity with oicr_plus_voc07_detection_result.sh).
python3 tools/train_net_stage1.py --eval-only --resume \
	--config-file configs/stage1/voc07_oicr_plus.yaml \
	OUTPUT_DIR output/sos_release_oicr_plus/ \
	DATASETS.TEST "('voc_2007_train', 'voc_2007_val', 'voc_2007_test')" \
	DATASETS.PROPOSAL_FILES_TEST "('datasets/proposals/mcg_voc_2007_train_d2.pkl', 'datasets/proposals/mcg_voc_2007_val_d2.pkl', 'datasets/proposals/mcg_voc_2007_test_d2.pkl')" \
	WSODEVAL.SAVE_DETECTION_RESULT True \
	WSODEVAL.SAVE_PATH datasets/VOC2007/detection_results/oicr_plus_{}.json
