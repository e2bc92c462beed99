#!/bin/bash
# Stage 1: OICR+ VGG16 on VOC07 (parity with the reference
# uwsod/run/code_release/oicr_plus_voc07.sh; chips replace GPUs — the mesh is
# built from all visible TPU devices).
python3 tools/train_net_stage1.py --num-gpus 4 \
	--config-file configs/stage1/voc07_oicr_plus.yaml \
	OUTPUT_DIR output/sos_release_oicr_plus/
