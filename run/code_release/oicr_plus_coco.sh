#!/bin/bash
# Stage 1 on COCO: OICR+ VGG16 (parity with the reference
# uwsod/run/code_release/oicr_plus_coco.sh; chips replace GPUs — the mesh is
# built from all visible TPU devices).
python3 tools/train_net_stage1.py --num-gpus 4 \
	--config-file configs/stage1/coco_oicr_plus.yaml \
	OUTPUT_DIR output/sos_release_oicr_plus_coco/
