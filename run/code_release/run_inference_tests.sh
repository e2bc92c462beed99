#!/bin/bash -e
# Parity with uwsod/dev/run_inference_tests.sh: eval-only golden-accuracy runs
# (TEST.EXPECTED_RESULTS verified by verify_results).
BIN="python tools/train_net_stage1.py"
OUTPUT="inference_test_output"
for cfg in configs/quick_schedules/*inference_acc_test.yaml; do
    echo "========================================================================"
    echo "Running $cfg ..."
    echo "========================================================================"
    $BIN --config "$cfg" --eval-only OUTPUT_DIR "$OUTPUT" MODEL.WEIGHTS "$1"
    rm -rf "$OUTPUT"
done
