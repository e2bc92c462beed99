#!/bin/bash -e
# Parity with uwsod/dev/run_instant_tests.sh: 2-iteration smoke trains of the
# quick_schedules configs on synthetic-friendly shapes.
BIN="python tools/train_net_stage1.py"
OUTPUT="instant_test_output"
for cfg in configs/quick_schedules/*instant_test.yaml; do
    echo "========================================================================"
    echo "Running $cfg ..."
    echo "========================================================================"
    $BIN --config "$cfg" OUTPUT_DIR "$OUTPUT"
    rm -rf "$OUTPUT"
done
