#!/bin/bash
# Synthesize the same sentences with a sweep of training checkpoints
# (parity wrapper: /root/reference/inference_batch.sh — e{1..300}_female).
set -euo pipefail
LOG_DIR=${LOG_DIR:-logs/tedlium-spk}
SPEAKER_ID=${SPEAKER_ID:-1}
for n in 1 25 50 100 150 200 250 300; do
    ckpt="$LOG_DIR/ckpt/step_$n"
    [ -e "$ckpt" ] || { echo "skip $ckpt (absent)"; continue; }
    python -m gradtts_tpu.cli.inference \
        -f text.txt -c "$ckpt" -s "$SPEAKER_ID" -o "e${n}_female"
done
