#!/bin/bash
# Objective TTS eval (MCD / log-F0 / GPE / VDE / FFE) over a checkpoint
# sweep (parity wrapper: /root/reference/evaluate_batch.sh).
set -euo pipefail
LOG_DIR=${LOG_DIR:-logs/tedlium-spk}
VOCODER=${VOCODER:-checkpts/hifigan.pt}
for n in 1 25 50 100 150 200 250 300; do
    ckpt="$LOG_DIR/ckpt/step_$n"
    [ -e "$ckpt" ] || { echo "skip $ckpt (absent)"; continue; }
    python -m gradtts_tpu.cli.evaluate \
        --checkpoint "$ckpt" --vocoder "$VOCODER" --preset tedlium-spk \
        --out-dir "eval_e${n}"
done
