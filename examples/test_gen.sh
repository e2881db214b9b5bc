#!/bin/bash
# Synthesize the whole test split for evaluation (parity wrapper:
# /root/reference/test_gen.sh). Emits every utterance (tail batch padded).
set -euo pipefail
CKPT=${CKPT:-logs/tedlium/ckpt}
python -m gradtts_tpu.cli.generate \
    -o ../logs/generate/tedlium -c "$CKPT" --preset tedlium
