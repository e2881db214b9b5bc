#!/bin/bash
# Zero-shot inference from a reference speaker wav (parity wrapper:
# /root/reference/inference.sh). ECAPA embedding is extracted with
# speechbrain when installed; otherwise pass --spk-emb embedding.npy.
set -euo pipefail
CKPT=${CKPT:-logs/tedlium/ckpt}
SPEAKER_WAV=${SPEAKER_WAV:-resources/audio/speaker.wav}
python -m gradtts_tpu.cli.inference_zero \
    -f text.txt -c "$CKPT" -s "$SPEAKER_WAV" -o out_zero
