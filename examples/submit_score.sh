#!/bin/bash
# SLURM array fan-out for n-best diffusion-likelihood scoring.
# Parity: /root/reference/n_best/submit_score.sh — the reference launched
# one python process per (utterance, hypothesis); here each array task
# scores a contiguous utterance shard with ONE jitted batched program per
# bucket, resumable by (i, n) key (re-running skips finished pairs).
#
#   sbatch --array=0-9 examples/submit_score.sh   # 10 shards
#
#SBATCH --output=./slurm/%j.out

set -euo pipefail

N_SHARDS=${N_SHARDS:-10}
CKPT=${CKPT:?path to acoustic checkpoint}
NBEST=${NBEST:?path to n-best pickle}
FILELIST=${FILELIST:?path to wav|text filelist}
OUT=${OUT:-scores}

python -m gradtts_tpu.cli.nbest score \
    --n-best "$NBEST" \
    --checkpoint "$CKPT" \
    --filelist "$FILELIST" \
    --out-dir "$OUT" \
    --shard "${SLURM_ARRAY_TASK_ID}/${N_SHARDS}" \
    -N 100 --n-euler 10 --batch-size 8

# After all tasks finish:
#   python -m gradtts_tpu.cli.nbest compile --directory $OUT -I <n_utts> -N 100
#   python -m gradtts_tpu.cli.nbest rescore ... / sweep ...
