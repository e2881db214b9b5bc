#!/bin/bash
# Shard segmented TED-LIUM wavs into per-talk subdirectories.
# Counterpart of /root/reference/scripts/move_wav.sh: the SPH->wav
# segmentation (gradtts_tpu.cli.prepare ted-wavs) names files
# "<talkid>_<segment>.wav"; filesystems handle ~100k files per directory
# poorly, so group them by the numeric talk-id prefix.
#
# Usage: examples/move_wav.sh /path/to/wav_dir

set -euo pipefail
directory="${1:?usage: move_wav.sh <wav_dir>}"
cd "$directory"

for file in *.wav; do
  number=$(echo "$file" | grep -o "^[0-9]*")
  [ -n "$number" ] || continue
  mkdir -p "$number"
  mv "$file" "$number/"
done
