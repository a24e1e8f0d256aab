#!/usr/bin/env bash
# Batch spectrogram extraction driver (counterpart of the reference's
# audio/extract_spectrograms.sh): runs the python3 extractor over every
# wav under a directory. Usage: extract_spectrograms.sh <wav_dir> <out_dir>
set -euo pipefail
WAV_DIR="${1:?wav dir}"; OUT_DIR="${2:?out dir}"
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
find "$WAV_DIR" -name '*.wav' -print0 | xargs -0 \
  env PYTHONPATH="$REPO" python3 -m video_learning_tpu.audio.spectrograms "$OUT_DIR"
