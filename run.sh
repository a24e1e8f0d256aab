#!/usr/bin/env bash
# Convenience runner (counterpart of the reference's run.sh):
#   ./run.sh config.yml
set -euo pipefail
REPO="$(cd "$(dirname "$0")" && pwd)"
PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" \
  python3 -m video_learning_tpu.run_task "${1:?usage: run.sh config.yml}"
