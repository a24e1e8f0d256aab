#!/usr/bin/env bash
# End-to-end image captioning: synthesize captioned images -> pack ->
# teacher-forced training -> greedy decode -> COCO metrics.
set -euo pipefail

WORKDIR="${1:-captioning_example}"
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

python3 "$REPO/examples/captioning/prepare_captioning.py" "$WORKDIR"
python3 -m video_learning_tpu.data.serialize "$WORKDIR/serialize.yml"
python3 -m video_learning_tpu.run_task "$WORKDIR/train.yml"
python3 -m video_learning_tpu.run_task "$WORKDIR/val.yml"

echo "Caption metrics:"
cat "$WORKDIR"/run/coco.results.json.eval.json
echo
