#!/usr/bin/env bash
# End-to-end serving example: synthesize videos -> pack -> train ->
# AOT-export a bucketed .vlx artifact -> serve it over HTTP -> query it
# (single-item request routed to the small bucket) -> scrape /metrics ->
# drain with SIGTERM.  The deployment chain the reference never had.
set -euo pipefail

WORKDIR="${1:-serving_example}"
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

python3 "$REPO/examples/activity_recognition/prepare_activity_recognition.py" "$WORKDIR"
python3 -m video_learning_tpu.data.serialize "$WORKDIR/serialize.yml"
python3 -m video_learning_tpu.run_task "$WORKDIR/train.yml"

python3 -m video_learning_tpu.tools.export_serving "$WORKDIR/train.yml" \
    --out "$WORKDIR/model.vlx" --batch-items 1,4 --checkpoint latest \
    --selftest

python3 "$REPO/examples/serving/query_server.py" "$WORKDIR/model.vlx"
