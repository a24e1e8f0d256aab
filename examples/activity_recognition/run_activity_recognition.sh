#!/usr/bin/env bash
# End-to-end activity recognition example: synthesize videos -> pack ->
# train -> validate.  (Counterpart of the reference's
# run_activity_recognition.sh:1-18, on YAML configs.)
set -euo pipefail

WORKDIR="${1:-acrec_example}"
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# anchors are recorded on the deterministic CPU backend; the box-level
# JAX_PLATFORMS=axon (tunnelled TPU) must not leak in.  Set VLT_PLATFORM
# to run elsewhere.
export JAX_PLATFORMS="${VLT_PLATFORM:-cpu}"

python3 "$REPO/examples/activity_recognition/prepare_activity_recognition.py" "$WORKDIR"
python3 -m video_learning_tpu.data.serialize "$WORKDIR/serialize.yml"
python3 -m video_learning_tpu.run_task "$WORKDIR/train.yml"
python3 -m video_learning_tpu.run_task "$WORKDIR/val.yml"

echo "Accuracy file:"
cat "$WORKDIR"/run/accuracy_*
echo
