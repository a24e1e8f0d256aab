#!/usr/bin/env bash
# End-to-end REAL-media activity recognition: UCF101 frame folders ->
# pack -> train -> clip->video fused validation.  (The real-data
# counterpart of examples/activity_recognition; see prepare_real_media.py
# for media sourcing.)
set -euo pipefail

WORKDIR="${1:-real_media_example}"
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# anchors are recorded on the deterministic CPU backend; the box-level
# JAX_PLATFORMS=axon (tunnelled TPU) must not leak in.  Set VLT_PLATFORM
# to run elsewhere.
export JAX_PLATFORMS="${VLT_PLATFORM:-cpu}"

python3 "$REPO/examples/real_media/prepare_real_media.py" "$WORKDIR" "${@:2}"
python3 -m video_learning_tpu.data.serialize "$WORKDIR/serialize.yml"
python3 -m video_learning_tpu.run_task "$WORKDIR/train.yml"
python3 -m video_learning_tpu.run_task "$WORKDIR/val.yml"

echo "Accuracy file:"
cat "$WORKDIR"/run/accuracy_*
echo
