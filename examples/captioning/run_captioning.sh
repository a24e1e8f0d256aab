#!/usr/bin/env bash
# End-to-end image captioning: synthesize captioned images -> pack ->
# teacher-forced training -> greedy decode -> COCO metrics.
#
# Second arg selects the anchor variant (BASELINE.md "caption anchor
# pair"): "sensitive" (default; the deliberately knife-edge 6-image
# anchor) or "robust" (12 images, longer training; fp-reassociation
# invariant companion — if only the sensitive anchor moved, suspect fp
# drift; if the robust one moved, it's a real regression).
set -euo pipefail

WORKDIR="${1:-captioning_example}"
VARIANT="${2:-sensitive}"
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# anchors are recorded on the deterministic CPU backend; the box-level
# JAX_PLATFORMS=axon (tunnelled TPU) must not leak in.  Set VLT_PLATFORM
# to run elsewhere.
export JAX_PLATFORMS="${VLT_PLATFORM:-cpu}"

python3 "$REPO/examples/captioning/prepare_captioning.py" "$WORKDIR" \
    --variant "$VARIANT"
python3 -m video_learning_tpu.data.serialize "$WORKDIR/serialize.yml"
python3 -m video_learning_tpu.run_task "$WORKDIR/train.yml"
python3 -m video_learning_tpu.run_task "$WORKDIR/val.yml"

echo "Caption metrics:"
cat "$WORKDIR"/run/coco.results.json.eval.json
echo
