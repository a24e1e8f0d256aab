#!/usr/bin/env bash
# Multi-class accuracy anchor: synthesize the 8-class confusable video
# set (+2 real UCF classes when the reference media is present) -> pack
# -> train -> held-out validate.  Mirrors the reference's accuracy
# artifact (/root/reference/run_task.py:109-111) with top-1 AND top-5.
#
# Anchored on the CPU backend (bit-reproducible; BASELINE.md "multi-class
# accuracy anchor") — set VLT_PLATFORM to run elsewhere.  JAX_PLATFORMS
# from the surrounding environment is deliberately overridden: this box
# exports JAX_PLATFORMS=axon (the tunnelled TPU), which is neither
# deterministic nor stall-free.
set -euo pipefail

WORKDIR="${1:-acrec_multiclass}"
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
export JAX_PLATFORMS="${VLT_PLATFORM:-cpu}"

python3 "$REPO/examples/acrec_multiclass/prepare_acrec_multiclass.py" "$WORKDIR"
python3 -m video_learning_tpu.data.serialize "$WORKDIR/serialize.yml"
python3 -m video_learning_tpu.run_task "$WORKDIR/train.yml"
python3 -m video_learning_tpu.run_task "$WORKDIR/val.yml"

echo "Held-out accuracy (top-1, top-5):"
cat "$WORKDIR"/run/accuracy_acrec_multiclass_val_resume
echo
cat "$WORKDIR"/run/accuracy_top5_acrec_multiclass_val_resume
echo
echo "Sensitivity check (injected clip-fusion fencepost must move top-1):"
python3 "$REPO/examples/acrec_multiclass/check_sensitivity.py" "$WORKDIR"
