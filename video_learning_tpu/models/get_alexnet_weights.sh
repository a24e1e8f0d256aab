#!/usr/bin/env bash
# Fetch the public pretrained AlexNet weights (bvlc_alexnet.npy) used by
# the DCNN weight-import path (counterpart of the reference's
# models/alexnet/get_weights_file.sh; same public source).
# Point a pipeline's `weights_file` at the downloaded file.
set -euo pipefail
URL="https://www.cs.toronto.edu/~guerzhoy/tf_alexnet/bvlc_alexnet.npy"
OUT="${1:-bvlc_alexnet.npy}"
echo "Downloading $URL -> $OUT"
curl -L -o "$OUT" "$URL" || wget -O "$OUT" "$URL"
