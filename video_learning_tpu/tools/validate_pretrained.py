"""Validate a real pretrained ``bvlc_alexnet.npy`` against this framework.

The weight-import path is exercised end-to-end in tests, but only with
*synthesized* bvlc-schema files — the actual pretrained asset (fetched by
``models/get_alexnet_weights.sh``, the counterpart of the reference's
``models/alexnet/get_weights_file.sh``) cannot be downloaded in an
egress-free environment.  This tool is the documented OFFLINE closure of
that gap (docs/MIGRATION.md "Pretrained AlexNet validation"):

1. **Schema check** — the exact bvlc layer set and shapes (the grouped
   conv2/4/5 kernels carry ``C_in/2`` input channels; reference
   alexnet.py:49-51 consumes the same dict layout).
2. **Integrity pin** — the file's sha256 is printed and written to a
   ``<file>.sha256`` sidecar; ``load_bvlc_weights`` re-verifies the
   sidecar on every subsequent load, so a corrupted or swapped asset
   fails loudly instead of silently producing different features.
3. **Feature fingerprint** — a seeded fixture image is run through the
   fc6 and fc7 heads and the activations are fingerprinted (sha256 of
   the 1e-4-rounded feature vector).  The fingerprint is stored in a
   JSON manifest on first run and compared on every later run
   (trust-on-first-use): any numerics change in the conv/fc stack against
   the real weights is caught, on any machine that has the asset.

Usage:
    bash video_learning_tpu/models/get_alexnet_weights.sh /data/bvlc_alexnet.npy
    python -m video_learning_tpu.tools.validate_pretrained /data/bvlc_alexnet.npy

With the asset present, ``VLT_BVLC_NPY=/data/bvlc_alexnet.npy pytest
tests/test_models.py -k real_bvlc`` runs the same checks in CI form; the
synthesized-npy fixture path stays the always-on fallback either way.
"""

import argparse
import hashlib
import json
import os
import sys

import numpy as np

# bvlc_alexnet.npy ground-truth schema: {layer: [w, b]} with the grouped
# conv2/4/5 kernels at half input depth and the 227x227 fc6 fan-in
BVLC_SHAPES = {
    "conv1": ((11, 11, 3, 96), (96,)),
    "conv2": ((5, 5, 48, 256), (256,)),
    "conv3": ((3, 3, 256, 384), (384,)),
    "conv4": ((3, 3, 192, 384), (384,)),
    "conv5": ((3, 3, 192, 256), (256,)),
    "fc6": ((9216, 4096), (4096,)),
    "fc7": ((4096, 4096), (4096,)),
    "fc8": ((4096, 1000), (1000,)),
}


def sha256_file(path, chunk=1 << 20):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def check_schema(net_data):
    """Exact layer/shape/dtype validation; returns a list of problems."""
    problems = []
    for layer, (wshape, bshape) in BVLC_SHAPES.items():
        if layer not in net_data:
            problems.append("missing layer %s" % layer)
            continue
        pair = net_data[layer]
        if len(pair) != 2:
            problems.append("%s: expected [w, b], got %d arrays"
                            % (layer, len(pair)))
            continue
        w, b = np.asarray(pair[0]), np.asarray(pair[1])
        if tuple(w.shape) != wshape:
            problems.append("%s/w: shape %s != %s"
                            % (layer, w.shape, wshape))
        if tuple(b.shape) != bshape:
            problems.append("%s/b: shape %s != %s"
                            % (layer, b.shape, bshape))
        for nm, arr in (("w", w), ("b", b)):
            if not np.all(np.isfinite(arr)):
                problems.append("%s/%s: non-finite values" % (layer, nm))
    extra = sorted(set(net_data) - set(BVLC_SHAPES))
    if extra:
        problems.append("unexpected layers: %s" % extra)
    return problems


def fixture_image():
    """Deterministic 227x227x3 'photograph': seeded low-frequency blobs +
    noise, mean-subtracted like the training path."""
    rng = np.random.RandomState(2026)
    y, x = np.mgrid[0:227, 0:227].astype(np.float32)
    img = np.zeros((227, 227, 3), np.float32)
    for _ in range(6):
        cx, cy = rng.uniform(0, 227, 2)
        s = rng.uniform(20, 80)
        a = rng.uniform(-80, 80, 3)
        g = np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * s * s))
        img += g[:, :, None] * a[None, None, :]
    img += 127.0 + rng.normal(0, 12, img.shape)
    img = np.clip(img, 0, 255)
    return img - np.float32([104.0, 117.0, 123.0])


def feature_fingerprint(weights_file):
    """fc6/fc7 activations of the fixture image -> stats + sha256 of the
    1e-4-rounded vectors (tolerant to benign last-ulp jitter, sensitive
    to any real numerics change)."""
    import jax

    from video_learning_tpu.models import alexnet

    params = alexnet.init(jax.random.PRNGKey(0), num_classes=1000,
                          final_layer="prob", weights_file=weights_file)
    x = fixture_image()[None]
    out = {}
    for layer in ("fc6", "fc7"):
        feat = np.asarray(
            alexnet.apply(params, x, final_layer=layer,
                          compute_dtype="float32"))[0]
        out[layer] = {
            "mean": float(feat.mean()), "std": float(feat.std()),
            "min": float(feat.min()), "max": float(feat.max()),
            "nonzero_frac": float((feat != 0).mean()),
            "sha256_r4": hashlib.sha256(
                np.round(feat.astype(np.float64), 4).tobytes()).hexdigest(),
        }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("weights", help="path to bvlc_alexnet.npy")
    ap.add_argument("--manifest", default=None,
                    help="JSON manifest path (default: <weights>.manifest."
                         "json); created on first run, compared afterwards")
    ap.add_argument("--no-sidecar", action="store_true",
                    help="do not write the <weights>.sha256 sidecar")
    args = ap.parse_args(argv)

    if not os.path.exists(args.weights):
        print("weights file not found: %s" % args.weights)
        return 2
    digest = sha256_file(args.weights)
    print("sha256(%s) = %s" % (args.weights, digest))

    net_data = np.load(args.weights, encoding="latin1",
                       allow_pickle=True).item()
    problems = check_schema(net_data)
    if problems:
        print("SCHEMA FAIL:")
        for p in problems:
            print("  -", p)
        return 1
    print("schema OK: 8 layers, bvlc shapes exact")

    fp = feature_fingerprint(args.weights)
    for layer, st in fp.items():
        print("%s: mean %+.4f std %.4f nonzero %.3f fingerprint %s"
              % (layer, st["mean"], st["std"], st["nonzero_frac"],
                 st["sha256_r4"][:16]))

    manifest_path = args.manifest or args.weights + ".manifest.json"
    record = {"sha256": digest, "features": fp}
    if os.path.exists(manifest_path):
        stored = json.load(open(manifest_path))
        fails = []
        if stored.get("sha256") != digest:
            fails.append("file sha256 changed: %s -> %s"
                         % (stored.get("sha256"), digest))
        for layer in ("fc6", "fc7"):
            a = stored.get("features", {}).get(layer, {}).get("sha256_r4")
            b = fp[layer]["sha256_r4"]
            if a != b:
                fails.append("%s fingerprint changed: %s -> %s"
                             % (layer, a, b))
        if fails:
            print("MANIFEST MISMATCH (%s):" % manifest_path)
            for f in fails:
                print("  -", f)
            return 1
        print("manifest OK: matches %s" % manifest_path)
    else:
        json.dump(record, open(manifest_path, "w"), indent=1)
        print("manifest recorded: %s (trust-on-first-use; commit or "
              "archive it to pin these weights)" % manifest_path)
    if not args.no_sidecar:
        with open(args.weights + ".sha256", "w") as f:
            f.write(digest + "\n")
        print("sidecar written: %s.sha256 (load_bvlc_weights verifies it "
              "on every load)" % args.weights)
    return 0


if __name__ == "__main__":
    sys.exit(main())
