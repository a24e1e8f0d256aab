"""Late logit-level ensembling of two validation runs.

Counterpart of /root/reference/combine_logits.py: loads two pickled
validation-logit matrices plus ``video label`` ground-truth files and
optional ``classname index`` map files, optionally re-orders logit columns
to a shared class-index alignment (:131-231), reconciles differing item
sets by video-id intersection (:248-290), and sweeps the convex weight
combination w*L1 + (1-w)*L2 over w in {0, 0.1, .., 1}, reporting accuracy
for each (:297-305).

Usage:
  python -m video_learning_tpu.tools.combine_logits \\
      -paths l1.pickle l2.pickle -gt gt1.txt gt2.txt \\
      [-lbl cls1.txt cls2.txt -align aligned_classes.txt] \\
      [-compromise intersect] [-limit N]
"""

import argparse
import os
import pickle

import numpy as np

from video_learning_tpu.utils import ensure_console_logging, error, info


def load_logits(path):
    with open(path, "rb") as f:
        arr = pickle.load(f)
    return np.asarray(arr)


def load_gt(path):
    """``video label`` lines -> (vid basenames, int labels)."""
    vids, labels = [], []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            vids.append(os.path.basename(parts[0]))
            labels.append(int(parts[1]))
    return vids, np.asarray(labels)


def load_class_map(path):
    """``classname index`` lines -> (name->idx, idx->name)."""
    c2i, i2c = {}, {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            name, idx = parts[0], int(parts[1])
            c2i[name] = idx
            i2c[idx] = name
    if len(c2i) != len(i2c):
        error("Non-bijective class map in %s" % path)
    return c2i, i2c


def align_to(logits, labels, i2c, align_c2i):
    """Re-index labels + re-order logit columns into the alignment map's
    class indexing (reference :164-222)."""
    labels_aligned = np.asarray([align_c2i[i2c[int(l)]] for l in labels])
    mapping = [align_c2i[i2c[l]] for l in range(logits.shape[1])]
    # invert: column j of the aligned matrix comes from the old column
    # whose class maps to j
    order = [old for _, old in sorted(zip(mapping, range(len(mapping))))]
    return logits[:, order], labels_aligned


def intersect_runs(vids, labels, logits):
    """Keep only video ids present in both runs, preserving run-1 order
    and checking label agreement (reference :250-285)."""
    index1 = {v: i for i, v in enumerate(vids[1])}
    keep0, keep1, common_labels = [], [], []
    for i0, vid in enumerate(vids[0]):
        i1 = index1.get(vid)
        if i1 is None:
            continue
        if labels[0][i0] != labels[1][i1]:
            error("Video %s has different labels in the two runs: %d vs %d"
                  % (vid, labels[0][i0], labels[1][i1]))
        keep0.append(i0)
        keep1.append(i1)
        common_labels.append(labels[0][i0])
    return ([logits[0][keep0], logits[1][keep1]],
            np.asarray(common_labels))


def _dump_alignment(path, vids, labels, logits, i2c):
    """Document vid/label/classname/argmax before+after alignment
    (reference combine_logits.py:144-151, 224-231)."""
    with open(path, "w") as f:
        for vid, label, logit in zip(vids, labels, logits):
            f.write("%s %d %s %d\n" % (vid, int(label),
                                        i2c[int(label)],
                                        int(np.argmax(logit))))


def accuracy(logits, labels):
    return float(np.mean(np.argmax(logits, 1) == np.asarray(labels)))


def weight_sweep(logits_pair, labels, step=0.1):
    """Convex-combination sweep; returns [(w1, w2, accuracy)]."""
    results = []
    n = int(round(1 / step))
    for k in range(n + 1):
        w = round(k * step, 1)
        combined = w * logits_pair[0] + (1 - w) * logits_pair[1]
        results.append((w, round(1 - w, 1), accuracy(combined, labels)))
    return results


def combine(paths, gt_paths, lbl_paths=None, align_path=None,
            compromise=None, limit=None):
    logits = [load_logits(p) for p in paths]
    if len(logits) != 2:
        error("Can only combine two runs.")
    gts = [load_gt(p) for p in gt_paths]
    vids = [g[0] for g in gts]
    labels = [g[1] for g in gts]
    if limit:
        vids = [v[:limit] for v in vids]
        labels = [l[:limit] for l in labels]
        logits = [x[:limit] for x in logits]

    if align_path:
        maps = [load_class_map(p) for p in (lbl_paths or [])]
        if len(maps) != len(logits):
            error("-align requires one -lbl class map per logits file")
        align_c2i, align_i2c = load_class_map(align_path)
        dump_dir = os.path.dirname(os.path.abspath(paths[0]))
        for i in range(len(logits)):
            _dump_alignment(os.path.join(
                dump_dir, "dset_%d_to_align_prior.txt" % i), vids[i],
                labels[i], logits[i], maps[i][1])
            logits[i], labels[i] = align_to(logits[i], labels[i],
                                            maps[i][1], align_c2i)
            _dump_alignment(os.path.join(
                dump_dir, "dset_%d_to_align_post.txt" % i), vids[i],
                labels[i], logits[i], align_i2c)

    for i in range(2):
        if len(logits[i]) != len(labels[i]):
            error("Mismatch in logits/labels #%d lengths: %d, %d"
                  % (i + 1, len(logits[i]), len(labels[i])))
        info("Logits #%d accuracy: %.5f"
             % (i + 1, accuracy(logits[i], labels[i])))

    if len(logits[0]) != len(logits[1]):
        if compromise == "intersect":
            info("Logit length mismatch; keeping only common vid ids")
            logits, final_labels = intersect_runs(vids, labels, logits)
        else:
            error("Logit length mismatch (%d vs %d) and no compromise "
                  "selected" % (len(logits[0]), len(logits[1])))
    else:
        if not np.array_equal(labels[0], labels[1]):
            error("Inconsistent labels between the two runs.")
        final_labels = labels[0]

    sweep = weight_sweep(logits, final_labels)
    info("w1\tw2\tmean acc.")
    for w1, w2, acc in sweep:
        info("%.1f\t%.1f\t%.5f" % (w1, w2, acc))
    return sweep


def main(argv=None):
    ensure_console_logging()
    parser = argparse.ArgumentParser()
    parser.add_argument("-paths", nargs="+", required=True)
    parser.add_argument("-gt", nargs="+", required=True)
    parser.add_argument("-lbl", nargs="+")
    parser.add_argument("-align")
    parser.add_argument("-compromise", choices=["intersect"])
    parser.add_argument("-limit", type=int)
    args = parser.parse_args(argv)
    return combine(args.paths, args.gt, args.lbl, args.align,
                   args.compromise, args.limit)


if __name__ == "__main__":
    main()
