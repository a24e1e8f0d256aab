"""Batch geometry management: padding feeds to static compiled shapes.

XLA compiles one executable per input geometry; ragged final batches (and
variable clips-per-video batches) are padded up to a stable geometry with a
row-validity mask so the whole run reuses one compilation.  Shared by the
training engine and the validation loop (previously duplicated with
diverging behavior).
"""

import numpy as np

from video_learning_tpu.utils import info


class BatchGeometry:
    """Tracks per-input target row counts.  The geometry adapts upward:
    a larger batch than previously seen grows the target (one-time
    recompilation) instead of aborting — this makes resume-onto-a-ragged-
    batch and variable-cpv batch plans safe."""

    def __init__(self):
        self.target_rows = {}

    def pad_feed(self, feed):
        """Pad every array's leading dim to the target geometry.

        Returns (padded_feed, n_valid_label_rows, padding_rows).  A
        pre-existing ``label_mask`` (e.g. caption word-grid validity) is
        preserved and padded; otherwise a mask over the label rows is
        created.
        """
        out = {}
        grown = []
        for k, v in feed.items():
            if not hasattr(v, "shape") or v.ndim < 1:
                out[k] = v
                continue
            target = self.target_rows.get(k, 0)
            if v.shape[0] > target:
                if target:
                    grown.append((k, target, v.shape[0]))
                self.target_rows[k] = target = v.shape[0]
            if v.shape[0] < target:
                pad = [(0, target - v.shape[0])] + [(0, 0)] * (v.ndim - 1)
                v = np.pad(v, pad)
            out[k] = v
        if grown:
            info("Batch geometry grew (one-time recompilation): %s"
                 % ["%s %d->%d" % g for g in grown])

        n_valid = feed["labels"].shape[0] if "labels" in feed else 0
        target_labels = self.target_rows.get("labels", n_valid)
        padding = target_labels - n_valid
        if "label_mask" in feed:
            # already leading-dim padded by the per-key loop above; keep
            # the caller's validity zeros intact
            out["label_mask"] = np.asarray(out["label_mask"], np.float32)
        elif "labels" in feed:
            mask = np.zeros((target_labels,), np.float32)
            mask[:n_valid] = 1.0
            out["label_mask"] = mask
        return out, n_valid, padding
