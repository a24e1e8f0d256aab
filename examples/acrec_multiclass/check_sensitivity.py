"""Demonstrate the multi-class anchor's regression-detection power.

The original real-media anchor reads top-1 = 1.000 under a wide range of
eval bugs (2 memorizable videos).  This forensic proves the multi-class
anchor is different: it re-runs the held-out evaluation with an INJECTED
clip-fusion fencepost bug — every video's fusion window is shifted by
one clip row (the classic off-by-one against
``Validation.apply_clip_fusion``, val.py; reference val.py:158-167) —
and asserts the reported top-1 MOVES.  The clean accuracy artifacts are
restored afterwards, so the anchor files always hold the clean values.

Usage: python check_sensitivity.py <workdir>   (after run_acrec_multiclass.sh
has trained + validated; exits nonzero if the injected bug does not move
top-1, i.e. the anchor would have no detection power)
"""

import os
import sys

import numpy as np


def main():
    # anchor runs are CPU-deterministic; the box-level JAX_PLATFORMS=axon
    # (tunnelled TPU) must not leak in here
    os.environ["JAX_PLATFORMS"] = os.environ.get("VLT_PLATFORM", "cpu")
    work = os.path.abspath(sys.argv[1] if len(sys.argv) > 1
                           else "acrec_multiclass")
    run_dir = os.path.join(work, "run")
    acc_files = [f for f in os.listdir(run_dir)
                 if f.startswith("accuracy_")]
    top1_name = "accuracy_acrec_multiclass_val_resume"
    if top1_name not in acc_files:
        sys.exit("no accuracy artifacts under %s — run "
                 "run_acrec_multiclass.sh first" % run_dir)
    clean = {f: open(os.path.join(run_dir, f)).read()
             for f in acc_files}
    clean_top1 = float(clean[top1_name])
    # the bugged run must REWRITE the top-1 file — remove it up front so
    # a re-run that dies before writing cannot leave the stale clean
    # value to be read back as "bugged" (clean-vs-clean would report
    # ANCHOR INSENSITIVE misleadingly)
    os.remove(os.path.join(run_dir, top1_name))
    files_before = set(os.listdir(run_dir))

    from video_learning_tpu import run_task
    from video_learning_tpu.val import Validation
    orig = Validation.apply_clip_fusion

    def fencepost(self, clips_logits, cpv, video_labels, clip_fusion):
        # off-by-one: the cpv-row fusion window starts one clip late.
        # np.roll alone is a set-preserving permutation whenever the
        # buffer holds exactly cpv rows (the last video of every
        # buffer), leaving avg fusion unchanged there — so the wrapped
        # last row is additionally replaced with a genuinely foreign
        # row (the first row with its class axis reversed), guaranteeing
        # every video boundary sees misattributed content.
        shifted = np.roll(np.asarray(clips_logits), -1, axis=0).copy()
        shifted[-1] = shifted[-1][::-1]
        return orig(self, shifted, cpv, video_labels, clip_fusion)

    Validation.apply_clip_fusion = fencepost
    bugged_top1 = None
    try:
        run_task.main(os.path.join(work, "val.yml"))
    finally:
        Validation.apply_clip_fusion = orig
        bugged_path = os.path.join(run_dir, top1_name)
        if os.path.exists(bugged_path):
            bugged_top1 = float(open(bugged_path).read())
        for f, v in clean.items():  # anchor artifacts stay clean
            with open(os.path.join(run_dir, f), "w") as fh:
                fh.write(v)
        # the bugged run also writes validation_logits_* chunk/total
        # files; drop anything new so downstream logits tools
        # (combine_logits, compute_evaluation_stats, view_logits_info)
        # can never consume logits produced under the injected bug
        for f in sorted(set(os.listdir(run_dir)) - files_before):
            if f.startswith("validation_logits_"):
                os.remove(os.path.join(run_dir, f))
    if bugged_top1 is None:
        sys.exit("bugged re-run did not rewrite %s — cannot measure "
                 "sensitivity" % top1_name)

    print("clean top-1:    %.5f" % clean_top1)
    print("fencepost top-1: %.5f" % bugged_top1)
    if abs(clean_top1 - bugged_top1) < 0.02:
        sys.exit("ANCHOR INSENSITIVE: injected clip-fusion fencepost "
                 "did not move top-1 (%.5f -> %.5f)"
                 % (clean_top1, bugged_top1))
    print("anchor is sensitive: injected fusion bug moved top-1 by "
          "%.5f" % abs(clean_top1 - bugged_top1))


if __name__ == "__main__":
    main()
