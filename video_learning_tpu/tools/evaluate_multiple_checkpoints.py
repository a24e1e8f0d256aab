"""Multi-checkpoint evaluation: run validation against every (filtered)
checkpoint of a training run and harvest the accuracy files.

Counterpart of /root/reference/evaluate_multiple_checkpoints.py:42-111 and
validate_checkpoints.py:37-72: lists the run's checkpoints, filters epochs
with --only/--omit, rewrites the config to val phase with the checkpoint as
resume target, invokes run_task per checkpoint (in-process by default;
``--subprocess`` matches the reference's process fan-out), and collects the
``accuracy_*`` outputs.

Usage:
  python -m video_learning_tpu.tools.evaluate_multiple_checkpoints \\
      <config.yml> [--checkpoints-dir DIR] [--only E ...] [--omit E ...] \\
      [--subprocess]
"""

import argparse
import os
import re
import subprocess
import sys

import yaml

from video_learning_tpu.utils import (ensure_console_logging, error,
                                      get_run_checkpoints, info, warning)


def checkpoint_epoch(path):
    """Parse the epoch index out of a checkpoint name
    (names look like <ts>_ep_E_btch_B_gs_G.ckpt)."""
    m = re.search(r"_ep_(\d+)_", os.path.basename(path))
    return int(m.group(1)) if m else None


def filter_checkpoints(ckpts, only=None, omit=None):
    out = []
    for c in ckpts:
        ep = checkpoint_epoch(c)
        if only and (ep is None or ep not in only):
            continue
        if omit and ep is not None and ep in omit:
            continue
        out.append(c)
    return out


def rewrite_config(config_path, checkpoint, out_path):
    """Val-phase copy of the config resuming ``checkpoint``
    (reference :66-81)."""
    with open(config_path) as f:
        docs = yaml.safe_load(f)
    run = docs["run"]
    run["phase"] = "defs.phase.val"
    run["resume_file"] = checkpoint
    for dataobj in run.get("data", {}).values():
        if dataobj.get("phase", "").endswith("train"):
            dataobj["phase"] = "defs.phase.val"
    with open(out_path, "w") as f:
        yaml.safe_dump(docs, f)
    return out_path


def evaluate(config_path, checkpoints_dir=None, only=None, omit=None,
             use_subprocess=False):
    with open(config_path) as f:
        run_folder = yaml.safe_load(f)["run"]["run_folder"]
    if checkpoints_dir:
        ckpts = sorted(
            os.path.join(checkpoints_dir, x)
            for x in os.listdir(checkpoints_dir) if x.endswith(".ckpt"))
    else:
        ckpts = get_run_checkpoints(run_folder)
    ckpts = filter_checkpoints(ckpts, only, omit)
    if not ckpts:
        error("No checkpoints to evaluate.")
    info("Evaluating %d checkpoints" % len(ckpts))

    results = {}
    for i, ckpt in enumerate(ckpts):
        info("Checkpoint %d/%d: %s" % (i + 1, len(ckpts), ckpt))
        cfg_i = os.path.join(run_folder,
                             "eval_ckpt_%d.yml" % i)
        rewrite_config(config_path, ckpt, cfg_i)
        before = set(f for f in os.listdir(run_folder)
                     if f.startswith("accuracy_"))
        if use_subprocess:
            ret = subprocess.run([sys.executable, "-m",
                                  "video_learning_tpu.run_task", cfg_i])
            if ret.returncode != 0:
                warning("run_task failed for %s" % ckpt)
                continue
        else:
            from video_learning_tpu import run_task
            run_task.main(cfg_i)
        after = set(f for f in os.listdir(run_folder)
                    if f.startswith("accuracy_"))
        # do_test rewrites the same accuracy_<run_id> file per run, so
        # prefer newly created files and fall back to the most recently
        # modified one (never an arbitrary stale file).  The top-k
        # artifacts (accuracy_top<k>_<run_id>) ride along since round 3
        # and must not shadow the primary top-1 file
        candidates = list(new) if (new := after - before) else list(after)
        primary = [f for f in candidates
                   if not f.startswith("accuracy_top")]
        candidates = primary or candidates
        acc = None
        if candidates:
            newest = max(candidates, key=lambda f: os.path.getmtime(
                os.path.join(run_folder, f)))
            with open(os.path.join(run_folder, newest)) as fh:
                acc = float(fh.read().strip())
        results[os.path.basename(ckpt)] = acc
        info("Checkpoint %s accuracy: %s" % (os.path.basename(ckpt), acc))
    info("All checkpoint accuracies: %s" % results)
    return results


def main(argv=None):
    ensure_console_logging()
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--checkpoints-dir")
    parser.add_argument("--only", nargs="+", type=int)
    parser.add_argument("--omit", nargs="+", type=int)
    parser.add_argument("--subprocess", action="store_true")
    args = parser.parse_args(argv)
    return evaluate(args.config, args.checkpoints_dir, args.only,
                    args.omit, args.subprocess)


if __name__ == "__main__":
    main()
