"""Observability: structured step metrics + profiling hooks.

Replaces the reference's TensorBoard summary plumbing
(/root/reference/utils_.py:172-184, run_task.py:143) with a dependency-free
JSONL scalar writer (one line per step, trivially plottable) plus optional
jax.profiler trace capture around chosen steps.  If TensorBoard is wanted,
point it at the JSONL via any converter; the framework itself stays free of
TF imports on the hot path.
"""

import json
import os
import time

import jax

from video_learning_tpu.utils import info


class MetricsWriter:
    """Append-only JSONL scalar writer (per-run, per-phase)."""

    def __init__(self, folder, run_id, timestamp=None):
        os.makedirs(folder, exist_ok=True)
        # timestamped like the run logs so re-runs of the same run_id get
        # their own metrics stream instead of appending
        suffix = ("%s_%s" % (run_id, timestamp)) if timestamp else run_id
        self.path = os.path.join(folder, "metrics_%s.jsonl" % suffix)
        self._f = open(self.path, "a", buffering=1)

    def write(self, step, **scalars):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()


class StepProfiler:
    """Capture an xplane trace for steps [start, stop)
    (jax.profiler; view with tensorboard or xprof)."""

    def __init__(self, out_dir, start_step, num_steps):
        self.out_dir = out_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False
        self._done = False

    def maybe_start(self, step):
        # >= not ==: step counters can jump over start_step (scan-fused
        # multi-step chunks, resume at a later global step)
        if not self._active and not self._done and \
                step >= self.start_step and step < self.stop_step:
            os.makedirs(self.out_dir, exist_ok=True)
            jax.profiler.start_trace(self.out_dir)
            self._active = True
            info("Profiler trace started at step %d" % step)

    def maybe_stop(self, step):
        if self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            info("Profiler trace written to %s" % self.out_dir)
