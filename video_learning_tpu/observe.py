"""Observability: structured step metrics + profiling hooks.

Replaces the reference's TensorBoard summary plumbing
(/root/reference/utils_.py:172-184, run_task.py:143) with a dependency-free
JSONL scalar writer (one line per step, trivially plottable) plus optional
jax.profiler trace capture around chosen steps.  The framework stays free
of TF imports on the hot path; for a stock-TensorBoard workflow
(the reference's start-tensorboard.sh) an OPT-IN event-file sink
(``logging: tensorboard_events: true``) additionally writes standard TB
scalar events next to the JSONL.
"""

import json
import os
import time

import jax

from video_learning_tpu.utils import info, warning


class MetricsWriter:
    """Append-only JSONL scalar writer (per-run, per-phase), with an
    optional TensorBoard event-file sink (``events=True``)."""

    def __init__(self, folder, run_id, timestamp=None, events=False,
                 primary=True):
        # multi-controller runs share the run folder; the scalar stream
        # is a GLOBAL quantity (losses are all-host reductions), so only
        # the primary process writes — otherwise two hosts starting in
        # the same second would interleave duplicate lines into one file
        self._primary = bool(primary)
        if not self._primary:
            self.path = None
            self._f = None
            self._tb = None
            return
        os.makedirs(folder, exist_ok=True)
        # timestamped like the run logs so re-runs of the same run_id get
        # their own metrics stream instead of appending
        suffix = ("%s_%s" % (run_id, timestamp)) if timestamp else run_id
        self.path = os.path.join(folder, "metrics_%s.jsonl" % suffix)
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        if events:
            # TF is only imported when the sink is requested — the JSONL
            # path must never pay the import or depend on TF's presence
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(folder)
                self._tf = tf
                info("TensorBoard event sink enabled at %s" % folder)
            except ImportError:
                warning("logging.tensorboard_events requested but "
                        "tensorflow is not importable; writing JSONL only")

    def write(self, step, **scalars):
        if not self._primary:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            with self._tb.as_default(step=int(step)):
                for k, v in scalars.items():
                    if hasattr(v, "__float__"):
                        self._tf.summary.scalar(k, float(v))

    def flush(self):
        if not self._primary:
            return
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if not self._primary:
            return
        self._f.close()
        if self._tb is not None:
            self._tb.close()


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
