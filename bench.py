"""Benchmark: preprocessed+trained clips/sec/chip, LSTM activity-recognition
workflow (BASELINE.json north star).

Workload: the reference's headline configuration — 16-frame rand_clips video
classification with an AlexNet fc7 frame encoder and a 2x256 LSTM classifier
(BASELINE.json configs[1]) — measured as full training steps: uint8
240x320 frames -> on-device crop(227)/mean-sub/mirror -> AlexNet -> LSTM ->
softmax-CE -> SGD update.  Host disk IO is excluded (batches are pre-staged
uint8, as a production input pipeline would prefetch them).

Baseline: the reference itself cannot run in this image (TF1-only,
tf.contrib); BASELINE.md records a measured CPU proxy — this exact workload
on the host CPU backend (a *generous* proxy: the reference additionally pays
python-side decode + feed_dict copies).  ``vs_baseline`` is
TPU clips/sec / CPU-proxy clips/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/s", "vs_baseline": N}

Usage: python bench.py [--cpu] [--steps N] [--batch-clips N]
"""

import argparse
import json
import sys
import time

import numpy as np

# Measured on this image's host CPU backend (python bench.py --cpu),
# recorded in BASELINE.md.  Update when re-measured.
CPU_BASELINE_CLIPS_PER_SEC = 0.236


def build(batch_clips, fpc, raw_hw, crop, num_classes, compute_dtype):
    """Flagship model + engine via the shared builder in __graft_entry__
    (one source of truth for the benchmark/dryrun model config)."""
    import __graft_entry__ as graft
    from video_learning_tpu.train import Train

    settings, model = graft._flagship(
        num_classes=num_classes, fpc=fpc, image=crop, lstm=(256, 2),
        raw_hw=raw_hw, mean_scalars=[104.0, 117.0, 123.0],
        device_preprocess=True, batch_size=batch_clips,
        compute_dtype=compute_dtype, num_batches=1000, base_lr=0.001,
        lr_mult=None, clip_norm=10.0, mesh_shape={"data": 1})
    engine = Train(settings, settings.feeder, model, seed=0)
    engine.place_params()
    return settings, model, engine


def _probe_accelerator(deadline=240):
    """Run a tiny compile+execute in a subprocess with a hard deadline.
    The tunnelled TPU in this environment sometimes hangs inside RPCs
    (uninterruptible by signals); probing out-of-process is the only safe
    health check before committing the benchmark to the device."""
    import subprocess
    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((256, 256));"
            "print(float((x @ x).sum()))")
    try:
        ret = subprocess.run([sys.executable, "-c", code],
                             timeout=deadline, capture_output=True)
        return ret.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="measure the CPU-proxy baseline")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch-clips", type=int, default=None)
    ap.add_argument("--fpc", type=int, default=16)
    args = ap.parse_args()

    force_cpu = args.cpu
    if not force_cpu and not _probe_accelerator():
        sys.stderr.write("Accelerator unresponsive; benchmarking on CPU\n")
        force_cpu = True
    import jax
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    from video_learning_tpu.parallel.mesh import init_platform
    init_platform()

    on_cpu = jax.devices()[0].platform == "cpu"
    # 128 clips/batch measured fastest on one v5e chip (807 c/s vs
    # 772 @ 32 and 781 @ 256 — MXU utilization saturates near 128)
    batch_clips = args.batch_clips or (1 if on_cpu else 128)
    steps = args.steps or (2 if on_cpu else 20)
    fpc = args.fpc
    num_classes = 101  # UCF-style
    raw_hw, crop = (240, 320), 227
    compute_dtype = "float32" if on_cpu else "bfloat16"

    settings, model, engine = build(batch_clips, fpc, raw_hw, crop,
                                    num_classes, compute_dtype)

    n_frames = batch_clips * fpc
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (n_frames,) + raw_hw + (3,), np.uint8)
    params = np.zeros((n_frames, 3), np.int32)
    # full offset range [0, raw-crop] inclusive, matching the sampler's
    # crop grid (data/imgproc.py compute_crop)
    params[:, 0] = rng.randint(0, raw_hw[0] - crop + 1, n_frames)
    params[:, 1] = rng.randint(0, raw_hw[1] - crop + 1, n_frames)
    params[:, 2] = rng.randint(0, 2, n_frames)
    labels = np.eye(num_classes, dtype=np.int32)[
        rng.randint(0, num_classes, batch_clips)]
    feed = {"frames_main_input": raw,
            "frames_main_input/proc_params": params,
            "labels": labels}

    # Fuse the step loop into one compiled device scan: host-free
    # training, so dispatch/tunnel latency doesn't pollute the measure.
    import jax.numpy as jnp
    feed = engine._pad_feed(feed)
    feed_dev = engine._shard_feed(feed)
    many = engine.compile_scan_steps(steps)
    rng_key = jax.random.PRNGKey(0)
    # warm up twice: the first call compiles; a second guards against a
    # one-time recompile if output shardings differ from the initial
    # placement
    p, o, m = many(engine.params, engine.opt_state, feed_dev,
                   jnp.asarray(0), rng_key)
    jax.block_until_ready(m["loss"])
    p, o, m = many(p, o, feed_dev, jnp.asarray(0), rng_key)
    jax.block_until_ready(m["loss"])
    # median over repeated timed scans: the tunnelled TPU occasionally
    # stalls mid-dispatch (one round-1 driver run measured 3.4x slower
    # than steady state), and a single timing sample cannot tell a real
    # regression from such a transient
    reps = 1 if on_cpu else 5
    times = []
    for r in range(reps):
        tic = time.time()
        p, o, m = many(p, o, feed_dev, jnp.asarray((r + 1) * steps),
                       rng_key)
        loss_last = float(m["loss"][-1])  # forces full sync (tunnel-safe)
        times.append(time.time() - tic)
        assert np.isfinite(loss_last)
    dt = float(np.median(times))
    if reps > 1:
        sys.stderr.write(
            "timing samples (s for %d steps): %s -> median %.3f\n"
            % (steps, ["%.3f" % t for t in times], dt))

    clips_per_sec = batch_clips * steps / dt
    result = {
        "metric": "train_clips_per_sec_per_chip_lstm_acrec_fpc%d" % fpc,
        "value": round(clips_per_sec, 3),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / CPU_BASELINE_CLIPS_PER_SEC, 2),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
