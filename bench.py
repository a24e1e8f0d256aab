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
    import jax
    from video_learning_tpu.config import Network, Settings, TrainOpts
    from video_learning_tpu.defs import defs
    from video_learning_tpu.models.pipeline import Model
    from video_learning_tpu.data.imgproc import ImageProcessor
    from video_learning_tpu.ops.preprocess import make_preprocessor
    from video_learning_tpu.train import Train

    class _StubDataset:
        def __init__(self):
            self.tag = defs.dataset_tag.main
            self.clips_per_video = 1
            self.num_frames_per_clip = fpc
            self.embedding_matrix = None
            self.vocabulary = None
            self.imgproc = [defs.imgproc.rand_crop, defs.imgproc.sub_mean,
                            defs.imgproc.rand_mirror]
            self.processor = ImageProcessor(
                self.imgproc, raw_hw + (3,), (crop, crop, 3),
                [104.0, 117.0, 123.0])
            self.device_preprocess = True

        def get_image_shape(self):
            return (crop, crop, 3)

    class _StubFeeder:
        def __init__(self):
            self._d = [_StubDataset()]

        def get_dataset_by_tag(self, tag):
            return [d for d in self._d if d.tag == tag]

        def get_num_batches(self):
            return 1000

    frames = Network()
    frames.input = [defs.dataset_tag.main]
    frames.input_shape = [None]
    frames.input_fusion = None
    frames.representation = defs.representation.dcnn
    frames.frame_encoding_layer = "fc7"
    frames.classifier = None
    frames.weights_file = None
    frames.frame_fusion = None

    clf = Network()
    clf.input = ["frames"]
    clf.input_shape = [None]
    clf.input_fusion = None
    clf.representation = defs.representation.nop
    clf.frame_encoding_layer = None
    clf.classifier = defs.classifier.lstm
    clf.lstm_params = [256, 2, defs.fusion_method.avg]
    clf.weights_file = None
    clf.frame_fusion = None

    s = Settings()
    s.num_classes = num_classes
    s.pipelines = {"frames": frames, "clf": clf}
    s.pipeline_names = ["frames", "clf"]
    s.feeder = _StubFeeder()
    s.train = TrainOpts()
    s.train.batch_size = batch_clips
    s.train.epochs = 1
    s.train.base_lr = 0.001
    s.train.lr_decay = None
    s.train.clip_norm = 10.0
    s.train.lr_mult = None
    s.phase = defs.phase.train
    s.phases = [defs.phase.train]
    s.compute_dtype = compute_dtype
    s.run_folder = None
    s.run_id = "bench"
    s.mesh_shape = {"data": 1}

    model = Model(s)
    engine = Train(s, s.feeder, model, seed=0)
    engine.place_params()
    return s, model, engine


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
    batch_clips = args.batch_clips or (1 if on_cpu else 32)
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
    params[:, 0] = rng.randint(0, raw_hw[0] - crop - 1, n_frames)
    params[:, 1] = rng.randint(0, raw_hw[1] - crop - 1, n_frames)
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
    tic = time.time()
    p, o, m = many(p, o, feed_dev, jnp.asarray(steps), rng_key)
    loss_last = float(m["loss"][-1])
    dt = time.time() - tic
    assert np.isfinite(loss_last)

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
