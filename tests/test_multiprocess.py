"""Real two-process (multi-controller) data-parallel training on CPU.

Launches 2 JAX processes (gloo CPU collectives, localhost coordinator),
each owning a host shard of a packed dataset, and trains steps through
the full engine — executing the ``jax.make_array_from_process_local_data``
branch of Train._shard_feed (train.py) that single-process tests can
never reach.  Asserts both hosts observe identical, finite, decreasing
global losses.

The reference is single-process (SURVEY.md §2 parallelism checklist), so
this is TPU-native capability testing, not parity.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from video_learning_tpu.data import records

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import json
    import sys

    port, pid, base = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address="localhost:" + port,
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    sys.path.insert(0, %r)
    import __graft_entry__ as graft
    from video_learning_tpu.train import Train
    from video_learning_tpu.data.dataset import Dataset
    from video_learning_tpu.defs import defs

    settings, model = graft._flagship(
        num_classes=4, fpc=2, image=67, lstm=(16, 1), batch_size=4,
        compute_dtype="float32", mesh_shape={"data": 4}, num_batches=2,
        base_lr=0.05, lr_mult=None)
    # the 4-step loss-decrease assertion must not ride on dropout-mask
    # luck — this test is about multi-controller mechanics
    settings.train.dropout_keep_prob = 1.0
    engine = Train(settings, settings.feeder, model, seed=0)
    engine.place_params()

    # host-sharded feeder: this process reads only its half of the items
    d = Dataset()
    d.initialize("mp", base, None, None, (67, 67, 3), [], None,
                 defs.data_format.tfrecord, "jpg",
                 defs.batch_item.default, 4, defs.dataset_tag.main, 1)
    d.host_shards = 2
    d.host_shard_index = pid
    d.calculate_batches(2, defs.input_mode.video)
    d.rewind(next_epoch=False)

    losses = []
    for epoch in range(2):
        while d.loop():
            b = d.get_next_batch()
            feed = {"frames_main_input": np.asarray(b.visual, np.float32),
                    "labels": np.asarray(b.labels)}
            m = engine.run_step(feed)
            losses.append(m["loss"])
        d.rewind(next_epoch=True)
    print("LOSSES " + json.dumps(losses), flush=True)

    # multi-controller sharded EVAL: each process feeds its local half of
    # a global batch; the forward computes the assembled GLOBAL batch
    # (replicated out_shardings) and run_forward returns THIS host's rows
    # so the host-local accumulation (labels/padding/captions) stays
    # paired with its own logits
    from video_learning_tpu.config import ValOpts
    from video_learning_tpu.val import Validation
    settings.val = ValOpts()
    val = Validation(settings, model)
    rng = np.random.RandomState(100 + pid)   # different local halves
    vfeed = {"frames_main_input":
             rng.randn(4, 67, 67, 3).astype(np.float32),
             "labels": np.eye(4, dtype=np.int32)[np.arange(2) %% 4]}
    logits = val.run_forward(engine.params, vfeed)
    assert logits.shape == (2, 4), logits.shape

    # reference: the same local batch through a single-device forward
    # with the same (replicated) params — row attribution must be exact
    host_params = jax.tree_util.tree_map(np.asarray, engine.params)
    settings.mesh_shape = {"data": 1}
    ref_val = Validation(settings, model)
    ref = ref_val.run_forward(host_params, dict(vfeed))
    assert ref.shape == (2, 4), ref.shape
    assert np.allclose(logits, ref, atol=1e-4), (logits, ref)
    print("VAL " + json.dumps(np.asarray(logits, np.float64)
                              .round(6).tolist()), flush=True)
    jax.distributed.shutdown()
""" % REPO)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training(tmp_path):
    # pack 8 tiny videos (1 clip x 2 frames) at the model's input size
    base = str(tmp_path / "mp.train")
    rec = base + ".tfrecord"
    rng = np.random.RandomState(0)
    n_videos, fpc = 8, 2
    with records.RecordWriter(rec) as w:
        for v in range(n_videos):
            for f in range(fpc):
                w.write(records.encode_image_example(
                    rng.randint(0, 255, (67, 67, 3), np.uint8), [v % 4]))
    records.write_size_file(n_videos, [1] * n_videos, rec, "video", 1, fpc)
    with open(base, "w") as f:
        for v in range(n_videos):
            f.write("vid%d %d\n" % (v, v % 4))

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = str(_free_port())

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # device count is set programmatically
    procs = [subprocess.Popen(
        [sys.executable, str(worker), port, str(pid), base],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(tmp_path)) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    losses = []
    for rc, out in outs:
        assert rc == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("LOSSES ")]
        assert line, out[-3000:]
        losses.append(json.loads(line[-1][len("LOSSES "):]))

    # sharded eval: each host got ITS OWN rows back (verified against a
    # single-device reference inside the worker); the two hosts fed
    # different halves so their local logits must differ
    vals = []
    for rc, out in outs:
        line = [l for l in out.splitlines() if l.startswith("VAL ")]
        assert line, out[-3000:]
        vals.append(np.asarray(json.loads(line[-1][len("VAL "):])))
    assert vals[0].shape == vals[1].shape == (2, 4)
    assert not np.allclose(vals[0], vals[1], atol=1e-5)

    # each host ran 2 epochs x 2 local batches = 4 global steps
    assert len(losses[0]) == len(losses[1]) == 4
    # the loss is a global (all-host) quantity: identical on both hosts
    assert np.allclose(losses[0], losses[1], rtol=0, atol=0), losses
    assert np.all(np.isfinite(losses[0]))
    # and training actually trains on the shared separable-ish problem
    assert losses[0][-1] < losses[0][0]
