"""Full run_task CLI under 2 real JAX processes (multi-controller).

test_multiprocess.py drives the ENGINE across 2 gloo processes; this file
drives the CLI itself — ``run_task.main`` end to end on a shared run
folder over a serializer-packed, auto-host-sharded dataset — so the
one-writer guards actually execute with ``jax.process_count() == 2``:

* checkpoint/best-checkpoint saves (feeder), metrics JSONL (observe),
  eval_state.json (run_task._save_eval_state), accuracy files + logits
  chunks (val/run_task) must each be written exactly once,
* both processes must observe the identical global loss stream,
* a 2-process resume continues from the shared checkpoints.

The reference is single-process; this is TPU-native capability testing
(SURVEY.md §5 multi-host plan), not parity.
"""

import json
import os
import re
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys

    port, pid, cfg = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address="localhost:" + port,
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2

    sys.path.insert(0, %r)
    from video_learning_tpu import run_task
    run_task.main(cfg)
    print("WORKER_DONE", flush=True)
    jax.distributed.shutdown()
""" % REPO)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(tmp_path, cfg_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, str(worker), port, str(pid), str(cfg_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(tmp_path)) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out in outs:
        assert rc == 0, out[-4000:]
        assert "WORKER_DONE" in out, out[-4000:]
    return outs


def _losses(out):
    return [float(m) for m in
            re.findall(r"batch loss/nats : ([0-9.]+) /", out)]


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    """8 tiny jpg videos packed by the REAL serializer CLI."""
    from PIL import Image

    from tests.conftest import make_image
    from video_learning_tpu.data import serialize as ser

    tmp_path = tmp_path_factory.mktemp("mpcli")
    vids = []
    for v in range(8):
        vdir = tmp_path / ("vid%d" % v)
        vdir.mkdir()
        for i in range(6):
            Image.fromarray(make_image(80, 80, seed=v * 31 + i)).save(
                vdir / ("f_%04d.jpg" % i), quality=95)
        vids.append(vdir)
    tree = tmp_path / "videos.train"
    tree.write_text("\n".join("%s %d" % (v, i % 4)
                              for i, v in enumerate(vids)) + "\n")
    cfg = {"serialize": {
        "output_folder": None, "path_prepend_folder": None,
        "input_files": [str(tree)], "run_id": "mpcli",
        "num_threads": 2, "num_items_per_thread": 8,
        "raw_image_shape": "(80, 80, 3)", "clip_offset_or_num": 1,
        "num_frames_per_clip": 2,
        "clipframe_mode": "defs.clipframe_mode.rand_clips",
        "generation_error": "defs.generation_error.abort",
        "do_shuffle": False, "do_serialize": True, "do_validate": False,
        "validate_pcnt": 100, "frame_format": "jpg",
        "logging_level": "logging.INFO", "seed": 5}}
    p = tmp_path / "pack.yml"
    p.write_text(yaml.safe_dump(cfg))
    ser.main(["serialize", str(p)])
    return tmp_path, tree


def _cli_config(tmp_path, tree, phase="train", resume=None, epochs=2):
    run_folder = tmp_path / "run"
    data_doc = {
        "data_path": str(tree),
        "raw_image_shape": "(80, 80, 3)",
        "image_shape": "(64, 64, 3)",
        "mean_image": [100.0, 100.0, 100.0],
        "data_format": "defs.data_format.tfrecord",
        "frame_format": "jpg",
        "imgproc": ["defs.imgproc.center_crop", "defs.imgproc.sub_mean"],
        "batch_item": "defs.batch_item.default",
        "phase": "defs.phase.%s" % phase,
        "tag": "defs.dataset_tag.main"}
    cfg = {"run": {
        "resume_file": resume,
        "run_folder": str(run_folder),
        "run_id": "mpcli",
        "seed": 9,
        "mesh_shape": {"data": 4},
        "compute_dtype": "float32",
        "phase": "defs.phase.%s" % phase,
        # host_shards defaults to auto: each process reads its half of
        # the train split; the val split stays full on every host
        "data": {"mc": data_doc},
        "network": {
            "num_classes": 4,
            "pipelines": [
                {"frames": {
                    "input": "defs.dataset_tag.main",
                    "representation": "defs.representation.dcnn",
                    "frame_encoding_layer": "fc6"}},
                {"clf": {
                    "input": "frames",
                    "representation": "defs.representation.nop",
                    "classifier": "defs.classifier.lstm",
                    "lstm_params": [16, 1, "defs.fusion_method.avg"]}}]},
        "train": {
            "batch_size": 2, "epochs": epochs,
            "optimizer": "defs.optim.sgd", "base_lr": 0.02,
            "lr_mult": 2.0, "lr_decay": None,
            "clip_norm": 10, "dropout_keep_prob": 1.0,
            "eval_every_epochs": 1, "eval_keep_best": True},
        "val": {
            "batch_size": 2, "logits_save_interval": -1,
            "clip_fusion": ["defs.fusion_type.late",
                            "defs.fusion_method.avg"]},
        "logging": {
            "save_freq_per_epoch": 1, "level": "logging.INFO",
            "print_tensors": False, "tensorboard_folder": "tb",
            "email_notify": None},
    }}
    if phase == "train":
        cfg["run"]["data"]["mc_val"] = dict(data_doc,
                                            phase="defs.phase.val")
    p = tmp_path / ("cli_%s%s.yml" % (phase, "_r" if resume else ""))
    p.write_text(yaml.safe_dump(cfg))
    return p, run_folder


def test_run_task_cli_two_processes(packed):
    tmp_path, tree = packed
    cfg, run_folder = _cli_config(tmp_path, tree, "train", epochs=2)
    outs = _launch(tmp_path, cfg)

    # both processes observed the identical global loss stream: 2 epochs
    # x (4 local videos / batch_size 2) = 4 steps
    l0, l1 = _losses(outs[0][1]), _losses(outs[1][1])
    assert len(l0) == len(l1) == 4, (l0, l1)
    assert l0 == l1, (l0, l1)
    assert all(np.isfinite(l0))

    # ---- one-writer guards, all artifact kinds
    ckdir = run_folder / "checkpoints"
    ckpts = sorted(f.name for f in ckdir.glob("*.ckpt"))
    # 2 epoch saves + best.ckpt, no duplicates from the second process
    assert len([c for c in ckpts if c != "best.ckpt"]) == 2, ckpts
    assert "best.ckpt" in ckpts and (ckdir / "best.ckpt.snap").exists()
    state = json.load(open(ckdir / "eval_state.json"))
    assert set(state) == {"best_acc", "stale_evals"}
    # exactly ONE metrics stream, with one line per global step + the
    # inline-eval accuracy lines
    mfiles = list((run_folder / "tb" / "train").glob("metrics_*.jsonl"))
    assert len(mfiles) == 1, mfiles
    lines = [json.loads(l) for l in open(mfiles[0])]
    assert [l["step"] for l in lines if "loss" in l] == [1, 2, 3, 4]
    assert len([l for l in lines if "val_accuracy" in l]) == 2
    # each process kept its own run log (debuggability) without
    # corrupting the shared metrics stream
    assert not [f for f in os.listdir(run_folder)
                if f.startswith("validation_logits_")]  # inline: no chunks

    # ---- 2-process resume from the shared folder
    rcfg, _ = _cli_config(tmp_path, tree, "train", resume="latest",
                          epochs=3)
    outs2 = _launch(tmp_path, rcfg)
    r0, r1 = _losses(outs2[0][1]), _losses(outs2[1][1])
    assert len(r0) == len(r1) == 2, (r0, r1)   # epoch 3 only: 2 steps
    assert r0 == r1
    for rc, out in outs2:
        assert re.search(r"global step: 6", out), out[-2000:]
    # the resumed run wrote its own single metrics stream
    mfiles2 = list((run_folder / "tb" / "train").glob("metrics_*.jsonl"))
    assert len(mfiles2) == 2, mfiles2

    # ---- standalone 2-process validation over the SAME run folder
    vcfg, vrun = _cli_config(tmp_path, tree, "val", resume="latest")
    text = vcfg.read_text().replace(str(vrun), str(run_folder))
    vcfg.write_text(text)
    outs3 = _launch(tmp_path, vcfg)
    accs = [f for f in os.listdir(run_folder)
            if f.startswith("accuracy_")]
    assert accs, os.listdir(run_folder)
    for f in accs:
        v = float((run_folder / f).read_text())
        assert 0.0 <= v <= 1.0
    # logits chunks were persisted once (main process), readable, and
    # cover all 8 videos
    chunks = [f for f in os.listdir(run_folder)
              if f.startswith("validation_logits_")
              and f.endswith(".total")]
    assert len(chunks) == 1, chunks
    import pickle
    with open(run_folder / chunks[0], "rb") as f:
        chunk = np.asarray(pickle.load(f))
    assert chunk.shape == (8, 4), chunk.shape   # one fused row per video
