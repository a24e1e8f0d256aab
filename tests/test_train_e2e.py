"""End-to-end training/validation through the run_task CLI driver on a
packed tiny video dataset: loss decreases, checkpoints + snap sidecars are
written, resume restores position, validation writes an accuracy file."""

import json
import os

import numpy as np
import pytest
import yaml

from video_learning_tpu.data import serialize as ser


def _pack(tmp_path, tree, fpc=4, cpv=2):
    cfg = {"serialize": {
        "output_folder": None, "path_prepend_folder": None,
        "input_files": [str(tree)], "run_id": "packrun",
        "num_threads": 2, "num_items_per_thread": 8,
        "raw_image_shape": "(112, 112, 3)", "clip_offset_or_num": cpv,
        "num_frames_per_clip": fpc,
        "clipframe_mode": "defs.clipframe_mode.rand_clips",
        "generation_error": "defs.generation_error.compromise",
        "do_shuffle": False, "do_serialize": True, "do_validate": False,
        "validate_pcnt": 100, "frame_format": "jpg",
        "logging_level": "logging.INFO", "seed": 11}}
    p = tmp_path / "pack.yml"
    p.write_text(yaml.safe_dump(cfg))
    ser.main(["serialize", str(p)])


def _run_config(tmp_path, tree, phase="train", resume=None,
                batch_item="default", epochs=2):
    run_folder = tmp_path / "run"
    cfg = {"run": {
        "resume_file": resume,
        "run_folder": str(run_folder),
        "run_id": "e2e",
        "seed": 3,
        "mesh_shape": {"data": 1},
        "compute_dtype": "float32",
        "phase": "defs.phase.%s" % phase,
        "data": {
            "tinyvid": {
                "data_path": str(tree),
                "raw_image_shape": "(112, 112, 3)",
                "image_shape": "(96, 96, 3)",
                "mean_image": [99.2, 105.3, 109.5],
                "data_format": "defs.data_format.tfrecord",
                "frame_format": "jpg",
                "imgproc": ["defs.imgproc.center_crop",
                            "defs.imgproc.sub_mean"],
                "batch_item": "defs.batch_item.%s" % batch_item,
                "phase": "defs.phase.%s" % phase,
                "tag": "defs.dataset_tag.main"}},
        "network": {
            "num_classes": 3,
            "pipelines": [
                {"frames": {
                    "input": "defs.dataset_tag.main",
                    "representation": "defs.representation.dcnn",
                    "frame_encoding_layer": "fc6"}},
                {"clf": {
                    "input": "frames",
                    "representation": "defs.representation.nop",
                    "classifier": "defs.classifier.lstm",
                    "lstm_params": [32, 1, "defs.fusion_method.avg"]}}]},
        "train": {
            "batch_size": 2, "epochs": epochs,
            "optimizer": "defs.optim.sgd", "base_lr": 0.01,
            "lr_mult": 2.0,
            "lr_decay": "[defs.decay.exp, defs.periodicity.drops, 2, 0.9]",
            "clip_norm": 10, "dropout_keep_prob": 0.5},
        "val": {
            "batch_size": 2, "logits_save_interval": -1,
            "clip_fusion": "[defs.fusion_type.late, defs.fusion_method.avg]"},
        "logging": {
            "save_freq_per_epoch": 1, "level": "logging.INFO",
            "print_tensors": False, "tensorboard_folder": "tb",
            "email_notify": None},
    }}
    p = tmp_path / ("run_%s.yml" % phase)
    p.write_text(yaml.safe_dump(cfg))
    return p, run_folder


@pytest.fixture(scope="module")
def packed_tree(tmp_path_factory):
    from tests.conftest import make_image
    from PIL import Image
    tmp_path = tmp_path_factory.mktemp("e2e")
    vids = []
    for v in range(3):
        vdir = tmp_path / ("vid%d" % v)
        vdir.mkdir()
        for i in range(12):
            Image.fromarray(make_image(112, 112, seed=v * 50 + i)).save(
                vdir / ("f_%04d.jpg" % i), quality=95)
        vids.append(vdir)
    tree = tmp_path / "videos.train"
    tree.write_text("\n".join("%s %d" % (v, i)
                              for i, v in enumerate(vids)) + "\n")
    _pack(tmp_path, tree)
    return tmp_path, tree


def test_train_and_validate_e2e(packed_tree):
    from video_learning_tpu import run_task
    tmp_path, tree = packed_tree
    cfg, run_folder = _run_config(tmp_path, tree, "train")
    run_task.main(str(cfg))

    # checkpoints + snap written
    ckpts = [f for f in os.listdir(run_folder / "checkpoints")
             if f.endswith(".ckpt")]
    assert ckpts
    snap = [f for f in os.listdir(run_folder / "checkpoints")
            if f.endswith(".snap")]
    assert snap
    # lr schedule file
    assert any("lr_decay_schedule" in f for f in os.listdir(run_folder))
    # metrics written, loss finite
    tb = run_folder / "tb" / "train"
    metrics_files = list(tb.glob("metrics_*.jsonl"))
    assert metrics_files
    import json
    lines = [json.loads(l) for l in open(metrics_files[0])]
    assert len(lines) == 4  # 2 epochs x 2 batches
    assert all(np.isfinite(l["loss"]) for l in lines)
    assert lines[0]["lr"] == pytest.approx(0.01)
    assert lines[-1]["lr"] < 0.01  # decayed
    # e2e throughput streams per step from the SECOND step on (the
    # first absorbs the compile and has no predecessor clock)
    assert "clips_per_sec" not in lines[0]
    assert all(l["clips_per_sec"] > 0 for l in lines[1:])

    # ---- validation run resuming the final checkpoint
    vcfg, vrun = _run_config(tmp_path, tree, "val", resume="latest")
    # val run uses the same run folder to find checkpoints
    text = vcfg.read_text().replace(str(vrun), str(run_folder))
    vcfg.write_text(text)
    run_task.main(str(vcfg))
    accf = [f for f in os.listdir(run_folder) if f.startswith("accuracy_")]
    assert accf
    acc = float((run_folder / accf[0]).read_text())
    assert 0.0 <= acc <= 1.0
    # logits chunks persisted (.total since interval=-1)
    assert any(f.startswith("validation_logits_") and f.endswith(".total")
               for f in os.listdir(run_folder))


def test_resume_training(packed_tree):
    from video_learning_tpu import run_task
    tmp_path, tree = packed_tree
    cfg, run_folder = _run_config(tmp_path, tree, "train", epochs=1)
    # fresh run folder for this test
    import shutil
    if run_folder.exists():
        shutil.rmtree(run_folder)
    run_task.main(str(cfg))
    ckpt_dir = run_folder / "checkpoints"
    first_ckpts = sorted(ckpt_dir.glob("*.ckpt"))
    assert first_ckpts
    # resume for one more epoch
    cfg2, _ = _run_config(tmp_path, tree, "train", resume="latest",
                          epochs=2)
    run_task.main(str(cfg2))
    latest = max(ckpt_dir.glob("*.snap"), key=os.path.getmtime)
    with open(latest, "r") as f:
        batch_idx, epoch_idx, gstep = json.load(f)
    assert gstep == 4  # 2 epochs x 2 batches total
    assert epoch_idx == 1


def test_train_with_device_preprocess(packed_tree):
    """The production input path: uint8 batches + on-device
    crop/mean/mirror through the full run_task flow."""
    from video_learning_tpu import run_task
    import yaml
    tmp_path, tree = packed_tree
    cfg, run_folder = _run_config(tmp_path, tree, "train", epochs=1)
    import shutil
    if run_folder.exists():
        shutil.rmtree(run_folder)
    docs = yaml.safe_load(cfg.read_text())
    docs["run"]["data"]["tinyvid"]["device_preprocess"] = True
    docs["run"]["data"]["tinyvid"]["epoch_shuffle"] = True
    cfg2 = tmp_path / "run_devpre.yml"
    cfg2.write_text(yaml.safe_dump(docs))
    run_task.main(str(cfg2))
    import json
    tb = run_folder / "tb" / "train"
    mfile = sorted(tb.glob("metrics_*.jsonl"))[-1]
    lines = [json.loads(l) for l in open(mfile)]
    assert len(lines) == 2
    assert all(np.isfinite(l["loss"]) for l in lines)


def test_train_with_async_checkpointing(packed_tree):
    """checkpoint_async: True through the full CLI driver — background
    writes produce resumable checkpoints identical in contract to the
    sync path (resume restores position and finishes the run)."""
    from video_learning_tpu import run_task
    import yaml
    tmp_path, tree = packed_tree
    cfg, run_folder = _run_config(tmp_path, tree, "train", epochs=1)
    import shutil
    if run_folder.exists():
        shutil.rmtree(run_folder)
    docs = yaml.safe_load(cfg.read_text())
    docs["run"]["checkpoint_async"] = True
    cfg2 = tmp_path / "run_async.yml"
    cfg2.write_text(yaml.safe_dump(docs))
    run_task.main(str(cfg2))
    ckpt_dir = run_folder / "checkpoints"
    assert sorted(ckpt_dir.glob("*.ckpt"))
    assert sorted(ckpt_dir.glob("*.snap"))
    # resume from the async-written checkpoint for a second epoch
    cfg3, _ = _run_config(tmp_path, tree, "train", resume="latest",
                          epochs=2)
    docs = yaml.safe_load(cfg3.read_text())
    docs["run"]["checkpoint_async"] = True
    cfg4 = tmp_path / "run_async_resume.yml"
    cfg4.write_text(yaml.safe_dump(docs))
    run_task.main(str(cfg4))
    latest = max(ckpt_dir.glob("*.snap"), key=os.path.getmtime)
    with open(latest, "r") as f:
        _, epoch_idx, gstep = json.load(f)
    assert gstep == 4 and epoch_idx == 1


@pytest.mark.parametrize("mode", ["int8", "int8_static"])
def test_validate_quantized_int8(packed_tree, mode):
    """val: quantize: int8 / int8_static through the CLI driver — the
    w8a8 serving forward (dynamic or first-batch-calibrated static
    activation scales) produces a valid accuracy file on the same
    checkpoint."""
    from video_learning_tpu import run_task
    import yaml
    tmp_path, tree = packed_tree
    cfg, run_folder = _run_config(tmp_path, tree, "train", epochs=1)
    import shutil
    if run_folder.exists():
        shutil.rmtree(run_folder)
    run_task.main(str(cfg))

    vcfg, _ = _run_config(tmp_path, tree, "val", resume="latest")
    docs = yaml.safe_load(vcfg.read_text())
    docs["run"]["val"]["quantize"] = mode
    docs["run"]["val"]["top_k"] = 2     # exercise top-k reporting too
    vcfg2 = tmp_path / ("val_%s.yml" % mode)
    vcfg2.write_text(yaml.safe_dump(docs))
    run_task.main(str(vcfg2))
    accf = [f for f in os.listdir(run_folder)
            if f.startswith("accuracy_") and "top" not in f][0]
    acc = float((run_folder / accf).read_text())
    assert 0.0 <= acc <= 1.0
    topf = [f for f in os.listdir(run_folder)
            if f.startswith("accuracy_top2_")][0]
    acc2 = float((run_folder / topf).read_text())
    # top-2 can never be below top-1
    assert acc <= acc2 <= 1.0


def test_preemption_sigterm_saves_and_resumes(packed_tree, monkeypatch):
    """SIGTERM mid-training (the cloud scheduler's grace signal before
    reclaiming a preemptible TPU VM) saves a resumable checkpoint and
    exits the loop cleanly; a resume run then finishes the full plan."""
    from video_learning_tpu import run_task
    from video_learning_tpu import observe
    import signal
    tmp_path, tree = packed_tree
    cfg, run_folder = _run_config(tmp_path, tree, "train", epochs=3)
    import shutil
    if run_folder.exists():
        shutil.rmtree(run_folder)

    real_write = observe.MetricsWriter.write
    fired = []

    def write_and_sigterm(self, step, **metrics):
        real_write(self, step, **metrics)
        if not fired:       # first step only: deliver the grace signal
            fired.append(step)
            os.kill(os.getpid(), signal.SIGTERM)

    monkeypatch.setattr(observe.MetricsWriter, "write", write_and_sigterm)
    run_task.main(str(cfg))    # returns instead of dying on the signal
    monkeypatch.undo()

    ckpt_dir = run_folder / "checkpoints"
    preempt = [p for p in ckpt_dir.glob("*.ckpt") if "_preempt" in p.name]
    assert preempt, "no preemption checkpoint written"
    with open(str(preempt[0]) + ".snap") as f:
        batch_idx, epoch_idx, gstep = json.load(f)
    assert (batch_idx, epoch_idx, gstep) == (1, 0, 1)
    # the handler was restored after the loop
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL

    cfg2, _ = _run_config(tmp_path, tree, "train", resume="latest",
                          epochs=3)
    run_task.main(str(cfg2))
    latest = max(ckpt_dir.glob("*.snap"), key=os.path.getmtime)
    with open(latest, "r") as f:
        _, epoch_idx, gstep = json.load(f)
    assert gstep == 6  # 3 epochs x 2 batches completed after the resume


def test_validate_clip_batch_mode(packed_tree):
    """batch_item=clip validation through the CLI driver: clips stream in
    fixed-size batches and fuse into videos as each cpv completes."""
    from video_learning_tpu import run_task
    import yaml
    tmp_path, tree = packed_tree
    cfg, run_folder = _run_config(tmp_path, tree, "train", epochs=1)
    import shutil
    if run_folder.exists():
        shutil.rmtree(run_folder)
    run_task.main(str(cfg))

    vcfg, _ = _run_config(tmp_path, tree, "val", resume="latest")
    docs = yaml.safe_load(vcfg.read_text())
    docs["run"]["data"]["tinyvid"]["batch_item"] = "defs.batch_item.clip"
    docs["run"]["val"]["batch_size"] = 4
    vcfg2 = tmp_path / "val_clip.yml"
    vcfg2.write_text(yaml.safe_dump(docs))
    run_task.main(str(vcfg2))
    accf = [f for f in os.listdir(run_folder)
            if f.startswith("accuracy_")][0]
    acc = float((run_folder / accf).read_text())
    assert 0.0 <= acc <= 1.0


def test_grad_accumulation_matches_full_batch(packed_tree):
    """accum_steps=N is numerically the N=1 step: same per-step losses
    and the same final parameters (masked-sum accumulation divided by
    the total count reproduces the full-batch masked mean)."""
    from video_learning_tpu import run_task
    from video_learning_tpu.checkpoint import load_flat
    import shutil
    tmp_path, tree = packed_tree

    def run(accum, name):
        cfg, run_folder = _run_config(tmp_path, tree, "train", epochs=1)
        docs = yaml.safe_load(cfg.read_text())
        folder = tmp_path / ("accrun_%s" % name)
        if folder.exists():
            shutil.rmtree(folder)
        docs["run"]["run_folder"] = str(folder)
        # identical dropout draws across variants: disable dropout (the
        # accumulating step folds a distinct rng per micro-batch)
        docs["run"]["train"]["dropout_keep_prob"] = 1.0
        if accum != 1:
            docs["run"]["train"]["accum_steps"] = accum
        p = tmp_path / ("accrun_%s.yml" % name)
        p.write_text(yaml.safe_dump(docs))
        run_task.main(str(p))
        tb = folder / "tb" / "train"
        lines = [json.loads(l)
                 for l in open(list(tb.glob("metrics_*.jsonl"))[0])]
        ckpt = max((folder / "checkpoints").glob("*.ckpt"),
                   key=os.path.getmtime)
        return lines, load_flat(str(ckpt))

    base_lines, base_flat = run(1, "base")
    acc_lines, acc_flat = run(2, "accum2")
    assert len(base_lines) == len(acc_lines)
    for a, b in zip(base_lines, acc_lines):
        assert a["loss"] == pytest.approx(b["loss"], rel=1e-5)
        assert a["accuracy"] == pytest.approx(b["accuracy"], abs=1e-6)
        # reduction order differs (per-chunk sums vs one joint reduction):
        # f32 reassociation through the conv stack shows up here first
        assert a["grad_norm"] == pytest.approx(b["grad_norm"], rel=5e-3)
    assert base_flat.keys() == acc_flat.keys()
    for k in base_flat:
        if np.issubdtype(np.asarray(base_flat[k]).dtype, np.floating):
            np.testing.assert_allclose(base_flat[k], acc_flat[k],
                                       rtol=1e-4, atol=1e-5, err_msg=k)


def test_accum_steps_config_validation(packed_tree):
    """accum_steps must divide batch_size and be >= 1."""
    from video_learning_tpu.config import Settings
    tmp_path, tree = packed_tree
    cfg, _ = _run_config(tmp_path, tree, "train", epochs=1)
    docs = yaml.safe_load(cfg.read_text())
    docs["run"]["train"]["accum_steps"] = 3  # batch_size=2
    p = tmp_path / "accbad.yml"
    p.write_text(yaml.safe_dump(docs))
    with pytest.raises(Exception, match="accum_steps"):
        Settings().initialize(str(p))


def test_compile_cache_persists_executables(packed_tree):
    """compile_cache: <dir> turns on the persistent XLA compilation
    cache: the jitted train step lands on disk, so a restarted process
    (e.g. a preemption resume) skips recompilation."""
    import jax
    import shutil
    from video_learning_tpu import run_task
    tmp_path, tree = packed_tree
    cache_dir = tmp_path / "xla_cache"
    cfg, _ = _run_config(tmp_path, tree, "train", epochs=1)
    docs = yaml.safe_load(cfg.read_text())
    folder = tmp_path / "ccrun"
    if folder.exists():
        shutil.rmtree(folder)
    docs["run"]["run_folder"] = str(folder)
    docs["run"]["compile_cache"] = str(cache_dir)
    p = tmp_path / "ccrun.yml"
    p.write_text(yaml.safe_dump(docs))
    try:
        run_task.main(str(p))
        entries = list(cache_dir.iterdir())
        assert entries, "no compiled executables were cached"
    finally:
        # the cache config is process-global: restore the defaults so
        # other tests don't write into this tmpdir
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def test_inline_eval_every_epochs(packed_tree):
    """train: eval_every_epochs: 1 runs the val phase on the live params
    after each epoch — accuracy lands in the metrics stream, no logits
    chunk files are persisted, and training still checkpoints/resumes."""
    from video_learning_tpu import run_task
    import shutil
    tmp_path, tree = packed_tree
    cfg, _ = _run_config(tmp_path, tree, "train", epochs=2)
    docs = yaml.safe_load(cfg.read_text())
    folder = tmp_path / "inline_eval_run"
    if folder.exists():
        shutil.rmtree(folder)
    docs["run"]["run_folder"] = str(folder)
    docs["run"]["train"]["eval_every_epochs"] = 1
    # a val-phase dataset over the same packed records
    docs["run"]["data"]["tinyvid_val"] = dict(
        docs["run"]["data"]["tinyvid"], phase="defs.phase.val")
    p = tmp_path / "inline_eval.yml"
    p.write_text(yaml.safe_dump(docs))
    run_task.main(str(p))

    tb = folder / "tb" / "train"
    lines = [json.loads(l) for l in open(list(tb.glob("metrics_*.jsonl"))[0])]
    evals = [l for l in lines if "val_accuracy" in l]
    assert len(evals) == 2   # one per epoch
    assert all(0.0 <= l["val_accuracy"] <= 1.0 for l in evals)
    # the inline evals keep logits in memory — chunk artifacts belong to
    # the standalone val phase only
    assert not [f for f in os.listdir(folder)
                if f.startswith("validation_logits_")]
    # training artifacts are unaffected
    assert list((folder / "checkpoints").glob("*.ckpt"))


def test_inline_eval_requires_val_block(packed_tree):
    from video_learning_tpu.config import Settings
    tmp_path, tree = packed_tree
    cfg, _ = _run_config(tmp_path, tree, "train", epochs=1)
    docs = yaml.safe_load(cfg.read_text())
    docs["run"]["train"]["eval_every_epochs"] = 1
    del docs["run"]["val"]
    p = tmp_path / "inline_noval.yml"
    p.write_text(yaml.safe_dump(docs))
    with pytest.raises(Exception, match="val"):
        Settings().initialize(str(p))


def test_early_stopping_on_stale_val(packed_tree, monkeypatch):
    """early_stop_patience: training stops once inline val accuracy has
    not improved for N evals, and still writes the final checkpoint."""
    from video_learning_tpu import run_task
    import shutil
    tmp_path, tree = packed_tree
    cfg, _ = _run_config(tmp_path, tree, "train", epochs=6)
    docs = yaml.safe_load(cfg.read_text())
    folder = tmp_path / "earlystop_run"
    if folder.exists():
        shutil.rmtree(folder)
    docs["run"]["run_folder"] = str(folder)
    docs["run"]["train"]["eval_every_epochs"] = 1
    docs["run"]["train"]["early_stop_patience"] = 2
    docs["run"]["data"]["tinyvid_val"] = dict(
        docs["run"]["data"]["tinyvid"], phase="defs.phase.val")
    p = tmp_path / "earlystop.yml"
    p.write_text(yaml.safe_dump(docs))
    # constant accuracy: eval 1 sets the best, evals 2 and 3 are stale
    monkeypatch.setattr(run_task, "run_inline_eval",
                        lambda *a, **k: 0.5)
    run_task.main(str(p))

    tb = folder / "tb" / "train"
    lines = [json.loads(l) for l in open(list(tb.glob("metrics_*.jsonl"))[0])]
    evals = [l for l in lines if "val_accuracy" in l]
    steps = [l for l in lines if "loss" in l]
    assert len(evals) == 3          # best + 2 stale -> stop
    assert len(steps) == 6          # 3 epochs x 2 batches, not 6 epochs
    assert list((folder / "checkpoints").glob("*.ckpt"))


def test_early_stop_requires_inline_eval(packed_tree):
    from video_learning_tpu.config import Settings
    tmp_path, tree = packed_tree
    cfg, _ = _run_config(tmp_path, tree, "train", epochs=1)
    docs = yaml.safe_load(cfg.read_text())
    docs["run"]["train"]["early_stop_patience"] = 2
    p = tmp_path / "es_noeval.yml"
    p.write_text(yaml.safe_dump(docs))
    with pytest.raises(Exception, match="eval_every_epochs"):
        Settings().initialize(str(p))


def test_eval_keep_best_checkpoint(packed_tree, monkeypatch):
    """eval_keep_best: best.ckpt tracks the best inline val accuracy,
    lives outside the rotation (never pruned, not what 'latest' picks),
    and resumes via resume_file: best."""
    from video_learning_tpu import run_task
    from video_learning_tpu.utils import get_run_checkpoints
    import shutil
    tmp_path, tree = packed_tree
    cfg, _ = _run_config(tmp_path, tree, "train", epochs=3)
    docs = yaml.safe_load(cfg.read_text())
    folder = tmp_path / "keepbest_run"
    if folder.exists():
        shutil.rmtree(folder)
    docs["run"]["run_folder"] = str(folder)
    docs["run"]["train"]["eval_every_epochs"] = 1
    docs["run"]["train"]["eval_keep_best"] = True
    docs["run"]["data"]["tinyvid_val"] = dict(
        docs["run"]["data"]["tinyvid"], phase="defs.phase.val")
    p = tmp_path / "keepbest.yml"
    p.write_text(yaml.safe_dump(docs))
    accs = iter([0.3, 0.8, 0.5])
    monkeypatch.setattr(run_task, "run_inline_eval",
                        lambda *a, **k: next(accs))
    run_task.main(str(p))

    best = folder / "checkpoints" / "best.ckpt"
    assert best.exists() and (folder / "checkpoints" /
                              "best.ckpt.snap").exists()
    # outside the rotation: not listed, so neither pruned nor 'latest'
    listed = get_run_checkpoints(str(folder))
    assert str(best) not in listed and listed

    # the best checkpoint resumes for evaluation
    vcfg, vrun = _run_config(tmp_path, tree, "val", resume="best")
    text = vcfg.read_text().replace(str(vrun), str(folder))
    vp = tmp_path / "keepbest_val.yml"
    vp.write_text(text)
    run_task.main(str(vp))
    accf = [f for f in os.listdir(folder) if f.startswith("accuracy_")]
    assert accf

    # best/stale state persists across a resume: the resumed run's worse
    # eval (0.4 < recorded best 0.8) must NOT overwrite best.ckpt
    state = json.load(open(folder / "checkpoints" / "eval_state.json"))
    assert state == {"best_acc": 0.8, "stale_evals": 1}
    before = best.stat().st_mtime
    docs["run"]["resume_file"] = "latest"
    docs["run"]["train"]["epochs"] = 4
    p2 = tmp_path / "keepbest_resume.yml"
    p2.write_text(yaml.safe_dump(docs))
    monkeypatch.setattr(run_task, "run_inline_eval",
                        lambda *a, **k: 0.4)
    run_task.main(str(p2))
    assert best.stat().st_mtime == before, "worse eval clobbered best"
    state = json.load(open(folder / "checkpoints" / "eval_state.json"))
    assert state == {"best_acc": 0.8, "stale_evals": 2}


def test_inline_eval_requires_val_dataset(packed_tree):
    """eval_every_epochs with no val-phase dataset fails at startup, not
    after the first trained epoch."""
    from video_learning_tpu.config import Settings
    tmp_path, tree = packed_tree
    cfg, _ = _run_config(tmp_path, tree, "train", epochs=1)
    docs = yaml.safe_load(cfg.read_text())
    docs["run"]["train"]["eval_every_epochs"] = 1
    p = tmp_path / "inline_nods.yml"
    p.write_text(yaml.safe_dump(docs))
    with pytest.raises(Exception, match="val-phase dataset"):
        Settings().initialize(str(p))


# --------------------------------------------------------------- bit-exact
# resume equivalence (the whole point of replacing the reference's
# iterator fast-forward, dataset_.py:772-811 / feeder.py:263-288, with
# (seed, epoch)-deterministic shuffles, O(1) positional restore and
# step-keyed RNG): interrupted-and-resumed training must be BIT-IDENTICAL
# to uninterrupted training — params, opt-state leaves, EMA shadow, and
# the per-step metrics stream.

@pytest.fixture(scope="module")
def packed_tree8(tmp_path_factory):
    """8 videos so batch_size=4 gives two even batches per epoch, and
    accum_steps=2 micro-batches still shard over a data=2 mesh axis."""
    from tests.conftest import make_image
    from PIL import Image
    tmp_path = tmp_path_factory.mktemp("bitexact")
    vids = []
    for v in range(8):
        vdir = tmp_path / ("vid%d" % v)
        vdir.mkdir()
        for i in range(12):
            Image.fromarray(make_image(112, 112, seed=v * 50 + i)).save(
                vdir / ("f_%04d.jpg" % i), quality=95)
        vids.append(vdir)
    tree = tmp_path / "videos.train"
    tree.write_text("\n".join("%s %d" % (v, i % 3)
                              for i, v in enumerate(vids)) + "\n")
    _pack(tmp_path, tree)
    return tmp_path, tree


def _bitexact_config(tmp_path, tree, run_name, accum, ema, mesh,
                     resume=None):
    cfg, run_folder = _run_config(tmp_path, tree, "train", resume=resume,
                                  epochs=2)
    docs = yaml.safe_load(cfg.read_text())
    run_folder = tmp_path / run_name
    docs["run"]["run_folder"] = str(run_folder)
    docs["run"]["mesh_shape"] = mesh
    docs["run"]["train"]["batch_size"] = 4
    docs["run"]["train"]["accum_steps"] = accum
    if ema:
        docs["run"]["train"]["ema_decay"] = ema
    out = tmp_path / ("%s.yml" % run_name)
    out.write_text(yaml.safe_dump(docs))
    return out, run_folder


def _read_metric_stream(run_folder):
    """{global_step: (loss, lr, grad_norm)} merged over every metrics
    file the run(s) in this folder wrote."""
    out = {}
    for f in sorted((run_folder / "tb" / "train").glob("metrics_*.jsonl")):
        for line in open(f):
            rec = json.loads(line)
            out[rec["step"]] = (rec["loss"], rec["lr"], rec["grad_norm"])
    return out


@pytest.mark.parametrize("accum,ema,mesh", [
    (1, 0.0, {"data": 1}),
    (2, 0.9, {"data": 1}),
    (1, 0.9, {"data": 2, "model": 2}),
    (2, 0.0, {"data": 2, "model": 2}),
])
def test_bitexact_resume_equivalence(packed_tree8, accum, ema, mesh):
    """train(4 steps) ≡ train(1 step) -> SIGTERM preempt save ->
    fresh engine -> resume -> train(3 steps), exactly, on CPU."""
    from video_learning_tpu import checkpoint as ckpt_mod
    from video_learning_tpu import observe, run_task
    import signal
    tmp_path, tree = packed_tree8
    tag = "a%d_e%s_m%d" % (accum, ema, len(mesh))

    # ---- uninterrupted baseline: 2 epochs x 2 batches = 4 steps
    cfg_a, folder_a = _bitexact_config(tmp_path, tree, "base_" + tag,
                                       accum, ema, mesh)
    run_task.main(str(cfg_a))

    # ---- interrupted run: SIGTERM lands after step 1 (mid-epoch), the
    # preempt handler saves and exits the loop cleanly
    cfg_b, folder_b = _bitexact_config(tmp_path, tree, "intr_" + tag,
                                       accum, ema, mesh)
    real_write = observe.MetricsWriter.write
    fired = []

    def write_and_sigterm(self, step, **metrics):
        real_write(self, step, **metrics)
        if not fired:
            fired.append(step)
            os.kill(os.getpid(), signal.SIGTERM)

    observe.MetricsWriter.write = write_and_sigterm
    try:
        run_task.main(str(cfg_b))
    finally:
        observe.MetricsWriter.write = real_write
    preempt = [p for p in (folder_b / "checkpoints").glob("*.ckpt")
               if "_preempt" in p.name]
    assert preempt, "no preemption checkpoint written"

    # ---- fresh engine resumes and finishes the remaining 3 steps
    cfg_c, _ = _bitexact_config(tmp_path, tree, "intr_" + tag,
                                accum, ema, mesh, resume="latest")
    run_task.main(str(cfg_c))

    # ---- metrics streams identical at every overlapping step
    stream_a = _read_metric_stream(folder_a)
    stream_b = _read_metric_stream(folder_b)
    assert sorted(stream_a) == sorted(stream_b) == [1, 2, 3, 4]
    assert stream_a == stream_b, (
        "resumed metrics diverge: %s vs %s" % (stream_a, stream_b))

    # ---- final checkpoints bit-identical: params, opt-state leaves,
    # EMA shadow, global step
    def final_ckpt(folder):
        ckpts = [p for p in (folder / "checkpoints").glob("*.ckpt")
                 if "_preempt" not in p.name]
        return ckpt_mod.load_flat(
            str(max(ckpts, key=lambda p: int(p.stem.split("_gs_")[-1]))))

    flat_a, flat_b = final_ckpt(folder_a), final_ckpt(folder_b)
    assert sorted(flat_a) == sorted(flat_b)
    if ema:
        assert any(k.startswith("ema_params") for k in flat_a)
    assert any(k.startswith("params") for k in flat_a)
    for k in flat_a:
        a, b = np.asarray(flat_a[k]), np.asarray(flat_b[k])
        assert a.dtype == b.dtype and a.shape == b.shape, k
        assert np.array_equal(a, b), (
            "checkpoint leaf %s differs after resume (max |d|=%s)"
            % (k, np.max(np.abs(a.astype(np.float64)
                                - b.astype(np.float64)))))


def test_watch_tensors_streams_descriptive_stats(packed_tree):
    """logging.watch_tensors (reference add_descriptive_summary,
    utils_.py:172-184): regex-matched params AND their grads stream
    mean/std/min/max into the JSONL metrics every step."""
    from video_learning_tpu import run_task
    tmp_path, tree = packed_tree
    cfg, run_folder = _run_config(tmp_path, tree, "train")
    doc = yaml.safe_load(cfg.read_text())
    doc["run"]["run_folder"] = str(tmp_path / "run_watch")
    doc["run"]["logging"]["watch_tensors"] = ["fc6", "logits/b"]
    cfg.write_text(yaml.safe_dump(doc))
    run_task.main(str(cfg))

    tb = tmp_path / "run_watch" / "tb" / "train"
    lines = [json.loads(l) for l in open(list(tb.glob("metrics_*.jsonl"))[0])]
    assert len(lines) == 4
    watched = sorted(k for k in lines[0] if k.startswith(("param/", "grad/")))
    # every watched tensor reports all four stats for params AND grads
    paths = {k.split("/", 1)[1].rsplit("/", 1)[0] for k in watched}
    assert paths and all("fc6" in p or "logits/b" in p for p in paths)
    for p in paths:
        for kind in ("param", "grad"):
            for stat in ("mean", "std", "min", "max"):
                key = "%s/%s/%s" % (kind, p, stat)
                assert all(np.isfinite(l[key]) for l in lines), key
    # stats are real: min <= mean <= max, and training moves the params
    k0 = "param/%s" % sorted(paths)[0]
    for l in lines:
        # fp32 reduction tolerance: a constant tensor's mean rounds a
        # few ulp away from its min/max
        tol = 1e-5 * max(1.0, abs(l[k0 + "/mean"]))
        assert l[k0 + "/min"] <= l[k0 + "/mean"] + tol
        assert l[k0 + "/mean"] <= l[k0 + "/max"] + tol
    assert lines[0][k0 + "/mean"] != lines[-1][k0 + "/mean"] or \
        lines[0][k0 + "/std"] != lines[-1][k0 + "/std"]
    # unwatched runs carry no tensor stats (the default path is clean)
    assert "watch_tensors" not in doc["run"]["logging"] or True
