"""Learning-convergence proof: the full stack (pack -> train -> validate)
must actually learn a separable problem, not just run."""

import json
import os
import shutil

import numpy as np
import pytest
import yaml

from video_learning_tpu.data import serialize as ser


@pytest.fixture(scope="module")
def separable_vectors(tmp_path_factory):
    """60 8-d vectors in 3 linearly separable clusters."""
    tmp_path = tmp_path_factory.mktemp("learn")
    rng = np.random.RandomState(0)
    lines = []
    centers = np.eye(3, 8) * 6.0
    for i in range(60):
        cls = i % 3
        vec = centers[cls] + rng.randn(8) * 0.3
        lines.append("%s %d" % (",".join("%.4f" % v for v in vec), cls))
    feats = tmp_path / "feats.txt"
    feats.write_text("\n".join(lines) + "\n")
    (tmp_path / "feats.txt.ids").write_text(
        "\n".join("item%d" % i for i in range(60)) + "\n")
    cfg = {"serialize": {
        "output_folder": None, "path_prepend_folder": None,
        "input_files": [str(feats)], "run_id": "lv",
        "num_threads": 1, "num_items_per_thread": 64,
        "raw_image_shape": None, "clip_offset_or_num": 1,
        "num_frames_per_clip": 1,
        "clipframe_mode": "defs.clipframe_mode.iterative",
        "generation_error": "defs.generation_error.compromise",
        "do_shuffle": False, "do_serialize": True, "do_validate": False,
        "validate_pcnt": 100, "frame_format": "jpg",
        "logging_level": "logging.INFO", "seed": 3}}
    p = tmp_path / "pack.yml"
    p.write_text(yaml.safe_dump(cfg))
    ser.main(["x", str(p)])
    return tmp_path, feats


def _cfg(tmp_path, feats, phase, resume=None, epochs=30):
    cfg = {"run": {
        "resume_file": resume,
        "run_folder": str(tmp_path / "run"),
        "run_id": "learn", "seed": 0,
        "mesh_shape": {"data": 1}, "compute_dtype": "float32",
        "phase": "defs.phase.%s" % phase,
        "data": {"v": {
            "data_path": str(feats),
            "data_format": "defs.data_format.tfrecord",
            "batch_item": "defs.batch_item.default",
            "phase": "defs.phase.%s" % phase,
            "tag": "defs.dataset_tag.main"}},
        "network": {"num_classes": 3, "pipelines": [
            {"mlp": {"input": "defs.dataset_tag.main",
                     "representation": "defs.representation.fc",
                     "fc_output_dim": 16,
                     "classifier": "defs.classifier.fc"}}]},
        "train": {"batch_size": 20, "epochs": epochs,
                  "optimizer": "defs.optim.adam", "base_lr": 0.01,
                  "lr_mult": None, "lr_decay": None, "clip_norm": None,
                  "dropout_keep_prob": 0.5},
        "val": {"batch_size": 20, "logits_save_interval": -1,
                "clip_fusion": ["defs.fusion_type.late",
                                "defs.fusion_method.avg"]},
        "logging": {"save_freq_per_epoch": 1, "level": "logging.WARN",
                    "print_tensors": False, "tensorboard_folder": "tb",
                    "email_notify": None},
    }}
    p = tmp_path / ("learn_%s.yml" % phase)
    p.write_text(yaml.safe_dump(cfg))
    return p


def test_learns_separable_vectors(separable_vectors):
    from video_learning_tpu import run_task
    tmp_path, feats = separable_vectors
    run_folder = tmp_path / "run"
    if run_folder.exists():
        shutil.rmtree(run_folder)
    run_task.main(str(_cfg(tmp_path, feats, "train")))
    run_task.main(str(_cfg(tmp_path, feats, "val", resume="latest")))
    accf = [f for f in os.listdir(run_folder)
            if f.startswith("accuracy_")][0]
    acc = float((run_folder / accf).read_text())
    assert acc >= 0.95, "stack failed to learn a separable problem: %f" % acc
