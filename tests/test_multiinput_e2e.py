"""Two-branch composition end-to-end: video frames (main) + spectrogram
images (aux) fused with ibias into an LSTM classifier — the
config.example.yml:39-57 pattern — through the run_task driver.
Exercises the Feeder's multi-dataset tag matching (feeder.py:84-106)."""

import json
import os

import numpy as np
import pytest
import yaml
from PIL import Image

from video_learning_tpu.data import serialize as ser


@pytest.fixture(scope="module")
def twostream_fixture(tmp_path_factory):
    from tests.conftest import make_image
    tmp_path = tmp_path_factory.mktemp("twostream")
    # main: 4 videos x 8 frames
    vid_lines = []
    for v in range(4):
        vdir = tmp_path / ("vid%d" % v)
        vdir.mkdir()
        for i in range(8):
            Image.fromarray(make_image(112, 112, seed=v * 31 + i)).save(
                vdir / ("f_%04d.jpg" % i), quality=95)
        vid_lines.append("%s %d" % (vdir, v % 2))
    vids_file = tmp_path / "videos.train"
    vids_file.write_text("\n".join(vid_lines) + "\n")
    # aux: one spectrogram image per video
    spec_lines = []
    sdir = tmp_path / "specs"
    sdir.mkdir()
    for v in range(4):
        p = sdir / ("spec_%d.jpg" % v)
        Image.fromarray(make_image(112, 112, seed=900 + v)).save(
            p, quality=95)
        spec_lines.append("%s %d" % (p, v % 2))
    specs_file = tmp_path / "specs.train"
    specs_file.write_text("\n".join(spec_lines) + "\n")

    for infile, cpv, fpc, mode in ((vids_file, 1, 4, "rand_clips"),
                                   (specs_file, 1, 1, "iterative")):
        cfg = {"serialize": {
            "output_folder": None, "path_prepend_folder": None,
            "input_files": [str(infile)], "run_id": "ts",
            "num_threads": 2, "num_items_per_thread": 8,
            "raw_image_shape": "(112, 112, 3)",
            "clip_offset_or_num": cpv, "num_frames_per_clip": fpc,
            "clipframe_mode": "defs.clipframe_mode.%s" % mode,
            "generation_error": "defs.generation_error.compromise",
            "do_shuffle": False, "do_serialize": True,
            "do_validate": False, "validate_pcnt": 100,
            "frame_format": "jpg", "logging_level": "logging.INFO",
            "seed": 4}}
        p = tmp_path / ("pack_%s.yml" % infile.name)
        p.write_text(yaml.safe_dump(cfg))
        ser.main(["x", str(p)])
    return tmp_path, vids_file, specs_file


def _dataset(path, tag, phase):
    return {
        "data_path": str(path),
        "raw_image_shape": "(112, 112, 3)",
        "image_shape": "(96, 96, 3)",
        "mean_image": [99.0, 99.0, 99.0],
        "data_format": "defs.data_format.tfrecord",
        "frame_format": "jpg",
        "imgproc": ["defs.imgproc.center_crop", "defs.imgproc.sub_mean"],
        "batch_item": "defs.batch_item.default",
        "phase": "defs.phase.%s" % phase,
        "tag": "defs.dataset_tag.%s" % tag,
    }


def test_twostream_ibias_training(twostream_fixture):
    from video_learning_tpu import run_task
    tmp_path, vids_file, specs_file = twostream_fixture
    run_folder = tmp_path / "run"
    cfg = {"run": {
        "resume_file": None,
        "run_folder": str(run_folder),
        "run_id": "ts",
        "seed": 1,
        "mesh_shape": {"data": 1},
        "compute_dtype": "float32",
        "phase": "defs.phase.train",
        "data": {
            "frames_set": _dataset(vids_file, "main", "train"),
            "specs_set": _dataset(specs_file, "aux", "train"),
        },
        "network": {
            "num_classes": 2,
            "pipelines": [
                {"frames": {
                    "input": "defs.dataset_tag.main",
                    "representation": "defs.representation.dcnn",
                    "frame_encoding_layer": "fc6"}},
                {"spectros": {
                    "input": "defs.dataset_tag.aux",
                    "representation": "defs.representation.dcnn",
                    "frame_encoding_layer": "fc6"}},
                {"combo": {
                    "input": ["frames", "spectros"],
                    "representation": "defs.representation.nop",
                    "input_fusion": "defs.fusion_method.ibias",
                    "classifier": "defs.classifier.lstm",
                    "lstm_params": [24, 1, "defs.fusion_method.avg"]}}]},
        "train": {"batch_size": 2, "epochs": 1,
                  "optimizer": "defs.optim.adam", "base_lr": 0.001,
                  "lr_mult": None, "lr_decay": None, "clip_norm": 5,
                  "dropout_keep_prob": 0.5},
        "val": {"batch_size": 2, "logits_save_interval": -1,
                "clip_fusion": ["defs.fusion_type.late",
                                "defs.fusion_method.avg"]},
        "logging": {"save_freq_per_epoch": 1, "level": "logging.INFO",
                    "print_tensors": False, "tensorboard_folder": "tb",
                    "email_notify": None},
    }}
    cfgfile = tmp_path / "run.yml"
    cfgfile.write_text(yaml.safe_dump(cfg))
    run_task.main(str(cfgfile))

    tb = run_folder / "tb" / "train"
    mfile = list(tb.glob("metrics_*.jsonl"))[0]
    lines = [json.loads(l) for l in open(mfile)]
    assert len(lines) == 2  # 4 videos / batch 2 = 2 batches
    assert all(np.isfinite(l["loss"]) for l in lines)
    assert (run_folder / "checkpoints").exists()

    # multi-input fusion also fuses avg/maximum variants
    from video_learning_tpu.tools import plot_metrics
    summary = plot_metrics.summarize(str(mfile))
    assert "loss" in summary
