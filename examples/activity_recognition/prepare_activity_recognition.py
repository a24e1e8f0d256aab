"""Prepare a self-contained activity-recognition example.

Counterpart of the reference's examples/activity_recognition/prepare_…py —
but fixed to emit the YAML config the framework actually accepts (the
reference example still writes deprecated .ini config,
prepare_activity_recognition.py:13-31 vs settings_.py:382-383), and made
fully self-contained: instead of requiring the UCF101 zip, it synthesizes a
tiny per-class video set (distinct colored-noise statistics per class) so
the end-to-end run is reproducible anywhere.

Usage: python prepare_activity_recognition.py <workdir>
Then:  bash run_activity_recognition.sh <workdir>
"""

import os
import sys

import numpy as np
import yaml
from PIL import Image

NUM_CLASSES = 4
VIDEOS_PER_CLASS = 2
FRAMES_PER_VIDEO = 12
RAW_H, RAW_W = 120, 160
CROP = 96
FPC = 4
CPV = 2


def synthesize_videos(root):
    lines = []
    rng = np.random.RandomState(0)
    for cls in range(NUM_CLASSES):
        base_color = rng.randint(0, 255, size=(3,))
        for v in range(VIDEOS_PER_CLASS):
            vdir = os.path.join(root, "videos",
                                "class%d_vid%d" % (cls, v))
            os.makedirs(vdir, exist_ok=True)
            for f in range(FRAMES_PER_VIDEO):
                noise = rng.randint(0, 80, (RAW_H, RAW_W, 3))
                frame = np.clip(base_color[None, None, :] * 0.7 + noise,
                                0, 255).astype(np.uint8)
                Image.fromarray(frame).save(
                    os.path.join(vdir, "f_%04d.jpg" % f), quality=95)
            lines.append("%s %d" % (vdir, cls))
    paths_file = os.path.join(root, "videos.train")
    with open(paths_file, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return paths_file


def write_configs(root, paths_file):
    serialize_cfg = {"serialize": {
        "output_folder": None,
        "path_prepend_folder": None,
        "input_files": [paths_file],
        "run_id": "acrec_example",
        "num_threads": 2,
        "num_items_per_thread": 16,
        "raw_image_shape": "(%d, %d, 3)" % (RAW_H, RAW_W),
        "clip_offset_or_num": CPV,
        "num_frames_per_clip": FPC,
        "clipframe_mode": "defs.clipframe_mode.rand_clips",
        "generation_error": "defs.generation_error.compromise",
        "do_shuffle": True,
        "do_serialize": True,
        "do_validate": True,
        "validate_pcnt": 100,
        "frame_format": "jpg",
        "logging_level": "logging.INFO",
        "seed": 7,
    }}
    run_cfg = {"run": {
        "resume_file": None,
        "run_folder": os.path.join(root, "run"),
        "run_id": "acrec_example",
        "seed": 7,
        "mesh_shape": {"data": 1},
        "phase": "defs.phase.train",
        "data": {"acrec": {
            "data_path": paths_file,
            "raw_image_shape": "(%d, %d, 3)" % (RAW_H, RAW_W),
            "image_shape": "(%d, %d, 3)" % (CROP, CROP),
            "mean_image": [104.0, 117.0, 123.0],
            "data_format": "defs.data_format.tfrecord",
            "frame_format": "jpg",
            "imgproc": ["defs.imgproc.rand_crop",
                        "defs.imgproc.rand_mirror",
                        "defs.imgproc.sub_mean"],
            "batch_item": "defs.batch_item.default",
            "phase": "defs.phase.train",
            "tag": "defs.dataset_tag.main"}},
        "network": {
            "num_classes": NUM_CLASSES,
            "pipelines": [
                {"frames": {
                    "input": "defs.dataset_tag.main",
                    "representation": "defs.representation.dcnn",
                    "frame_encoding_layer": "fc6"}},
                {"clf": {
                    "input": "frames",
                    "representation": "defs.representation.nop",
                    "classifier": "defs.classifier.lstm",
                    "lstm_params": [64, 1, "defs.fusion_method.avg"]}}]},
        "train": {
            "batch_size": 4, "epochs": 3,
            "optimizer": "defs.optim.sgd", "base_lr": 0.01,
            "lr_mult": 2.0,
            "lr_decay": ["defs.decay.exp", "defs.periodicity.drops",
                         3, 0.9],
            "clip_norm": 10, "dropout_keep_prob": 0.5},
        "val": {
            "batch_size": 2, "logits_save_interval": -1,
            "clip_fusion": ["defs.fusion_type.late",
                            "defs.fusion_method.avg"]},
        "logging": {
            "save_freq_per_epoch": 1, "level": "logging.INFO",
            "print_tensors": False, "tensorboard_folder": "tb",
            "email_notify": None},
    }}
    with open(os.path.join(root, "serialize.yml"), "w") as f:
        yaml.safe_dump(serialize_cfg, f)
    with open(os.path.join(root, "train.yml"), "w") as f:
        yaml.safe_dump(run_cfg, f)
    # validation config: same run, val phase, resume latest
    run_cfg["run"]["phase"] = "defs.phase.val"
    run_cfg["run"]["resume_file"] = "latest"
    run_cfg["run"]["data"]["acrec"]["phase"] = "defs.phase.val"
    run_cfg["run"]["data"]["acrec"]["imgproc"] = [
        "defs.imgproc.center_crop", "defs.imgproc.sub_mean"]
    with open(os.path.join(root, "val.yml"), "w") as f:
        yaml.safe_dump(run_cfg, f)


def main():
    root = os.path.abspath(sys.argv[1] if len(sys.argv) > 1
                           else "acrec_example")
    os.makedirs(root, exist_ok=True)
    paths_file = synthesize_videos(root)
    write_configs(root, paths_file)
    print("Prepared example under %s" % root)
    print("Next: bash run_activity_recognition.sh %s" % root)


if __name__ == "__main__":
    main()
