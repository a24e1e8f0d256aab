"""Prepare the real-media activity-recognition example.

Counterpart of the reference's UCF101-subset example
(/root/reference/examples/data/videos/readme.txt:1 — "a small subset of
the UCF101 dataset", consumed by its activity-recognition example):
unlike examples/activity_recognition (which synthesizes frames so it can
run anywhere), this example exercises the pipeline on REAL video media —
actual UCF101 JPEG frame folders — so decode, packing, training, and
clip->video fused evaluation all run against real-world image statistics.

The media is supplied as a zip (or directory) of per-video frame
folders; class labels come from each folder's UCF-style name
(``v_<Action>_gXX_cYY``).  By default it looks for the UCF101 subset zip
the reference distributes; point --media at any equivalent archive.

Usage: python prepare_real_media.py <workdir> [--media <zip-or-dir>]
Then:  bash run_real_media.sh <workdir>
"""

import argparse
import os
import re
import sys
import zipfile

import numpy as np
import yaml

DEFAULT_MEDIA = "/root/reference/examples/data/videos/videos.zip"
RAW_H, RAW_W = 240, 320   # UCF101 native frame size
CROP = 227                # AlexNet native input
FPC = 4
CPV = 2


def extract_media(media, root):
    """Unpack (or link) the frame folders; returns the videos dir."""
    vdir = os.path.join(root, "videos")
    if os.path.isdir(media):
        if not os.path.isdir(vdir):
            os.symlink(os.path.abspath(media), vdir)
        return vdir
    os.makedirs(vdir, exist_ok=True)
    with zipfile.ZipFile(media) as zf:
        zf.extractall(vdir)
    return vdir


def write_paths_file(vdir, root):
    """One `path label` line per frame folder; labels are assigned per
    distinct UCF action name (v_<Action>_g*_c*) in sorted order."""
    folders = sorted(
        d for d in os.listdir(vdir)
        if os.path.isdir(os.path.join(vdir, d)))
    if not folders:
        sys.exit("no frame folders found under %s" % vdir)
    actions = []
    for d in folders:
        m = re.match(r"v_([A-Za-z0-9]+)_g\d+_c\d+", d)
        actions.append(m.group(1) if m else d)
    classes = sorted(set(actions))
    label = {a: i for i, a in enumerate(classes)}
    paths_file = os.path.join(root, "videos.train")
    with open(paths_file, "w") as fh:
        for d, a in zip(folders, actions):
            fh.write("%s %d\n" % (os.path.join(vdir, d), label[a]))
    return paths_file, len(classes)


def write_pretrained_npy(root):
    """Synthesize a bvlc-schema weights file ({layer: [w, b]}) covering
    the conv stack only — fc6/fc7 are omitted to keep the fixture small
    (absent layers fall back to fresh init, and fc8 is always fresh;
    reference alexnet.py:49-51,273-280.  The shape-mismatch fallback is
    unit-tested in tests/test_models.py::test_alexnet_pretrained_npy_import)."""
    rng = np.random.RandomState(11)
    # bvlc AlexNet conv shapes, spelled out rather than imported from
    # video_learning_tpu.models.alexnet._CONV_SPECS so the prepare step
    # stays a dependency-light script (no jax import); the import-side
    # test derives its fixture from _CONV_SPECS and catches drift
    specs = {"conv1": (11, 11, 3, 96), "conv2": (5, 5, 48, 256),
             "conv3": (3, 3, 256, 384), "conv4": (3, 3, 192, 384),
             "conv5": (3, 3, 192, 256)}
    net_data = {name: [rng.randn(*shp).astype(np.float32) * 0.01,
                       np.full(shp[-1], 0.1, np.float32)]
                for name, shp in specs.items()}
    path = os.path.join(root, "pretrained_convs.npy")
    np.save(path, np.asarray(net_data, dtype=object), allow_pickle=True)
    return path


def write_configs(root, paths_file, num_classes, weights_npy):
    serialize_cfg = {"serialize": {
        "output_folder": None,
        "path_prepend_folder": None,
        "input_files": [paths_file],
        "run_id": "real_media_example",
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
        "run_id": "real_media_example",
        "seed": 7,
        "mesh_shape": {"data": 1},
        "phase": "defs.phase.train",
        "data": {"ucf": {
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
            "num_classes": num_classes,
            "pipelines": [
                {"frames": {
                    "input": "defs.dataset_tag.main",
                    "representation": "defs.representation.dcnn",
                    "frame_encoding_layer": "fc6",
                    # pretrained-import fine-tuning flow (reference
                    # alexnet.py:49-51): conv stack from a bvlc-schema
                    # npy, FCs fresh, fc8 at lr*mult via two-tier groups
                    "weights_file": weights_npy}},
                {"clf": {
                    "input": "frames",
                    "representation": "defs.representation.nop",
                    "classifier": "defs.classifier.lstm",
                    "lstm_params": [64, 1, "defs.fusion_method.avg"]}}]},
        "train": {
            "batch_size": 2, "epochs": 12,
            "optimizer": "defs.optim.sgd", "base_lr": 0.01,
            "lr_mult": 2.0,
            "lr_decay": ["defs.decay.exp", "defs.periodicity.drops",
                         6, 0.9],
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
    run_cfg["run"]["phase"] = "defs.phase.val"
    run_cfg["run"]["resume_file"] = "latest"
    run_cfg["run"]["data"]["ucf"]["phase"] = "defs.phase.val"
    run_cfg["run"]["data"]["ucf"]["imgproc"] = [
        "defs.imgproc.center_crop", "defs.imgproc.sub_mean"]
    with open(os.path.join(root, "val.yml"), "w") as f:
        yaml.safe_dump(run_cfg, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="real_media_example")
    ap.add_argument("--media", default=DEFAULT_MEDIA,
                    help="zip or directory of per-video frame folders "
                         "(default: the reference's UCF101 subset zip)")
    args = ap.parse_args()
    if not os.path.exists(args.media):
        sys.exit("media not found: %s — pass --media <zip-or-dir> with "
                 "UCF-style frame folders" % args.media)
    root = os.path.abspath(args.workdir)
    os.makedirs(root, exist_ok=True)
    vdir = extract_media(args.media, root)
    paths_file, num_classes = write_paths_file(vdir, root)
    weights_npy = write_pretrained_npy(root)
    write_configs(root, paths_file, num_classes, weights_npy)
    print("Prepared %d-class real-media example under %s"
          % (num_classes, root))
    print("Next: bash run_real_media.sh %s" % root)


if __name__ == "__main__":
    main()
