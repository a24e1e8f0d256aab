"""Prepare a self-contained image-captioning example.

The reference's imgdesc workflow shape (SURVEY §2.25 frames_imgdesc:
``path vocab-index...`` label lines, a ``.vocab`` file with UNK/EOS/BOS,
GloVe-style ``.embeddings``, and a COCO-format ground-truth json for
evaluation) on synthesized images: each image's caption describes its
dominant color/texture class, so overfitting the tiny set to a high
BLEU/CIDEr validates the full caption chain — conditioning, teacher-forced
training, greedy feedback decode, id recovery, and the coco metrics.

Like the reference's imgdesc workflow, the encoder starts from a
bvlc-schema weights file (synthesized here at bvlc-like scales) and
fine-tunes under two-tier LR.  This is load-bearing, not cosmetic: a
from-scratch AlexNet's ReLU activations reach O(1e4) at fc6, so the
state_bias conditioning (raw mapped vector as the LSTM's (c, h), same
as the reference's get_state_tuple) saturates every tanh to a sign
pattern that coincides across images — decode collapses to ONE caption
for all images while the teacher-forced loss settles exactly at the
ignore-the-image entropy floor ((log3 + log2)/5 ~= 0.358 on these
captions).  Only the decoded strings reveal it.  Pretrained-scale convs
keep fc6 activations O(1), exactly the regime the reference's
fine-tuning recipe assumes.

Usage: python prepare_captioning.py <workdir>
Then:  bash run_captioning.sh <workdir>
"""

import json
import os
import sys

import numpy as np
import yaml
from PIL import Image

WORDS = ["a", "red", "green", "blue", "dog", "cat", "bird", "runs",
         "sits", "flies"]
VOCAB = WORDS + ["UNK", "EOS", "BOS"]
CAPTIONS = {  # image id -> caption as WORDS indexes
    1: [0, 1, 4, 7],    # a red dog runs
    2: [0, 2, 5, 8],    # a green cat sits
    3: [0, 3, 6, 9],    # a blue bird flies
    4: [0, 1, 5, 8],    # a red cat sits
    5: [0, 2, 6, 9],    # a green bird flies
    6: [0, 3, 4, 7],    # a blue dog runs
}
# the ROBUST variant (BASELINE.md "caption anchor pair"): three combos
# whose captions are fully determined by the image's COLOR — the one
# dimension the synthesized encoder conditions on perfectly — each
# synthesized FOUR times as independent noise instances (12 images).
# Training converges to exact captions for every image (metrics
# saturate), putting the optimum deep inside its basin: the metrics are
# invariant to fp reassociation — verified by re-running under the
# accum_steps sum-formulation, which reassociates the whole backward
# pass (BASELINE.md "anchor-drift forensics") — unlike the deliberately
# knife-edge 6-image anchor.  Designs whose captions additionally hinge
# on the texture dimension were tried and REJECTED for this role: the
# teacher-forced loss learns texture partially but the free-running
# decode collapses it to a per-color mode whose identity IS
# fp-reassociation-sensitive (measured: Bleu_4 0.595 vs 0.867 between
# the mean- and sum-formulations of the same training run).
ROBUST_CAPTIONS = {}
for _rep in range(4):
    for _c in range(3):
        ROBUST_CAPTIONS[1 + len(ROBUST_CAPTIONS)] = \
            [0, 1 + _c, 4 + _c, 7 + _c]
RAW, CROP = 112, 96
EPOCHS = 200
ROBUST_EPOCHS = 300
ROBUST_LSTM = 64


def synthesize(root, captions=None):
    captions = CAPTIONS if captions is None else captions
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    lines = []
    for iid, lab in captions.items():
        # dominant color from the color word, texture from the animal
        color = {1: (200, 40, 40), 2: (40, 200, 40),
                 3: (40, 40, 200)}[lab[1]]
        base = np.tile(np.asarray(color, np.float32), (RAW, RAW, 1))
        noise = rng.randn(RAW, RAW, 3) * (10 + 15 * (lab[2] - 4))
        img = np.clip(base + noise, 0, 255).astype(np.uint8)
        p = os.path.join(img_dir, "img_%04d.jpg" % iid)
        Image.fromarray(img).save(p, quality=95)
        lines.append("%s %s" % (p, " ".join(map(str, lab))))
    paths_file = os.path.join(root, "caps.train")
    with open(paths_file, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    with open(os.path.join(root, "v.vocab"), "w") as fh:
        fh.write("\n".join(VOCAB) + "\n")
    emb = ["%s\t%s" % (w, " ".join("%.5f" % x for x in rng.randn(16)))
           for w in VOCAB]
    with open(os.path.join(root, "v.vocab.embeddings"), "w") as fh:
        fh.write("\n".join(emb) + "\n")

    gt = {"images": [{"id": i, "file_name": "img_%04d.jpg" % i}
                     for i in captions],
          "annotations": [{"image_id": i,
                           "caption": " ".join(WORDS[k] for k in lab)}
                          for i, lab in captions.items()]}
    with open(os.path.join(root, "gt.json"), "w") as fh:
        json.dump(gt, fh)
    return paths_file


def write_pretrained_npy(root):
    """Synthesize a bvlc-schema weights file at bvlc-like activation
    scales — conv stack AND fc6, like the real bvlc_alexnet.npy the
    reference fine-tunes from (its fresh-init path is only ever used for
    fc8).  fc6 is sized for this example's 96x96 crop and scaled so the
    encoder output lands in O(1) — the regime where the state_bias tanh
    stays differentiable (see module docstring)."""
    from video_learning_tpu.models.alexnet import (_CONV_SPECS,
                                                   conv_output_flat_dim)
    rng = np.random.RandomState(11)
    # kernel shapes come from the SAME table alexnet.init validates
    # against — a drifted inline copy would silently fail the
    # shape-match and fall back to fresh-init convs
    specs = {name: (kh, kw, cin, cout)
             for name, (kh, kw, cin, cout, _, _) in _CONV_SPECS.items()}
    net_data = {name: [rng.randn(*shp).astype(np.float32) * 0.01,
                       np.full(shp[-1], 0.1, np.float32)]
                for name, shp in specs.items()}
    fc6_in = conv_output_flat_dim((CROP, CROP, 3))
    net_data["fc6"] = [rng.randn(fc6_in, 4096).astype(np.float32) * 3e-5,
                       np.zeros(4096, np.float32)]
    path = os.path.join(root, "pretrained_convs.npy")
    np.save(path, np.asarray(net_data, dtype=object), allow_pickle=True)
    return path


def write_configs(root, paths_file, run_id="cap_example",
                  epochs=EPOCHS, num_items=6, lstm_hidden=32):
    pack = {"serialize": {
        "output_folder": None, "path_prepend_folder": None,
        "input_files": [paths_file], "run_id": run_id,
        "num_threads": 2, "num_items_per_thread": num_items,
        "raw_image_shape": "(%d, %d, 3)" % (RAW, RAW),
        "clip_offset_or_num": 1, "num_frames_per_clip": 1,
        "clipframe_mode": "defs.clipframe_mode.iterative",
        "generation_error": "defs.generation_error.compromise",
        "do_shuffle": False, "do_serialize": True, "do_validate": True,
        "validate_pcnt": 100, "frame_format": "jpg",
        "logging_level": "logging.INFO", "seed": 1}}
    run_cfg = {"run": {
        "resume_file": None,
        "run_folder": os.path.join(root, "run"),
        "run_id": run_id,
        "seed": 5,
        "mesh_shape": {"data": 1},
        "compute_dtype": "float32",
        "phase": "defs.phase.train",
        "data": {"caps": {
            "data_path": paths_file,
            "raw_image_shape": "(%d, %d, 3)" % (RAW, RAW),
            "image_shape": "(%d, %d, 3)" % (CROP, CROP),
            "mean_image": [99.2, 105.3, 109.5],
            "data_format": "defs.data_format.tfrecord",
            "frame_format": "jpg",
            "imgproc": ["defs.imgproc.center_crop",
                        "defs.imgproc.sub_mean"],
            "batch_item": "defs.batch_item.default",
            "phase": "defs.phase.train",
            "tag": "defs.dataset_tag.main"}},
        "network": {
            "num_classes": len(VOCAB),
            "pipelines": [
                {"enc": {"input": "defs.dataset_tag.main",
                         "representation": "defs.representation.dcnn",
                         "frame_encoding_layer": "fc6",
                         "weights_file": os.path.join(
                             root, "pretrained_convs.npy")}},
                {"capt": {"input": "enc",
                          "representation": "defs.representation.nop",
                          "classifier": "defs.classifier.lstm",
                          "lstm_params": [lstm_hidden, 1,
                                          "defs.fusion_method.avg"]}}]},
        "train": {"batch_size": 3, "epochs": epochs,
                  "optimizer": "defs.optim.adam", "base_lr": 0.0003,
                  "lr_mult": 30.0, "lr_decay": None, "clip_norm": 5,
                  "dropout_keep_prob": 1.0},
        "val": {"batch_size": 3, "logits_save_interval": -1,
                "clip_fusion": ["defs.fusion_type.late",
                                "defs.fusion_method.avg"]},
        "captioning": {
            "caption_search": "defs.caption_search.max",
            "eval_type": "defs.eval_type.coco",
            "caption_ground_truth": os.path.join(root, "gt.json"),
            "word_embeddings_file": os.path.join(root,
                                                 "v.vocab.embeddings")},
        "logging": {"save_freq_per_epoch": 0.1, "level": "logging.INFO",
                    "print_tensors": False, "tensorboard_folder": "tb",
                    "email_notify": None},
    }}
    with open(os.path.join(root, "serialize.yml"), "w") as f:
        yaml.safe_dump(pack, f)
    with open(os.path.join(root, "train.yml"), "w") as f:
        yaml.safe_dump(run_cfg, f)
    run_cfg["run"]["phase"] = "defs.phase.val"
    run_cfg["run"]["resume_file"] = "latest"
    run_cfg["run"]["data"]["caps"]["phase"] = "defs.phase.val"
    with open(os.path.join(root, "val.yml"), "w") as f:
        yaml.safe_dump(run_cfg, f)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="captioning_example")
    ap.add_argument("--variant", choices=("sensitive", "robust"),
                    default="sensitive",
                    help="sensitive: the deliberately knife-edge 6-image "
                         "anchor; robust: 12 images + %d epochs, metrics "
                         "converged deep inside the basin (fp-"
                         "reassociation invariant)" % ROBUST_EPOCHS)
    args = ap.parse_args()
    root = os.path.abspath(args.workdir)
    os.makedirs(root, exist_ok=True)
    if args.variant == "robust":
        paths_file = synthesize(root, ROBUST_CAPTIONS)
        write_pretrained_npy(root)
        write_configs(root, paths_file, run_id="cap_robust",
                      epochs=ROBUST_EPOCHS,
                      num_items=len(ROBUST_CAPTIONS),
                      lstm_hidden=ROBUST_LSTM)
    else:
        paths_file = synthesize(root)
        write_pretrained_npy(root)
        write_configs(root, paths_file)
    print("Prepared %s captioning example under %s"
          % (args.variant, root))
    print("Next: bash run_captioning.sh %s" % root)


if __name__ == "__main__":
    main()
