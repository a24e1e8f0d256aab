"""The shipped examples' prepare stages and the real-media decode path.

The real-media example (examples/real_media) is the only place the
pipeline meets actual photographic JPEG frames (the reference bundles a
UCF101 subset for the same purpose, /root/reference/examples/data/videos/
readme.txt:1); this test packs those real frames and decodes a batch
through the Dataset reader.  The full convergence runs are recorded in
BASELINE.md (accuracy/caption anchors) and exercised by the run_*.sh
drivers, which are too slow for the suite.
"""

import os
import runpy
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
UCF_ZIP = "/root/reference/examples/data/videos/videos.zip"


def _run_script(relpath, argv):
    old = sys.argv
    sys.argv = [relpath] + argv
    try:
        runpy.run_path(os.path.join(REPO, relpath), run_name="__main__")
    finally:
        sys.argv = old


@pytest.mark.skipif(not os.path.exists(UCF_ZIP),
                    reason="UCF101 subset media not available")
def test_real_media_pack_and_decode(tmp_path):
    work = str(tmp_path / "rm")
    _run_script("examples/real_media/prepare_real_media.py",
                [work, "--media", UCF_ZIP])
    # labels: one line per frame folder, UCF action-name classes
    lines = open(os.path.join(work, "videos.train")).read().splitlines()
    assert len(lines) == 2
    labels = sorted(int(l.rsplit(" ", 1)[1]) for l in lines)
    assert labels == [0, 1]

    from video_learning_tpu.data import serialize as ser
    ser.main(["serialize", os.path.join(work, "serialize.yml")])
    packed = lines[0].rsplit("/", 2)[0]  # workdir/videos
    base = os.path.join(work, "videos.train")
    assert os.path.exists(base + ".tfrecord")

    # decode a real batch through the runtime reader
    from video_learning_tpu.data.dataset import Dataset
    from video_learning_tpu.defs import defs
    d = Dataset()
    d.initialize("ucf", base, [104.0, 117.0, 123.0], None,
                 (227, 227, 3),
                 [defs.imgproc.center_crop, defs.imgproc.sub_mean],
                 (240, 320, 3), defs.data_format.tfrecord, "jpg",
                 defs.batch_item.default, 2, defs.dataset_tag.main, 1)
    d.calculate_batches(2, defs.input_mode.video)
    batch = d.get_next_batch()
    frames = np.asarray(batch.visual)
    # 2 videos x 2 cpv x 4 fpc of real 227-crops, mean-subtracted float
    assert frames.shape == (2 * 2 * 4, 227, 227, 3)
    # photographic content, not noise: nontrivial dynamic range and
    # spatial structure (neighboring-pixel correlation)
    assert frames.std() > 10.0
    a = frames[0, :, :-1, 0] - frames[0, :, 1:, 0]
    assert np.abs(a).mean() < frames[0].std()  # smooth locally


def test_captioning_example_prepare(tmp_path):
    work = str(tmp_path / "cap")
    _run_script("examples/captioning/prepare_captioning.py", [work])
    for f in ("caps.train", "v.vocab", "v.vocab.embeddings", "gt.json",
              "serialize.yml", "train.yml", "val.yml"):
        assert os.path.exists(os.path.join(work, f)), f
    vocab = open(os.path.join(work, "v.vocab")).read().split()
    assert vocab[-3:] == ["UNK", "EOS", "BOS"]


def test_acrec_multiclass_fast_anchor_end_to_end(tmp_path):
    """The multi-class anchor's regression-detection power, in-suite
    (BASELINE.md "multi-class accuracy anchor"): the reduced --fast
    variant through the REAL CLI chain (pack -> train -> held-out val)
    must land top-1 in the mid band — eval-chain bugs crater it, while
    nothing can push it to 1.0 (the orientation dimension's per-video
    amplitude draw makes the ceiling structural) — and the injected
    clip-fusion fencepost (check_sensitivity) must MOVE it."""
    work = str(tmp_path / "amcf")
    _run_script("examples/acrec_multiclass/prepare_acrec_multiclass.py",
                [work, "--media", "none", "--fast"])
    from video_learning_tpu.data import serialize as ser
    ser.main(["serialize", os.path.join(work, "serialize.yml")])
    from video_learning_tpu import run_task
    run_task.main(os.path.join(work, "train.yml"))
    run_task.main(os.path.join(work, "val.yml"))
    acc_path = os.path.join(work, "run",
                            "accuracy_acrec_multiclass_val_resume")
    top1 = float(open(acc_path).read())
    top5 = float(open(os.path.join(
        work, "run", "accuracy_top5_acrec_multiclass_val_resume")).read())
    assert 0.30 <= top1 <= 0.98, top1
    assert top5 >= top1
    # regression-detection power: the injected fusion fencepost must
    # move top-1 (check_sensitivity exits nonzero if it does not, and
    # restores the clean artifacts afterwards)
    _run_script("examples/acrec_multiclass/check_sensitivity.py", [work])
    assert float(open(acc_path).read()) == top1  # clean values restored


def test_acrec_multiclass_prepare(tmp_path, monkeypatch):
    """The multi-class accuracy anchor's prepare stage (BASELINE.md
    "multi-class accuracy anchor"): class-conditional splits with
    DISJOINT held-out val videos, a 4x2 hue-x-orientation class grid,
    and the bvlc-scale pretrained init the anchor fine-tunes from."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "prep_amc", os.path.join(
            REPO, "examples/acrec_multiclass/prepare_acrec_multiclass.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # shrink the video counts for the suite; the class grid stays full
    monkeypatch.setattr(mod, "TRAIN_VPC", 1)
    monkeypatch.setattr(mod, "VAL_VPC", 1)
    work = str(tmp_path / "amc")
    monkeypatch.setattr(sys, "argv",
                        ["prep", work, "--media", "none"])
    mod.main()

    train = open(os.path.join(work, "videos.train")).read().splitlines()
    val = open(os.path.join(work, "videos.val")).read().splitlines()
    assert len(train) == mod.NUM_SYNTH_CLASSES
    assert len(val) == mod.NUM_SYNTH_CLASSES
    # val videos are held out (no path overlap with train)
    tpaths = {l.rsplit(" ", 1)[0] for l in train}
    vpaths = {l.rsplit(" ", 1)[0] for l in val}
    assert not (tpaths & vpaths)
    # one video per class in each split here
    assert sorted(int(l.rsplit(" ", 1)[1]) for l in train) == \
        list(range(mod.NUM_SYNTH_CLASSES))
    # class-conditional signal: same-class videos from the two splits
    # are closer in mean color than cross-class pairs
    import numpy as np
    from PIL import Image as PILImage

    def mean_rgb(line):
        d = line.rsplit(" ", 1)[0]
        f = sorted(os.listdir(d))[0]
        return np.asarray(
            PILImage.open(os.path.join(d, f)), np.float64).mean((0, 1))
    t0, v0 = mean_rgb(train[0]), mean_rgb(val[0])
    v4 = mean_rgb(val[4])  # different hue group (class 4 = hue 2)
    assert np.abs(t0 - v0).sum() < np.abs(t0 - v4).sum()
    # the bvlc-schema init exists and matches the model's spec table
    net = np.load(os.path.join(work, "pretrained_convs.npy"),
                  allow_pickle=True).item()
    from video_learning_tpu.models.alexnet import _CONV_SPECS
    for name, (kh, kw, cin, cout, _, _) in _CONV_SPECS.items():
        assert net[name][0].shape == (kh, kw, cin, cout)
    assert "fc6" in net
    for f in ("serialize.yml", "train.yml", "val.yml"):
        assert os.path.exists(os.path.join(work, f))
