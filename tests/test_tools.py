"""Tests for the ops/analysis tooling layer (SURVEY §2.17-2.23)."""

import os
import pickle
import wave

import numpy as np
import pytest

from video_learning_tpu.data import records


@pytest.fixture
def packed_images(tmp_path):
    path = str(tmp_path / "d.tfrecord")
    rng = np.random.RandomState(0)
    with records.RecordWriter(path) as w:
        for i in range(6):
            img = rng.randint(0, 255, (8, 10, 3), np.uint8)
            w.write(records.encode_image_example(img, i % 3))
    records.write_size_file(6, None, path, "image", 1, None)
    return path


def test_compute_image_mean(tmp_path, packed_images):
    from video_learning_tpu.tools import compute_image_mean as cim
    means = cim.main(["prog", packed_images])
    assert len(means) == 3
    assert os.path.exists(packed_images + ".mean.pickle")
    txt = open(packed_images + ".mean.txt").read().split()
    assert len(txt) == 3
    # verify against direct computation
    r = records.RecordReader(packed_images)
    acc = np.mean([r.read_at(i)[1] for i in range(6)], axis=(0, 1, 2))
    assert np.allclose(means, acc, atol=1e-6)


def test_check_serialized_data(packed_images):
    from video_learning_tpu.tools import check_serialized_data as csd
    out = csd.check(packed_images)
    assert out["count"] == 6
    assert out["shapes"] == {(8, 10, 3): 6}


def test_check_serialized_data_mismatch(tmp_path, packed_images):
    from video_learning_tpu.tools import check_serialized_data as csd
    from video_learning_tpu.utils import FrameworkError
    records.write_size_file(99, None, packed_images, "image", 1, None)
    with pytest.raises(FrameworkError):
        csd.check(packed_images)


def test_examine_dataset(tmp_path):
    from video_learning_tpu.tools import examine_dataset as ed
    p = tmp_path / "paths.txt"
    p.write_text("a 0\nb 0\nc 1\nd 0\n")
    stats = ed.examine(str(p))
    assert stats["items"] == 4
    assert stats["majority_class"] == 0
    assert stats["zeror_accuracy"] == pytest.approx(0.75)


def test_compute_evaluation_stats():
    from video_learning_tpu.tools.compute_evaluation_stats import prf1
    preds = [0, 0, 1, 1, 2]
    labels = [0, 1, 1, 1, 2]
    stats = prf1(preds, labels, 3)
    assert stats["accuracy"] == pytest.approx(0.8)
    assert stats["per_class"]["precision"][0] == pytest.approx(0.5)
    assert stats["per_class"]["recall"][1] == pytest.approx(2 / 3)
    assert stats["micro"]["f1"] == pytest.approx(0.8)


def test_view_logits_info(tmp_path):
    from video_learning_tpu.tools import view_logits_info as vli
    logits = np.zeros((5, 3), np.float32)
    logits[:3, 1] = 1.0
    logits[3:, 2] = 1.0
    p = tmp_path / "l.pickle"
    with open(p, "wb") as f:
        pickle.dump(logits, f)
    out = vli.view(str(p))
    assert out["rle"] == [(1, 3), (2, 2)]
    assert out["histogram"] == {1: 3, 2: 2}


def test_inspect_and_modify_checkpoint(tmp_path):
    from video_learning_tpu import checkpoint as ck
    from video_learning_tpu.tools import modify_checkpoint as mc
    state = {"params": {"fc": {"w": np.ones((2, 3)), "b": np.zeros(3)}},
             "step": np.asarray(7)}
    src = str(tmp_path / "a.ckpt")
    ck.save_checkpoint(src, state)
    with open(src + ".snap", "wb") as f:
        pickle.dump([1, 2, 3], f)
    names = ck.get_checkpoint_tensor_names(src)
    assert "params/fc/w" in names and "step" in names

    dst = str(tmp_path / "b.ckpt")
    mc.modify(src, dst,
              deletes=["step"],
              renames=[("params/fc/b", "params/fc/bias")],
              regex_renames=[(r"^params/", "model/")],
              creates=[("model/extra", "4,4")])
    flat = ck.load_flat(dst)
    assert "step" not in flat
    assert "model/fc/bias" in flat
    assert "model/fc/w" in flat
    assert flat["model/extra"].shape == (4, 4)
    assert os.path.exists(dst + ".snap")


def test_combine_logits_sweep(tmp_path):
    from video_learning_tpu.tools import combine_logits as cl
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 4, 20)
    # run1 perfect, run2 random
    l1 = np.eye(4)[labels] * 5.0
    l2 = rng.randn(20, 4)
    p1, p2 = tmp_path / "validation_a.pickle", tmp_path / "validation_b.pickle"
    pickle.dump(l1, open(p1, "wb"))
    pickle.dump(l2, open(p2, "wb"))
    gt = tmp_path / "gt.txt"
    gt.write_text("\n".join("vid%d %d" % (i, l)
                            for i, l in enumerate(labels)) + "\n")
    sweep = cl.combine([str(p1), str(p2)], [str(gt), str(gt)])
    # w=1 (all run1) must be perfect
    best = dict(((w1, w2), a) for w1, w2, a in sweep)
    assert best[(1.0, 0.0)] == pytest.approx(1.0)
    assert best[(0.0, 1.0)] < 1.0


def test_combine_logits_alignment(tmp_path):
    from video_learning_tpu.tools import combine_logits as cl
    # class maps: run uses (b=0, a=1); alignment uses (a=0, b=1)
    lblmap = tmp_path / "cls.txt"
    lblmap.write_text("b 0\na 1\n")
    align = tmp_path / "align.txt"
    align.write_text("a 0\nb 1\n")
    logits = np.asarray([[9.0, 1.0], [1.0, 9.0]])  # pred: b, a (old idx)
    labels = np.asarray([0, 1])  # b, a in old indexing
    new_logits, new_labels = cl.align_to(
        logits, labels, cl.load_class_map(str(lblmap))[1],
        cl.load_class_map(str(align))[0])
    # label b -> new idx 1; a -> 0
    assert new_labels.tolist() == [1, 0]
    # logit columns reordered so argmax still matches the labels
    assert np.argmax(new_logits, 1).tolist() == [1, 0]


def test_combine_logits_intersect(tmp_path):
    from video_learning_tpu.tools import combine_logits as cl
    l1 = np.eye(3)[[0, 1, 2]] * 2.0
    l2 = np.eye(3)[[1, 2]] * 2.0
    vids = [["a", "b", "c"], ["b", "c"]]
    labels = [np.asarray([0, 1, 2]), np.asarray([1, 2])]
    pair, common = cl.intersect_runs(vids, labels, [l1, l2])
    assert common.tolist() == [1, 2]
    assert pair[0].shape == (2, 3) and pair[1].shape == (2, 3)


def test_combine_runs(tmp_path):
    from video_learning_tpu.tools import combine_runs as cr
    # pack a video dataset: 3 items x 2 cpv x 2 fpc
    path = str(tmp_path / "d.tfrecord")
    labels_per_item = [0, 1, 2]
    with records.RecordWriter(path) as w:
        for item, lab in enumerate(labels_per_item):
            for _ in range(4):  # 2 clips x 2 frames
                img = np.full((4, 4, 3), item, np.uint8)
                w.write(records.encode_image_example(img, lab))
    records.write_size_file(3, [2, 2, 2], path, "video", 1, 2)

    run1 = tmp_path / "run1"
    run1.mkdir()
    good = np.eye(3)[labels_per_item] * 3.0
    pickle.dump(good, open(run1 / "validation_logits_x.total", "wb"))
    run2 = tmp_path / "run2"
    run2.mkdir()
    bad = np.eye(3)[[1, 2, 0]] * 1.0
    pickle.dump(bad, open(run2 / "validation_logits_x.total", "wb"))

    results = cr.combine([str(run1), str(run2)], path, 3)
    assert results["amean"] == pytest.approx(1.0)
    assert "softmax_amean" in results
    assert results["mean_of_run_accuracies"] == pytest.approx(0.5)


def test_lr_calc():
    from video_learning_tpu.tools import lr_calc
    lrs = lr_calc.project(0.1, 10, 2, ["staircase", "interval", 5, 0.5],
                          every=5)
    assert len(lrs) == 20
    assert lrs[0] == pytest.approx(0.1)
    assert lrs[5] == pytest.approx(0.05)
    assert lrs[10] == pytest.approx(0.025)


def test_caption_vocab_tools(tmp_path):
    from video_learning_tpu.tools import caption_vocab_tools as cvt
    vocab = tmp_path / "v.vocab"
    vocab.write_text("a\ndog\nUNK\nEOS\nBOS\n")
    enc = tmp_path / "enc.txt"
    enc.write_text("img.jpg 0 1\n")
    out = cvt.annotation_to_words(str(vocab), str(enc))
    assert out == [("img.jpg", "a dog")]
    txt = tmp_path / "caps.txt"
    txt.write_text("img.jpg a dog zebra\n")
    out = cvt.words_to_vocab_indexes(str(vocab), str(txt))
    assert out == [("img.jpg", [0, 1, 2])]  # zebra -> UNK (2)


def test_audio_spectrograms(tmp_path):
    from video_learning_tpu.audio import spectrograms as sp
    # synthesize a 2.5-second 440Hz wav
    rate = 8000
    t = np.arange(int(2.5 * rate)) / rate
    sig = (np.sin(2 * np.pi * 440 * t) * 2000).astype(np.int16)
    wav_path = tmp_path / "tone.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(sig.tobytes())
    target, count = sp.generate_spectrogram_frames(
        str(wav_path), str(tmp_path / "specs"), window_sec=1.0)
    assert count == 2  # two full 1s windows in 2.5s
    from PIL import Image
    files = sorted(os.listdir(target))
    img = np.asarray(Image.open(os.path.join(target, files[0])))
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.dtype == np.uint8


def test_read_audio_mp3_via_decoder_stub(tmp_path, monkeypatch):
    """Non-wav input shells out to ffmpeg/avconv; validated with a stub
    decoder that writes a known wav (the image has no real mp3 codec)."""
    from video_learning_tpu.audio import spectrograms as sp
    rate = 8000
    sig = (np.sin(np.arange(rate) / rate * 2 * np.pi * 220) * 1000) \
        .astype(np.int16)
    golden = tmp_path / "golden.wav"
    with wave.open(str(golden), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(sig.tobytes())
    bindir = tmp_path / "bin"
    bindir.mkdir()
    stub = bindir / "ffmpeg"
    # ffmpeg -y -v error -i <in> -acodec pcm_s16le <out>: copy the golden
    stub.write_text("#!/bin/sh\ncp %s \"$8\"\n" % golden)
    stub.chmod(0o755)
    monkeypatch.setenv("PATH", "%s:%s" % (bindir, os.environ["PATH"]))
    fake_mp3 = tmp_path / "tone.mp3"
    fake_mp3.write_bytes(b"\xff\xfbnot-really-mp3")
    data, r = sp.read_audio(str(fake_mp3))
    ref, _ = sp.read_wav(str(golden))
    assert r == rate and np.allclose(data, ref)


def test_read_audio_requires_decoder(tmp_path, monkeypatch):
    from video_learning_tpu.audio import spectrograms as sp
    from video_learning_tpu.utils import FrameworkError
    monkeypatch.setenv("PATH", str(tmp_path))  # no ffmpeg/avconv
    with pytest.raises(FrameworkError, match="ffmpeg"):
        sp.read_audio(str(tmp_path / "x.mp3"))


def test_postproc_folders(tmp_path):
    from video_learning_tpu.audio import postproc_folders as pp
    base = tmp_path / "specs"
    for sub in ("fold_a", "fold_b"):
        (base / sub).mkdir(parents=True)
    (base / "fold_a" / "clip1.avi").mkdir()
    (base / "fold_a" / "clip1.avi" / "f0.png").write_bytes(b"x")
    (base / "fold_b" / "clip2.avi").mkdir()
    assert pp.flatten_one_level(str(base)) == 2
    assert sorted(os.listdir(base)) == ["clip1.avi", "clip2.avi"]
    assert pp.strip_extension(str(base), ".avi") == 2
    assert sorted(os.listdir(base)) == ["clip1", "clip2"]
    assert os.path.exists(base / "clip1" / "f0.png")


def test_evaluate_multiple_checkpoints_filter():
    from video_learning_tpu.tools import evaluate_multiple_checkpoints as emc
    ckpts = ["x/170101_ep_1_btch_2_gs_2.ckpt",
             "x/170102_ep_2_btch_2_gs_4.ckpt",
             "x/170103_ep_3_btch_2_gs_6.ckpt"]
    assert emc.filter_checkpoints(ckpts, only=[2]) == [ckpts[1]]
    assert emc.filter_checkpoints(ckpts, omit=[2]) == [ckpts[0], ckpts[2]]
    assert emc.checkpoint_epoch(ckpts[2]) == 3


def test_export_tfrecord_roundtrip(tmp_path):
    """VLR -> TFRecord export parses with the REAL TF proto parser and
    matches the reference serializer's schema for both record kinds."""
    tf = pytest.importorskip("tensorflow")
    from tensorflow.core.example import example_pb2
    from video_learning_tpu.tools.export_tfrecord import convert
    rng = np.random.RandomState(3)
    vlr = str(tmp_path / "packed.tfrecord")
    imgs = [rng.randint(0, 255, (5, 4, 3), np.uint8) for _ in range(2)]
    vec = rng.randn(8).astype(np.float32)
    with records.RecordWriter(vlr) as w:
        for i, img in enumerate(imgs):
            w.write(records.encode_image_example(img, [i]))
        w.write(records.encode_vector_example(vec, [7, 9]))
    out_path, count = convert(vlr)
    assert count == 3
    parsed = []
    for raw in tf.data.TFRecordDataset(out_path).as_numpy_iterator():
        ex = example_pb2.Example()
        ex.ParseFromString(raw)
        parsed.append(ex.features.feature)
    assert len(parsed) == 3
    for i, img in enumerate(imgs):
        f = parsed[i]
        assert list(f["label"].int64_list.value) == [i]
        got = np.frombuffer(f["image_raw"].bytes_list.value[0],
                            np.uint8).reshape(
            f["height"].int64_list.value[0],
            f["width"].int64_list.value[0],
            f["depth"].int64_list.value[0])
        assert np.array_equal(got, img)
    f = parsed[2]
    assert f["dimension"].int64_list.value[0] == 8
    assert list(f["label"].int64_list.value) == [7, 9]
    assert np.allclose(
        np.frombuffer(f["vector_raw"].bytes_list.value[0], np.float32), vec)


def test_import_tfrecord(tmp_path):
    """Reference-format TFRecords convert into readable VLR files."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.RandomState(0)
    in_path = str(tmp_path / "ref.tfrecord")
    imgs = [rng.randint(0, 255, (6, 7, 3), np.uint8) for _ in range(3)]
    with tf.io.TFRecordWriter(in_path) as w:
        for i, img in enumerate(imgs):
            feats = {
                "height": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[6])),
                "width": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[7])),
                "depth": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[3])),
                "label": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[i, i + 1])),
                "image_raw": tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[img.tobytes()])),
            }
            w.write(tf.train.Example(features=tf.train.Features(
                feature=feats)).SerializeToString())
    records.write_size_file(3, None, in_path, "image", 2, None)
    from video_learning_tpu.tools.import_tfrecord import convert
    out_path, count = convert(in_path)
    assert count == 3
    r = records.RecordReader(out_path, verify=True)
    for i in range(3):
        kind, img, lab = r.read_at(i)
        assert np.array_equal(img, imgs[i])
        assert lab == [i, i + 1]
    assert os.path.exists(out_path + ".size")


def test_export_tfrecord_pure_python_framing(tmp_path):
    """The no-TF fallback framing (slice-by-8 masked CRC32C + length
    header) must parse with the real TF record reader."""
    tf = pytest.importorskip("tensorflow")
    from video_learning_tpu.tools.export_tfrecord import (_crc32c,
                                                          write_tfrecord)
    # standard CRC32C vectors (RFC 3720)
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    p = tmp_path / "manual.tfrecord"
    payloads = [b"alpha", b"b" * 3000, bytes(range(256))]
    with open(p, "wb") as fh:
        for pay in payloads:
            write_tfrecord(fh, pay)
    got = list(tf.data.TFRecordDataset(str(p)).as_numpy_iterator())
    assert got == payloads


def test_combine_logits_three_way(tmp_path):
    """N-way simplex sweep + 3-run intersection (reference loads >=2 sets,
    combine_logits.py:248-305; the sweep generalizes its 2-way table)."""
    from video_learning_tpu.tools import combine_logits as cl
    rng = np.random.RandomState(3)
    labels = rng.randint(0, 4, 15)
    perfect = np.eye(4)[labels] * 5.0
    noisy1 = rng.randn(15, 4)
    noisy2 = rng.randn(15, 4)
    paths, gts = [], []
    for i, lg in enumerate((perfect, noisy1, noisy2)):
        p = tmp_path / ("v%d.pickle" % i)
        pickle.dump(lg, open(p, "wb"))
        paths.append(str(p))
        gt = tmp_path / ("gt%d.txt" % i)
        gt.write_text("\n".join("vid%d %d" % (j, l)
                                for j, l in enumerate(labels)) + "\n")
        gts.append(str(gt))
    sweep = cl.combine(paths, gts)
    # the full step-0.1 3-simplex has C(12,2) = 66 weight triples
    assert len(sweep) == 66
    table = {row[:-1]: row[-1] for row in sweep}
    assert table[(1.0, 0.0, 0.0)] == pytest.approx(1.0)
    assert all(len(row) == 4 for row in sweep)
    assert all(abs(sum(row[:-1]) - 1.0) < 1e-9 for row in sweep)

    # 3-run intersection: only vids common to ALL runs survive
    vids = [["a", "b", "c", "d"], ["b", "c", "d"], ["c", "b"]]
    labs = [np.asarray([0, 1, 2, 3]), np.asarray([1, 2, 3]),
            np.asarray([2, 1])]
    lgs = [np.eye(4)[[0, 1, 2, 3]], np.eye(4)[[1, 2, 3]],
           np.eye(4)[[2, 1]]]
    kept, common = cl.intersect_runs(vids, labs, lgs)
    assert common.tolist() == [1, 2]
    assert [k.shape[0] for k in kept] == [2, 2, 2]


def test_postproc_flatten_collision_atomic(tmp_path):
    """A flatten collision must abort BEFORE any file moves (ADVICE r2:
    no half-flattened tree)."""
    import pytest as _pytest
    from video_learning_tpu.audio import postproc_folders as pp
    from video_learning_tpu.utils import FrameworkError
    base = tmp_path / "base"
    (base / "sub1").mkdir(parents=True)
    (base / "sub2").mkdir()
    (base / "sub1" / "x.png").write_bytes(b"1")
    (base / "sub2" / "x.png").write_bytes(b"2")  # duplicate child name
    (base / "sub2" / "y.png").write_bytes(b"3")
    with _pytest.raises(FrameworkError):
        pp.flatten_one_level(str(base))
    # nothing moved: both subdirs intact with original children
    assert sorted(os.listdir(base / "sub1")) == ["x.png"]
    assert sorted(os.listdir(base / "sub2")) == ["x.png", "y.png"]
    assert not (base / "x.png").exists()

    # collision with a child named like its own (not-yet-removed) parent
    base2 = tmp_path / "base2"
    (base2 / "sub").mkdir(parents=True)
    (base2 / "sub" / "sub").write_bytes(b"z")
    with _pytest.raises(FrameworkError):
        pp.flatten_one_level(str(base2))
    assert (base2 / "sub" / "sub").exists()

    # a later subfolder's child may legally reuse an earlier subfolder's
    # name (the earlier one is rmdir'd before the move)
    base3 = tmp_path / "base3"
    (base3 / "a").mkdir(parents=True)
    (base3 / "b").mkdir()
    (base3 / "a" / "f1.png").write_bytes(b"1")
    (base3 / "b" / "a").write_bytes(b"2")
    assert pp.flatten_one_level(str(base3)) == 2
    assert (base3 / "f1.png").exists() and (base3 / "a").is_file()


def test_metrics_writer_tensorboard_events(tmp_path):
    """The opt-in event sink writes stock TensorBoard scalar events a
    vanilla `tensorboard --logdir` can read (the reference's
    start-tensorboard.sh workflow) alongside the JSONL stream."""
    import json as _json

    from video_learning_tpu.observe import MetricsWriter

    w = MetricsWriter(str(tmp_path), "evrun", "ts0", events=True)
    w.write(1, loss=2.5, lr=0.1)
    w.write(2, loss=1.25, lr=0.05, note="text-skipped")
    w.close()

    # JSONL stream unchanged
    lines = [_json.loads(l) for l in open(tmp_path / "metrics_evrun_ts0.jsonl")]
    assert [l["step"] for l in lines] == [1, 2]

    import tensorflow as tf
    event_files = sorted(str(p) for p in tmp_path.glob("events.out.tfevents.*"))
    assert event_files, list(tmp_path.iterdir())
    seen = {}
    for ef in event_files:
        for ev in tf.compat.v1.train.summary_iterator(ef):
            for v in ev.summary.value:
                seen[(ev.step, v.tag)] = tf.make_ndarray(v.tensor).item()
    assert seen[(1, "loss")] == 2.5 and seen[(2, "loss")] == 1.25
    assert abs(seen[(1, "lr")] - 0.1) < 1e-6    # scalars stored as f32
    assert abs(seen[(2, "lr")] - 0.05) < 1e-6
    # non-numeric scalars go to JSONL only
    assert not any(tag == "note" for _, tag in seen)
