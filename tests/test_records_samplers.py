"""Tests for the record container, .size sidecars, and clip samplers."""

import random

import numpy as np
import pytest

from video_learning_tpu.data import records, samplers
from video_learning_tpu.defs import defs
from video_learning_tpu.utils import FrameworkError


def test_image_record_roundtrip(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    imgs = [np.random.RandomState(i).randint(0, 255, (8, 6, 3), np.uint8)
            for i in range(5)]
    labels = [0, [1, 2], 3, [4], 2]
    with records.RecordWriter(path) as w:
        for im, lab in zip(imgs, labels):
            w.write(records.encode_image_example(im, lab))
    r = records.RecordReader(path, verify=True)
    assert len(r) == 5
    for i, (im, lab) in enumerate(zip(imgs, labels)):
        kind, data, l = r.read_at(i)
        assert kind == records.KIND_IMAGE
        assert np.array_equal(data, im)
        expected = lab if not (isinstance(lab, list) and len(lab) == 1) \
            else lab[0]
        assert l == expected
    # sequential iteration + seek
    r.seek(3)
    kind, data, l = next(r)
    assert np.array_equal(data, imgs[3])


def test_vector_record_roundtrip(tmp_path):
    path = str(tmp_path / "v.tfrecord")
    vecs = [np.arange(7, dtype=np.float32) + i for i in range(3)]
    with records.RecordWriter(path) as w:
        for i, v in enumerate(vecs):
            w.write(records.encode_vector_example(v, i))
    r = records.RecordReader(path)
    for i, v in enumerate(vecs):
        kind, data, lab = r.read_at(i)
        assert kind == records.KIND_VECTOR
        assert np.array_equal(data, v)
        assert lab == i


def test_reader_without_index(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    with records.RecordWriter(path) as w:
        for i in range(4):
            w.write(records.encode_vector_example(
                np.ones(3, np.float32) * i, i))
    (tmp_path / "x.tfrecord.idx").unlink()
    r = records.RecordReader(path)
    assert len(r) == 4
    assert r.read_at(2)[2] == 2


def test_corruption_detected(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    with records.RecordWriter(path) as w:
        w.write(records.encode_vector_example(np.ones(3, np.float32), 1))
    raw = bytearray(open(path, "rb").read())
    raw[-2] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    r = records.RecordReader(path, verify=True)
    with pytest.raises(FrameworkError):
        r.read_at(0)


def test_size_file_rle_roundtrip(tmp_path):
    out = str(tmp_path / "y.tfrecord")
    cpv = [3, 3, 3, 2, 2, 5]
    records.write_size_file(6, cpv, out, defs.input_mode.video, 1, 16)
    meta = records.read_size_file(out + ".size")
    assert meta["items"] == 6
    assert meta["cpi"] == cpv
    assert meta["fpc"] == 16
    assert meta["type"] == "video"
    assert meta["labelcount"] == 1


def test_size_file_image_mode(tmp_path):
    out = str(tmp_path / "im.tfrecord")
    records.write_size_file(10, None, out, defs.input_mode.image, 2, 16)
    meta = records.read_size_file(out + ".size")
    assert meta["cpi"] is None
    assert meta["fpc"] is None
    assert meta["labelcount"] == 2


# --------------------------------------------------------------- samplers
def test_rand_frames_deterministic():
    rng1, rng2 = random.Random(7), random.Random(7)
    c1 = samplers.sample_rand_frames(20, 8, rng1)
    c2 = samplers.sample_rand_frames(20, 8, rng2)
    assert c1 == c2
    assert len(c1) == 1 and len(c1[0]) == 8
    assert len(set(c1[0])) == 8  # no dupes when enough frames


def test_rand_frames_compromise():
    log = samplers.GenerationLog()
    clips = samplers.sample_rand_frames(
        4, 8, random.Random(3), path="v",
        strategy=defs.generation_error.compromise, log=log)
    assert len(clips[0]) == 8
    assert len(log) == 1
    assert all(0 <= i < 4 for i in clips[0])


def test_rand_clips_coverage_and_shape():
    rng = random.Random(11)
    clips = samplers.sample_rand_clips(100, 16, 4, rng)
    assert len(clips) == 4
    for c in clips:
        assert len(c) == 16
        assert c == list(range(c[0], c[0] + 16))
    # coverage-aware: no two starts within fpc of each other when possible
    starts = sorted(c[0] for c in clips)
    assert all(b - a >= 16 for a, b in zip(starts, starts[1:]))


def test_rand_clips_too_few_frames_compromise():
    log = samplers.GenerationLog()
    clips = samplers.sample_rand_clips(
        10, 16, 3, random.Random(5), path="v",
        strategy=defs.generation_error.compromise, log=log)
    assert len(clips) == 3
    assert all(len(c) == 16 for c in clips)
    # front-padded with frame 0 (reference serialize.py:308-313)
    assert clips[0][:6] == [0] * 6
    assert len(log) == 1


def test_rand_clips_report_returns_empty():
    log = samplers.GenerationLog()
    clips = samplers.sample_rand_clips(
        10, 16, 3, random.Random(5), path="v",
        strategy=defs.generation_error.report, log=log)
    assert clips == []


def test_rand_clips_abort_raises():
    log = samplers.GenerationLog()
    with pytest.raises(FrameworkError):
        samplers.sample_rand_clips(10, 16, 3, random.Random(5), path="v",
                                   strategy=defs.generation_error.abort,
                                   log=log)


def test_iterative_spacing():
    clips = samplers.sample_iterative(100, 16, 2)
    # starts spaced fpc+offset = 18 apart (reference serialize.py:376-378)
    starts = [c[0] for c in clips]
    assert starts == list(range(0, 100 - 16 + 1, 18))
    assert all(len(c) == 16 for c in clips)
    assert clips[0] == list(range(16))


def test_iterative_short_video_compromise():
    log = samplers.GenerationLog()
    clips = samplers.sample_iterative(
        10, 16, 2, random.Random(5), path="v",
        strategy=defs.generation_error.compromise, log=log)
    assert len(clips) == 1 and len(clips[0]) == 16
    assert len(log) == 1


def test_concatenate_shards(tmp_path):
    shard_paths = []
    all_payloads = []
    for s in range(3):
        path = str(tmp_path / ("s%d.tfrecord" % s))
        with records.RecordWriter(path) as w:
            for i in range(2 + s):
                vec = np.arange(4, dtype=np.float32) + s * 10 + i
                all_payloads.append(vec)
                w.write(records.encode_vector_example(vec, s))
        shard_paths.append(path)
    out = str(tmp_path / "merged.tfrecord")
    records.concatenate(shard_paths, out, remove_shards=True)
    r = records.RecordReader(out, verify=True)
    assert len(r) == 9
    for i, vec in enumerate(all_payloads):
        _, data, _ = r.read_at(i)
        assert np.array_equal(data, vec)
    import os
    assert not os.path.exists(shard_paths[0])


def test_multiprocess_packing(tmp_path):
    """num_processes > 1 packs via shards; output must be identical in
    content to the single-writer path."""
    from PIL import Image
    from video_learning_tpu.data import serialize as ser
    paths, labels = [], []
    rng = np.random.RandomState(0)
    for i in range(7):
        p = tmp_path / ("im%d.jpg" % i)
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
            p, quality=95)
        paths.append(str(p))
        labels.append([i % 3])

    class S:
        raw_image_shape = (16, 16, 3)
        num_frames_per_clip = None
        num_threads = 2
        num_items_per_thread = 3
        num_processes = 3

    out_mp = str(tmp_path / "mp.tfrecord")
    ser.serialize_multiprocess(paths, None, paths, labels, out_mp,
                               "image", 1, S())
    out_st = str(tmp_path / "st.tfrecord")
    S.num_processes = 1
    ser.serialize_multithread(paths, None, paths, labels, out_st,
                              "image", 1, S())
    r1 = records.RecordReader(out_mp, verify=True)
    r2 = records.RecordReader(out_st, verify=True)
    assert len(r1) == len(r2) == 7
    for i in range(7):
        _, a, la = r1.read_at(i)
        _, b, lb = r2.read_at(i)
        assert np.array_equal(a, b) and la == lb
