"""Tests for the native (C++) record reader and its Dataset integration."""

import numpy as np
import pytest

from video_learning_tpu.data import records

native = pytest.importorskip("video_learning_tpu.data.native_io")


@pytest.fixture(scope="module")
def lib():
    l = native.get_library()
    if l is None:
        pytest.skip("native library unavailable (no toolchain)")
    return l


def _write_images(tmp_path, n=10, shape=(12, 9, 3)):
    path = str(tmp_path / "imgs.tfrecord")
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, shape, np.uint8) for _ in range(n)]
    labels = [[i] if i % 2 == 0 else [i, i + 1] for i in range(n)]
    with records.RecordWriter(path) as w:
        for im, lab in zip(imgs, labels):
            w.write(records.encode_image_example(im, lab))
    return path, imgs, labels


def test_native_image_parity(tmp_path, lib):
    path, imgs, labels = _write_images(tmp_path)
    r = native.NativeReader(path, verify=True)
    assert len(r) == 10
    px, lab, nlab = r.read_images(0, 10, (12, 9, 3), max_labels=4)
    for i in range(10):
        assert np.array_equal(px[i], imgs[i])
        assert nlab[i] == len(labels[i])
        assert lab[i, :nlab[i]].tolist() == labels[i]
        assert np.all(lab[i, nlab[i]:] == -1)


def test_native_record_info_and_slice(tmp_path, lib):
    path, imgs, _ = _write_images(tmp_path)
    r = native.NativeReader(path)
    kind, h, w, d, nlab = r.record_info(0)
    assert (kind, h, w, d) == (records.KIND_IMAGE, 12, 9, 3)
    px, _, _ = r.read_images(3, 4, (12, 9, 3))
    assert np.array_equal(px[0], imgs[3])
    assert np.array_equal(px[3], imgs[6])


def test_native_shape_mismatch_errors(tmp_path, lib):
    path, _, _ = _write_images(tmp_path)
    r = native.NativeReader(path)
    with pytest.raises(RuntimeError):
        r.read_images(0, 2, (5, 5, 3))


def test_native_crc_detects_corruption(tmp_path, lib):
    path, _, _ = _write_images(tmp_path, n=2)
    raw = bytearray(open(path, "rb").read())
    raw[-3] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    r = native.NativeReader(path, verify=True)
    with pytest.raises(RuntimeError):
        r.read_images(0, 2, (12, 9, 3))
    # without verification the read proceeds (reference-style recovery
    # handles it downstream)
    r2 = native.NativeReader(path, verify=False)
    r2.read_images(0, 2, (12, 9, 3))


def test_native_vectors(tmp_path, lib):
    path = str(tmp_path / "v.tfrecord")
    vecs = [np.arange(6, dtype=np.float32) * i for i in range(4)]
    with records.RecordWriter(path) as w:
        for i, v in enumerate(vecs):
            w.write(records.encode_vector_example(v, i))
    r = native.NativeReader(path)
    vals, lab, nlab = r.read_vectors(0, 4, 6)
    for i in range(4):
        assert np.allclose(vals[i], vecs[i])
        assert lab[i, 0] == i


def test_dataset_uses_native_reader(tmp_path, lib):
    from video_learning_tpu.data.dataset import Dataset
    from video_learning_tpu.defs import defs
    path, imgs, _ = _write_images(tmp_path, n=6)
    base = path[:-len(".tfrecord")]
    with open(base, "w") as f:
        for i in range(6):
            f.write("img%d.jpg %d\n" % (i, i % 3))
    records.write_size_file(6, None, path, "image", 1, None)
    d = Dataset()
    d.initialize("nd", base, None, None, (12, 9, 3), [], None,
                 defs.data_format.tfrecord, "jpg", defs.batch_item.default,
                 3, defs.dataset_tag.main, 1)
    d.calculate_batches(3, defs.input_mode.image)
    assert d.native_reader is not None
    batch = d.get_next_batch()
    assert batch.visual.shape == (3, 12, 9, 3)
    assert np.array_equal(batch.visual[0].astype(np.uint8), imgs[0])


def test_native_wide_labels_not_truncated(tmp_path, lib):
    """A record with more labels than the default buffer (e.g. caption
    word ids) must be returned in full, never silently truncated
    (the C++ returns -6 and the binding retries with a wider buffer)."""
    path = str(tmp_path / "wide.tfrecord")
    img = np.zeros((4, 4, 3), np.uint8)
    wide = list(range(80))
    with records.RecordWriter(path) as w:
        w.write(records.encode_image_example(img, wide))
    r = native.NativeReader(path)
    pixels, labels, nlab = r.read_images(0, 1, (4, 4, 3), max_labels=64)
    assert nlab[0] == 80
    assert labels.shape[1] >= 80
    assert labels[0, :80].tolist() == wide
    r.close()


def test_native_truncated_idx_rescans(tmp_path, lib):
    """A corrupt .idx sidecar (not a multiple of 8 bytes) must be ignored
    in favour of a clean file scan — not merged with garbage offsets."""
    path, imgs, labels = _write_images(tmp_path, n=6)
    with open(path + ".idx", "rb") as f:
        raw = f.read()
    with open(path + ".idx", "wb") as f:
        f.write(raw[:len(raw) - 3])  # truncate mid-u64
    r = native.NativeReader(path, verify=True)
    assert len(r) == 6
    pixels, labs, nlab = r.read_images(0, 6, imgs[0].shape, max_labels=4)
    for i in range(6):
        assert np.array_equal(pixels[i], imgs[i])
    r.close()


def test_native_gather_parity(tmp_path, lib):
    """Indexed-gather reads (the shuffled-epoch path) return the same
    records as sequential reads, at arbitrary permutations."""
    path, imgs, labels = _write_images(tmp_path)
    r = native.NativeReader(path, verify=True)
    perm = np.array([7, 2, 9, 0, 5, 5, 1], np.int64)
    px, lab, nlab = r.read_images_at(perm, (12, 9, 3), max_labels=4)
    for k, i in enumerate(perm):
        assert np.array_equal(px[k], imgs[i])
        assert lab[k, :nlab[k]].tolist() == labels[i]
    with pytest.raises(RuntimeError):
        r.read_images_at(np.array([10], np.int64), (12, 9, 3))
    with pytest.raises(RuntimeError):
        r.read_images_at(np.array([-1], np.int64), (12, 9, 3))
    r.close()


def test_native_gather_vectors(tmp_path, lib):
    path = str(tmp_path / "vecs.tfrecord")
    rng = np.random.RandomState(1)
    vecs = [rng.randn(6).astype(np.float32) for _ in range(5)]
    with records.RecordWriter(path) as w:
        for i, v in enumerate(vecs):
            w.write(records.encode_vector_example(v, [i]))
    r = native.NativeReader(path, verify=True)
    idx = np.array([4, 1, 3], np.int64)
    vals, lab, nlab = r.read_vectors_at(idx, 6, max_labels=2)
    for k, i in enumerate(idx):
        assert np.allclose(vals[k], vecs[i])
        assert lab[k, 0] == i
    r.close()


def test_dataset_shuffled_epoch_keeps_native_reader(tmp_path, lib):
    """epoch_shuffle (the production training configuration) must ride
    the native gather path, and produce the same frame stream as the
    pure-python reader."""
    from video_learning_tpu.data.dataset import Dataset
    from video_learning_tpu.defs import defs

    def make(native_on):
        path = str(tmp_path / "shuf.tfrecord")
        rng = np.random.RandomState(3)
        with records.RecordWriter(path) as w:
            for i in range(8):
                w.write(records.encode_image_example(
                    rng.randint(0, 255, (12, 9, 3), np.uint8), [i % 4]))
        base = path[:-len(".tfrecord")]
        with open(base, "w") as f:
            for i in range(8):
                f.write("img%d.jpg %d\n" % (i, i % 4))
        records.write_size_file(8, None, path, "image", 1, None)
        d = Dataset()
        d.initialize("sh", base, None, None, (12, 9, 3), [], None,
                     defs.data_format.tfrecord, "jpg",
                     defs.batch_item.default, 4, defs.dataset_tag.main, 1)
        d.epoch_shuffle = True
        d.shuffle_seed = 11
        d.calculate_batches(4, defs.input_mode.image)
        if not native_on:
            d.native_reader = None
        d.rewind(next_epoch=False)
        return d

    d_native, d_python = make(True), make(False)
    assert d_native.native_reader is not None
    while d_native.loop():
        assert d_python.loop()
        bn, bp = d_native.get_next_batch(), d_python.get_next_batch()
        assert np.array_equal(bn.visual, bp.visual)
        assert np.array_equal(np.asarray(bn.labels),
                              np.asarray(bp.labels))
    # the gather path must actually have been used, not fallen back
    assert d_native.native_reader is not None


def test_read_buffer_ring_reuse(tmp_path, monkeypatch):
    """The dataset's gather-read buffer ring (VLT_REUSE_READ_BUFFERS)
    must return correct content and actually cycle its buffers."""
    import numpy as np
    from video_learning_tpu.data import records
    from video_learning_tpu.data.dataset import Dataset
    from video_learning_tpu.defs import defs

    path = str(tmp_path / "d.tfrecord")
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (8, 10, 3), np.uint8) for _ in range(24)]
    with records.RecordWriter(path) as w:
        for i, fr in enumerate(frames):
            w.write(records.encode_image_example(fr, i % 3))
    records.write_size_file(24, None, path, "image", 1, None)
    base = str(tmp_path / "d")
    open(base, "w").write(
        "".join("img%d.jpg %d\n" % (i, i % 3) for i in range(24)))

    monkeypatch.setenv("VLT_REUSE_READ_BUFFERS", "1")
    d = Dataset()
    d.initialize("x", base, None, None, None, [], (8, 10, 3),
                 defs.data_format.tfrecord, "jpg",
                 defs.batch_item.default, 3, defs.dataset_tag.main, 1)
    d.device_preprocess = True
    d.calculate_batches(4, defs.input_mode.image)
    if d.native_reader is None:
        pytest.skip("native reader unavailable")

    ids, seen = [], []
    for b in range(6):
        batch = d.get_next_batch()
        ids.append(id(batch.visual))
        # content correct at the time of consumption
        for k in range(4):
            assert np.array_equal(batch.visual[k], frames[b * 4 + k])
        seen.append(np.array(batch.visual, copy=True))
    # ring of 4: batch 4 reuses batch 0's buffer, batch 5 reuses 1's
    assert ids[4] == ids[0] and ids[5] == ids[1]
    assert len(set(ids[:4])) == 4
    # and the copies taken during consumption stay correct
    for b, arr in enumerate(seen):
        for k in range(4):
            assert np.array_equal(arr[k], frames[b * 4 + k])


def test_read_buffer_ring_disabled_on_cpu_default(tmp_path, monkeypatch):
    """With the default 'auto' policy the CPU backend must NOT reuse
    buffers (the CPU PJRT client can alias numpy feeds)."""
    from video_learning_tpu.data.dataset import Dataset
    monkeypatch.delenv("VLT_REUSE_READ_BUFFERS", raising=False)
    d = Dataset.__new__(Dataset)
    d._native_shape = (8, 10, 3)
    assert d._read_buffers(4, 64) is None  # tests force the CPU platform


def test_read_buffer_pool_lru_bounded(monkeypatch):
    """Variable batch geometries (ragged cpv) must not leak buffer rings
    without bound: the per-geometry pool is LRU-capped, and a geometry
    seen again within the cap keeps its ring (no realloc thrash)."""
    from video_learning_tpu.data.dataset import Dataset

    monkeypatch.setenv("VLT_REUSE_READ_BUFFERS", "1")
    d = Dataset.__new__(Dataset)
    d._native_shape = (8, 10, 3)
    cap = Dataset._BUF_POOL_GEOMETRIES
    for count in range(1, 3 * cap):
        buf = d._read_buffers(count, 4)
        assert buf[0].shape == (count, 8, 10, 3)
        assert len(d._buf_pools) <= cap
    # most-recent geometries survive, oldest were evicted
    kept = [k[0] for k in d._buf_pools]
    assert kept == list(range(3 * cap - cap, 3 * cap))
    # re-touching a kept geometry reuses its ring (same buffer objects)
    key = next(iter(d._buf_pools))
    ring_before = d._buf_pools[key][0]
    d._read_buffers(key[0], 4)
    assert d._buf_pools[key][0] is ring_before
