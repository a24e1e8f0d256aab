"""Fuzz / property tests for the VLR record container.

The reference trusts TFRecord's framing and recovers from corruption with
bounded retries (/root/reference/dataset_.py:171-230).  The VLR container
is this framework's own format, so its failure envelope must be pinned
down explicitly: ANY byte-level damage to a record file must surface as a
clean error or a shorter-but-valid prefix — never a hang, a crash, or
silently wrong data when verification is on.

Covers (python reader here; native parity in TestNativeFuzz):
* truncation at every interesting boundary (mid-header, mid-payload, EOF)
* random single-byte flips over the whole file with verify=True
* length-field corruption (huge / zero / negative-looking lengths)
* empty / magic-only / wrong-magic files
* stale .idx sidecars pointing into a rewritten (shorter) data file
"""

import os
import struct
import zlib

import numpy as np
import pytest

from video_learning_tpu.data import records
from video_learning_tpu.utils import FrameworkError

SHAPE = (6, 5, 3)


def _write(tmp_path, n=8, name="fuzz.vlr"):
    path = str(tmp_path / name)
    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 255, SHAPE, np.uint8) for _ in range(n)]
    with records.RecordWriter(path) as w:
        for i, im in enumerate(imgs):
            w.write(records.encode_image_example(im, [i]))
    return path, imgs


def _read_all_verified(path):
    """Read every record the reader reports, CRC-verified.  Returns the
    decoded images; raises whatever the reader raises."""
    r = records.RecordReader(path, verify=True)
    try:
        return [r.read_at(i)[1] for i in range(len(r))]
    finally:
        r.close()


class TestTruncation:
    def test_every_truncation_point_is_clean(self, tmp_path):
        """Cut the file at every length from 0 to full: the reader must
        either refuse the file, report a shorter prefix that round-trips
        exactly, or raise a clean error on the damaged tail record."""
        path, imgs = _write(tmp_path, n=4)
        blob = open(path, "rb").read()
        rec_bytes = 8 + len(records.encode_image_example(imgs[0], [0]))
        cut_points = sorted(set(
            list(range(0, 12)) +                       # around the magic
            [len(records.MAGIC) + k * rec_bytes + d    # record boundaries
             for k in range(4) for d in (-2, -1, 0, 1, 2, 7, 8, 9, 20)
             if 0 <= len(records.MAGIC) + k * rec_bytes + d <= len(blob)] +
            [len(blob) - 1, len(blob)]))
        trunc = str(tmp_path / "trunc.vlr")
        for cut in cut_points:
            with open(trunc, "wb") as f:
                f.write(blob[:cut])
            idx = trunc + ".idx"
            if os.path.exists(idx):
                os.remove(idx)           # force a rescan of the cut file
            if cut < len(records.MAGIC):
                with pytest.raises(FrameworkError):
                    records.RecordReader(trunc)
                continue
            try:
                got = _read_all_verified(trunc)
            except FrameworkError:
                continue                 # clean refusal of a cut record
            assert len(got) <= 4
            for k, im in enumerate(got):   # surviving prefix is exact
                assert np.array_equal(im, imgs[k]), "cut=%d rec=%d" % (
                    cut, k)

    def test_empty_and_magic_only(self, tmp_path):
        empty = str(tmp_path / "empty.vlr")
        open(empty, "wb").close()
        with pytest.raises(FrameworkError):
            records.RecordReader(empty)
        magic_only = str(tmp_path / "magic.vlr")
        with open(magic_only, "wb") as f:
            f.write(records.MAGIC)
        r = records.RecordReader(magic_only)
        assert len(r) == 0 and list(r) == []
        r.close()

    def test_wrong_magic(self, tmp_path):
        bad = str(tmp_path / "bad.vlr")
        with open(bad, "wb") as f:
            f.write(b"NOPE" + b"\x00" * 64)
        with pytest.raises(FrameworkError):
            records.RecordReader(bad)


class TestByteFlips:
    def test_random_payload_flips_caught_by_crc(self, tmp_path):
        """Flip one byte at 200 random offsets past the magic: a verified
        read pass must either raise cleanly or return data identical to
        the original (a flip in dead space like the final padding of the
        OS page cannot exist here — every byte is header or payload)."""
        path, imgs = _write(tmp_path, n=8)
        blob = bytearray(open(path, "rb").read())
        rng = np.random.RandomState(1)
        fuzzed = str(tmp_path / "flip.vlr")
        silent_wrong = 0
        for _ in range(200):
            off = int(rng.randint(len(records.MAGIC), len(blob)))
            old = blob[off]
            blob[off] ^= 1 << int(rng.randint(8))
            with open(fuzzed, "wb") as f:
                f.write(bytes(blob))
            idx = fuzzed + ".idx"
            if os.path.exists(idx):
                os.remove(idx)
            try:
                got = _read_all_verified(fuzzed)
                for k, im in enumerate(got):
                    if k < len(imgs) and not np.array_equal(im, imgs[k]):
                        silent_wrong += 1
            except (FrameworkError, ValueError, struct.error):
                pass                     # clean, typed failure
            blob[off] = old
        assert silent_wrong == 0

    def test_length_field_corruption(self, tmp_path):
        """Huge / zero lengths in a record header must not hang or crash
        the offset scan, and verified reads stay clean."""
        path, imgs = _write(tmp_path, n=3)
        blob = bytearray(open(path, "rb").read())
        first_hdr = len(records.MAGIC)
        for bad_len in (0, 1, 2 ** 31 - 1, 2 ** 32 - 1, len(blob) * 2):
            fuzzed = bytearray(blob)
            fuzzed[first_hdr:first_hdr + 4] = struct.pack("<I", bad_len)
            p = str(tmp_path / "len.vlr")
            with open(p, "wb") as f:
                f.write(bytes(fuzzed))
            idx = p + ".idx"
            if os.path.exists(idx):
                os.remove(idx)
            try:
                got = _read_all_verified(p)
            except (FrameworkError, ValueError, struct.error):
                continue
            # a zero/shifted length may desync framing; CRC verification
            # must then have rejected everything it could not prove
            for im in got:
                assert any(np.array_equal(im, ref) for ref in imgs)


class TestStaleIndex:
    def test_idx_longer_than_data(self, tmp_path):
        """A sidecar from a longer previous run must be detected and the
        file rescanned (records.py:173-185)."""
        path, imgs = _write(tmp_path, n=8)
        idx = np.fromfile(path + ".idx", np.uint64)
        # rewrite the data file with only 3 records, keep the 8-record idx
        with records.RecordWriter(path) as w:
            for i in range(3):
                w.write(records.encode_image_example(imgs[i], [i]))
        idx.tofile(path + ".idx")
        got = _read_all_verified(path)
        assert len(got) == 3
        for k in range(3):
            assert np.array_equal(got[k], imgs[k])

    def test_idx_garbage_offsets(self, tmp_path):
        path, imgs = _write(tmp_path, n=4)
        np.asarray([10 ** 12, 10 ** 13], np.uint64).tofile(path + ".idx")
        got = _read_all_verified(path)
        assert len(got) == 4


class TestDecodeGarbage:
    def test_decode_example_on_noise_never_hangs(self):
        rng = np.random.RandomState(3)
        outcomes = {"ok": 0, "raised": 0}
        for _ in range(300):
            payload = rng.bytes(int(rng.randint(1, 200)))
            try:
                kind, data, labels = records.decode_example(payload)
                assert kind in (records.KIND_IMAGE, records.KIND_VECTOR)
                outcomes["ok"] += 1
            except (FrameworkError, ValueError, struct.error):
                outcomes["raised"] += 1
        assert outcomes["ok"] + outcomes["raised"] == 300


native = pytest.importorskip("video_learning_tpu.data.native_io")


class TestNativeFuzz:
    """The C++ reader must present the same failure envelope as the
    python reference implementation (native/vlrecords.cpp)."""

    @pytest.fixture(autouse=True)
    def _lib(self):
        if native.get_library() is None:
            pytest.skip("native library unavailable")

    def test_native_truncation_matches_python(self, tmp_path):
        path, imgs = _write(tmp_path, n=4)
        blob = open(path, "rb").read()
        rec_bytes = 8 + len(records.encode_image_example(imgs[0], [0]))
        trunc = str(tmp_path / "ntrunc.vlr")
        for cut in [len(records.MAGIC) + k * rec_bytes + d
                    for k in range(1, 4) for d in (-3, 0, 5, 30)]:
            if not 0 <= cut <= len(blob):
                continue
            with open(trunc, "wb") as f:
                f.write(blob[:cut])
            if os.path.exists(trunc + ".idx"):
                os.remove(trunc + ".idx")
            r = native.NativeReader(trunc, verify=True)
            n = len(r)
            assert n <= 4
            if n == 0:
                continue
            try:
                px, lab, nlab = r.read_images(0, n, SHAPE, max_labels=2)
            except RuntimeError:
                continue                # clean refusal of the cut tail
            for k in range(n):
                assert np.array_equal(px[k], imgs[k]), "cut=%d" % cut

    def test_native_payload_flips_caught(self, tmp_path):
        path, imgs = _write(tmp_path, n=4)
        blob = bytearray(open(path, "rb").read())
        rng = np.random.RandomState(5)
        fuzzed = str(tmp_path / "nflip.vlr")
        silent_wrong = 0
        for _ in range(100):
            off = int(rng.randint(len(records.MAGIC), len(blob)))
            old = blob[off]
            blob[off] ^= 1 << int(rng.randint(8))
            with open(fuzzed, "wb") as f:
                f.write(bytes(blob))
            if os.path.exists(fuzzed + ".idx"):
                os.remove(fuzzed + ".idx")
            try:
                r = native.NativeReader(fuzzed, verify=True)
                n = len(r)
                if n:
                    px, _, _ = r.read_images(0, min(n, 4), SHAPE,
                                             max_labels=2)
                    for k in range(min(n, 4)):
                        if not np.array_equal(px[k], imgs[k]):
                            silent_wrong += 1
            except RuntimeError:
                pass
            blob[off] = old
        assert silent_wrong == 0
