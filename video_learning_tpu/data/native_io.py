"""ctypes binding to the native (C++) VLR record reader.

Builds on demand from native/vlrecords.cpp (``make -C native``) and falls
back silently to the pure-Python reader when the toolchain or library is
unavailable.  The native path mmaps the record file and decodes whole
batches with one memcpy per frame — removing per-record Python overhead
from the host input pipeline (the reference's equivalent cost is the
python-side proto parsing at dataset_.py:100-133).
"""

import ctypes
import os
import subprocess

import numpy as np

from video_learning_tpu.utils import debug, info, warning

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvlrecords.so")

_lib = None
_lib_tried = False


def _build():
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception as ex:
        debug("Native record library build failed: %s" % ex)
        return False


def get_library(auto_build=True):
    """Load (building if needed) the native library; None on failure."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if auto_build:
        # always invoke make: it no-ops when the .so is newer than the
        # source, and rebuilds a stale binary after vlrecords.cpp edits
        if not _build() and not os.path.exists(_LIB_PATH):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as ex:
        warning("Could not load native record library: %s" % ex)
        return None
    lib.vlr_open.restype = ctypes.c_void_p
    lib.vlr_open.argtypes = [ctypes.c_char_p]
    lib.vlr_close.argtypes = [ctypes.c_void_p]
    lib.vlr_count.restype = ctypes.c_int64
    lib.vlr_count.argtypes = [ctypes.c_void_p]
    lib.vlr_read_images.restype = ctypes.c_int
    lib.vlr_read_images.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int]
    lib.vlr_read_vectors.restype = ctypes.c_int
    lib.vlr_read_vectors.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int]
    lib.vlr_read_images_at.restype = ctypes.c_int
    lib.vlr_read_images_at.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int]
    lib.vlr_read_vectors_at.restype = ctypes.c_int
    lib.vlr_read_vectors_at.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int]
    lib.vlr_record_info.restype = ctypes.c_int
    lib.vlr_record_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int64] + \
        [ctypes.POINTER(ctypes.c_int32)] * 5
    _lib = lib
    info("Native record reader loaded from %s" % _LIB_PATH)
    return _lib


class NativeReader:
    """Batch-oriented reader over the native library."""

    def __init__(self, path, verify=False):
        lib = get_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.vlr_open(path.encode())
        if not self._h:
            raise RuntimeError("vlr_open failed for %s" % path)
        self.path = path
        self.verify = 1 if verify else 0

    def __len__(self):
        return int(self._lib.vlr_count(self._h))

    def record_info(self, index):
        vals = [ctypes.c_int32() for _ in range(5)]
        rc = self._lib.vlr_record_info(self._h, index,
                                       *[ctypes.byref(v) for v in vals])
        if rc != 0:
            raise RuntimeError("vlr_record_info rc=%d" % rc)
        kind, h, w, d, nlab = (v.value for v in vals)
        return kind, h, w, d, nlab

    @staticmethod
    def _image_buffers(count, h, w, d, max_labels, out):
        """Caller-provided (pixels, labels, nlab) buffers, or fresh ones.
        Reusing buffers across batches skips the page-fault cost of a
        fresh allocation per batch (measured 1.7x on the 471MB bench
        batch; dataset.py keeps a ring of them on the hot path)."""
        if out is not None:
            pixels, labels, nlab = out
            if pixels.shape != (count, h, w, d) or \
                    pixels.dtype != np.uint8 or \
                    not pixels.flags.c_contiguous:
                raise ValueError("bad pixels buffer for reuse")
            if labels.shape != (count, max_labels) or \
                    labels.dtype != np.int32 or \
                    not labels.flags.c_contiguous:
                raise ValueError("bad labels buffer for reuse")
            if nlab.shape != (count,) or nlab.dtype != np.int32 or \
                    not nlab.flags.c_contiguous:
                raise ValueError("bad nlab buffer for reuse")
            return pixels, labels, nlab
        return (np.empty((count, h, w, d), np.uint8),
                np.empty((count, max_labels), np.int32),
                np.empty((count,), np.int32))

    def read_images(self, start, count, shape, max_labels=1, out=None):
        """Decode count consecutive image records.  Returns
        (pixels (count, h, w, d) uint8, labels (count, max_labels) int32
        with -1 padding, nlab (count,) int32); ``out`` optionally
        provides those buffers for reuse."""
        h, w, d = (int(x) for x in shape)
        pixels, labels, nlab = self._image_buffers(count, h, w, d,
                                                   max_labels, out)
        rc = self._lib.vlr_read_images(
            self._h, start, count, h, w, d,
            pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            nlab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_labels, self.verify)
        if rc == -6:
            # a record carries more labels (e.g. caption word ids) than
            # the buffer: retry once with a buffer sized to the data
            widest = self._widest_label_row(start, count)
            if widest > max_labels:
                return self.read_images(start, count, shape,
                                        max_labels=widest)
        if rc != 0:
            raise RuntimeError("vlr_read_images rc=%d" % rc)
        return pixels, labels, nlab

    def read_images_at(self, indices, shape, max_labels=1, out=None):
        """Gather-decode image records at explicit ``indices`` (any order;
        the shuffled-epoch read path).  Same returns as read_images."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        count = len(idx)
        h, w, d = (int(x) for x in shape)
        pixels, labels, nlab = self._image_buffers(count, h, w, d,
                                                   max_labels, out)
        rc = self._lib.vlr_read_images_at(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            count, h, w, d,
            pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            nlab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_labels, self.verify)
        if rc == -6:
            widest = max(self.record_info(int(i))[4] for i in idx)
            if widest > max_labels:
                return self.read_images_at(idx, shape, max_labels=widest)
        if rc != 0:
            raise RuntimeError("vlr_read_images_at rc=%d" % rc)
        return pixels, labels, nlab

    def read_vectors_at(self, indices, dim, max_labels=1):
        """Gather-decode vector records at explicit ``indices``."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        count = len(idx)
        values = np.empty((count, dim), np.float32)
        labels = np.empty((count, max_labels), np.int32)
        nlab = np.empty((count,), np.int32)
        rc = self._lib.vlr_read_vectors_at(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            count, dim,
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            nlab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_labels, self.verify)
        if rc == -6:
            widest = max(self.record_info(int(i))[4] for i in idx)
            if widest > max_labels:
                return self.read_vectors_at(idx, dim, max_labels=widest)
        if rc != 0:
            raise RuntimeError("vlr_read_vectors_at rc=%d" % rc)
        return values, labels, nlab

    def _widest_label_row(self, start, count):
        return max(self.record_info(start + i)[4] for i in range(count))

    def read_vectors(self, start, count, dim, max_labels=1):
        values = np.empty((count, dim), np.float32)
        labels = np.empty((count, max_labels), np.int32)
        nlab = np.empty((count,), np.int32)
        rc = self._lib.vlr_read_vectors(
            self._h, start, count, dim,
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            nlab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_labels, self.verify)
        if rc == -6:
            widest = self._widest_label_row(start, count)
            if widest > max_labels:
                return self.read_vectors(start, count, dim,
                                         max_labels=widest)
        if rc != 0:
            raise RuntimeError("vlr_read_vectors rc=%d" % rc)
        return values, labels, nlab

    def close(self):
        if self._h:
            self._lib.vlr_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
