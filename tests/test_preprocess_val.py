"""Pixel-parity of the device preprocessing path vs the host golden chain,
raw-disk data format, vector datasets, and Validation engine clip
accumulation semantics."""

import random

import numpy as np
import pytest

from video_learning_tpu.data import records
from video_learning_tpu.data.dataset import Dataset
from video_learning_tpu.data.imgproc import ImageProcessor
from video_learning_tpu.defs import defs
from video_learning_tpu.utils import FrameworkError
from video_learning_tpu.ops.preprocess import make_preprocessor, \
    supports_device_path


# ------------------------------------------------- device preprocess parity
@pytest.mark.parametrize("imgproc", [
    [defs.imgproc.center_crop, defs.imgproc.sub_mean],
    [defs.imgproc.rand_crop, defs.imgproc.rand_mirror,
     defs.imgproc.sub_mean],
    [defs.imgproc.rand_crop],
])
def test_device_preprocess_pixel_parity(imgproc):
    proc = ImageProcessor(imgproc, (40, 50, 3), (32, 40, 3),
                          [10.0, 20.0, 30.0]
                          if defs.imgproc.sub_mean in imgproc else None)
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (6, 40, 50, 3), np.uint8)
    params = proc.draw_params(6, random.Random(7))
    golden = np.stack([proc.process_with_params(im, *p)
                       for im, p in zip(images, params)]).astype(np.float32)
    device_fn = make_preprocessor(proc)
    device = np.asarray(device_fn(images, params))
    assert golden.shape == device.shape
    assert np.allclose(golden, device, atol=1e-5)


def test_device_path_gating():
    assert supports_device_path([defs.imgproc.center_crop])
    assert not supports_device_path([defs.imgproc.resize])


def test_host_and_device_dataset_paths_agree(tmp_path):
    """The same dataset read twice — host imgproc vs device imgproc — must
    produce identical pixels when fed identical RNG."""
    path = str(tmp_path / "d.tfrecord")
    rng = np.random.RandomState(3)
    with records.RecordWriter(path) as w:
        for i in range(4):
            w.write(records.encode_image_example(
                rng.randint(0, 255, (40, 50, 3), np.uint8), i % 2))
    records.write_size_file(4, None, path, "image", 1, None)
    base = str(tmp_path / "d")
    with open(base, "w") as f:
        f.write("".join("img%d.jpg %d\n" % (i, i % 2) for i in range(4)))

    def make(dev):
        d = Dataset()
        d.initialize("x", base, [9.0, 9.0, 9.0], None, (32, 40, 3),
                     [defs.imgproc.rand_crop, defs.imgproc.rand_mirror,
                      defs.imgproc.sub_mean],
                     (40, 50, 3), defs.data_format.tfrecord, "jpg",
                     defs.batch_item.default, 2, defs.dataset_tag.main, 1)
        d.device_preprocess = dev
        d.rng = random.Random(42)
        d.calculate_batches(4, defs.input_mode.image)
        return d

    host = make(False).get_next_batch()
    devb = make(True).get_next_batch()
    fn = make_preprocessor(make(True).processor)
    dev_pixels = np.asarray(fn(devb.visual, devb.proc_params))
    assert np.allclose(host.visual, dev_pixels, atol=1e-5)


# ------------------------------------------------------------ raw disk mode
def test_raw_disk_image_mode(tmp_path):
    from PIL import Image
    from tests.conftest import make_image
    paths = []
    for i in range(4):
        p = tmp_path / ("im%d.jpg" % i)
        Image.fromarray(make_image(40, 50, seed=i)).save(p, quality=95)
        paths.append(p)
    base = tmp_path / "raw.list"
    base.write_text("".join("%s %d\n" % (p, i % 2)
                            for i, p in enumerate(paths)))
    d = Dataset()
    d.initialize("raw", str(base), None, None, (40, 50, 3), [],
                 None, defs.data_format.raw, "jpg",
                 defs.batch_item.default, 2, defs.dataset_tag.main, 1)
    d.calculate_batches(2, defs.input_mode.image)
    d.num_items = 4
    d.batches = [2, 2]
    b = d.get_next_batch()
    assert b.visual.shape == (2, 40, 50, 3)
    assert b.labels.shape == (2, 2)


# ------------------------------------------------------------- vectors mode
def test_vectors_dataset_pipeline(tmp_path):
    """ascii feature vectors -> packed records -> FC pipeline training
    feed (reference serialize_ascii + input_mode.vectors)."""
    from video_learning_tpu.data import serialize as ser
    feats = tmp_path / "feats.txt"
    rng = np.random.RandomState(0)
    lines = []
    for i in range(6):
        vec = ",".join("%.4f" % v for v in rng.randn(8))
        lines.append("%s %d" % (vec, i % 3))
    feats.write_text("\n".join(lines) + "\n")
    (tmp_path / "feats.txt.ids").write_text(
        "\n".join("item%d" % i for i in range(6)) + "\n")

    import yaml
    cfg = {"serialize": {
        "output_folder": None, "path_prepend_folder": None,
        "input_files": [str(feats)], "run_id": "vecs",
        "num_threads": 1, "num_items_per_thread": 4,
        "raw_image_shape": None, "clip_offset_or_num": 1,
        "num_frames_per_clip": 1,
        "clipframe_mode": "defs.clipframe_mode.iterative",
        "generation_error": "defs.generation_error.compromise",
        "do_shuffle": False, "do_serialize": True, "do_validate": True,
        "validate_pcnt": 100, "frame_format": "jpg",
        "logging_level": "logging.INFO", "seed": 2}}
    p = tmp_path / "ser.yml"
    p.write_text(yaml.safe_dump(cfg))
    ser.main(["x", str(p)])

    d = Dataset()
    d.initialize("v", str(feats), None, None, None, [], None,
                 defs.data_format.tfrecord, "jpg", defs.batch_item.default,
                 3, defs.dataset_tag.main, 1)
    d.calculate_batches(2, defs.input_mode.vectors)
    assert d.input_mode == defs.input_mode.vectors
    b = d.get_next_batch()
    assert b.visual.shape == (2, 8)
    assert b.visual.dtype == np.float32
    assert b.labels.shape == (2, 3)


# --------------------------------------------------- Validation clip accum
class _ValSettings:
    pass


def _val_with_dataset(batch_item, cpv_list):
    from video_learning_tpu.config import ValOpts
    from video_learning_tpu.val import Validation

    class Dset:
        pass

    dset = Dset()
    dset.batch_item = batch_item
    dset.clips_per_video = cpv_list
    dset.video_index = 0
    dset.input_mode = defs.input_mode.video
    dset.batch_index = 1
    dset.batch_size = len(cpv_list)
    dset.num_items = len(cpv_list)

    class Feeder:
        def get_dataset_by_tag(self, tag):
            return [dset]

    s = _ValSettings()
    s.val = ValOpts()
    s.val.logits_save_interval = None
    s.val.clip_fusion_method = defs.fusion_method.avg
    s.num_classes = 3
    s.run_folder = "/tmp"
    s.run_id = "t"
    s.timestamp = "ts"
    s.feeder = Feeder()
    return Validation(s), s, dset


def test_val_clip_mode_accumulation():
    """batch_item=clip: accumulate until each video's cpv completes
    (reference val.py:63-88)."""
    val, settings, dset = _val_with_dataset(defs.batch_item.clip, [2, 3])
    logits1 = np.asarray([[1, 0, 0], [3, 0, 0]], np.float32)  # vid0 clips
    labels1 = np.eye(3, dtype=np.float32)[[0, 0]]
    val.process_validation_logits("main", settings, logits1, labels1)
    assert len(val.item_logits) == 1      # vid0 fused (avg -> [2,0,0])
    assert np.allclose(val.item_logits[0], [2, 0, 0])
    logits2 = np.asarray([[0, 1, 0], [0, 3, 0], [0, 5, 0]], np.float32)
    labels2 = np.eye(3, dtype=np.float32)[[1, 1, 1]]
    val.process_validation_logits("main", settings, logits2, labels2)
    assert len(val.item_logits) == 2
    assert np.allclose(val.item_logits[1], [0, 3, 0])
    assert val.get_accuracy() == pytest.approx(1.0)


def test_val_default_mode_inline_fusion():
    """batch_item=default: whole-video batches fused inline
    (reference val.py:89-110)."""
    val, settings, dset = _val_with_dataset(defs.batch_item.default, [2, 1])
    # one batch holding vid0 (2 clips) + vid1 (1 clip)
    logits = np.asarray([[4, 0, 0], [0, 0, 0], [0, 9, 0]], np.float32)
    labels = np.eye(3, dtype=np.float32)[[0, 0, 1]]
    val.process_validation_logits("main", settings, logits, labels)
    assert len(val.item_logits) == 2
    assert np.allclose(val.item_logits[0], [2, 0, 0])
    assert np.allclose(val.item_logits[1], [0, 9, 0])
    assert val.get_accuracy() == pytest.approx(1.0)


def test_val_chunked_persistence(tmp_path):
    val, settings, dset = _val_with_dataset(defs.batch_item.default, [1])
    settings.run_folder = str(tmp_path)
    val.run_folder = str(tmp_path)
    val.validation_logits_save_interval = 2
    for k in range(5):
        val.add_item_logits_labels(
            np.eye(3, dtype=np.float32)[k % 3] * 2,
            np.eye(3, dtype=np.float32)[k % 3])
        val.save_validation_logits_chunk()
    val.save_validation_logits_chunk(save_all=True)
    assert val.validation_logits_save_counter == 3
    acc = val.get_accuracy()
    assert acc == pytest.approx(1.0)


def test_val_top_k_accuracy(tmp_path):
    """get_accuracy(k): true class among the k highest logits.  Rows are
    built so top-1 = 1/3, top-2 = 2/3, top-3 rejected (k must be <
    num_classes); the k>1 path also replays persisted chunks."""
    val, settings, dset = _val_with_dataset(defs.batch_item.default, [1])
    settings.run_folder = str(tmp_path)
    val.run_folder = str(tmp_path)
    rows = [
        ([9.0, 1.0, 0.0], 0),   # top-1 hit
        ([5.0, 4.0, 0.0], 1),   # top-2 hit only
        ([7.0, 6.0, 1.0], 2),   # miss even at top-2
    ]
    for logits, cls in rows:
        val.add_item_logits_labels(np.asarray(logits, np.float32),
                                   np.eye(3, dtype=np.float32)[cls])
    assert val.get_accuracy() == pytest.approx(1 / 3)
    assert val.get_accuracy(2) == pytest.approx(2 / 3)
    with pytest.raises(FrameworkError, match="top_k"):
        val.get_accuracy(3)

    # chunk replay: the k>1 path reads persisted chunks too.  With a
    # 2-row chunk + 1-row tail: top-1 is the reference's UNWEIGHTED
    # mean-over-chunks (val.py:174-198) = mean(0.5, 0) = 0.25, while the
    # top-k additions (k>1) weight each chunk by its row count
    # (val.get_accuracies): top-2 = (2*1.0 + 1*0)/3 = 2/3
    val2, settings2, _ = _val_with_dataset(defs.batch_item.default, [1])
    settings2.run_folder = str(tmp_path)
    val2.run_folder = str(tmp_path)
    val2.validation_logits_save_interval = 2
    for logits, cls in rows:
        val2.add_item_logits_labels(np.asarray(logits, np.float32),
                                    np.eye(3, dtype=np.float32)[cls])
        val2.save_validation_logits_chunk()
    assert val2.validation_logits_save_counter == 1
    assert val2.get_accuracy() == pytest.approx(0.25)
    assert val2.get_accuracy(2) == pytest.approx(2 / 3)

    # get_accuracies computes every k in ONE pass over the chunks: the
    # values match the per-k calls and each chunk is unpickled once
    loads = [0]
    orig = val2.load_validation_logits_chunk

    def counting_load(idx):
        loads[0] += 1
        return orig(idx)

    val2.load_validation_logits_chunk = counting_load
    accs = val2.get_accuracies([1, 2])
    assert accs[1] == pytest.approx(0.25)
    assert accs[2] == pytest.approx(2 / 3)
    assert loads[0] == val2.validation_logits_save_counter


def test_do_test_rejects_oversized_top_k_before_eval():
    """A top_k >= num_classes must abort BEFORE the eval loop runs, not
    in the accuracy pass after hours of forward batches."""
    from video_learning_tpu.run_task import do_test

    class _Boom:
        def loop(self):
            raise AssertionError("eval loop ran despite invalid top_k")

    class _Model:
        caption_dataset = None
        required_input = []

    class _Val:
        pass

    class _ValOpts:
        top_k = [200]

    class _Settings:
        val = _ValOpts()
        num_classes = 3

    with pytest.raises(FrameworkError, match="top_k=200"):
        do_test(_Settings(), _Val(), {}, _Boom(), _Model(), None)


def test_val_top_k_config_parse():
    """val: top_k parses scalars and lists, rejects k < 2 and garbage."""
    from video_learning_tpu.config import Settings
    read = Settings._read_val_opts
    assert read({"batch_size": 1, "top_k": 5}).top_k == [5]
    assert read({"batch_size": 1, "top_k": "[3, 5]"}).top_k == [3, 5]
    assert read({"batch_size": 1}).top_k is None
    with pytest.raises(FrameworkError, match="top_k"):
        read({"batch_size": 1, "top_k": 1})
    with pytest.raises(FrameworkError, match="top_k"):
        read({"batch_size": 1, "top_k": "five"})
