"""End-to-end tests: offline packing -> .size/.shuffled artifacts ->
runtime Dataset batching, imgproc parity, and resume positioning."""

import random

import numpy as np
import pytest
import yaml

from video_learning_tpu.data import records
from video_learning_tpu.data import serialize as ser
from video_learning_tpu.data.dataset import Dataset
from video_learning_tpu.data.imgproc import (ImageProcessor,
                                             build_mean_image, imresize,
                                             read_image)
from video_learning_tpu.defs import defs


def _serialize_config(tmp_path, input_files, mode_opts=None):
    cfg = {
        "serialize": {
            "output_folder": None,
            "path_prepend_folder": None,
            "input_files": [str(p) for p in input_files],
            "run_id": "testrun",
            "num_threads": 2,
            "num_items_per_thread": 3,
            "raw_image_shape": "(48, 64, 3)",
            "clip_offset_or_num": 2,
            "num_frames_per_clip": 4,
            "clipframe_mode": "defs.clipframe_mode.rand_clips",
            "generation_error": "defs.generation_error.compromise",
            "do_shuffle": False,
            "do_serialize": True,
            "do_validate": True,
            "validate_pcnt": 100,
            "frame_format": "jpg",
            "logging_level": "logging.INFO",
            "seed": 42,
        }
    }
    if mode_opts:
        cfg["serialize"].update(mode_opts)
    p = tmp_path / "ser.yml"
    p.write_text(yaml.safe_dump(cfg))
    return p


def test_serialize_images_end_to_end(tmp_path, tiny_image_tree):
    cfg = _serialize_config(tmp_path, [tiny_image_tree])
    ser.main(["serialize", str(cfg)])
    out = str(tiny_image_tree) + ".tfrecord"
    reader = records.RecordReader(out, verify=True)
    assert len(reader) == 8
    meta = records.read_size_file(out + ".size")
    assert meta["items"] == 8 and meta["type"] == "image"
    # content parity with direct reads
    with open(str(tiny_image_tree)) as f:
        lines = [l.split() for l in f if l.strip()]
    for i, (path, label) in enumerate(lines):
        kind, img, lab = reader.read_at(i)
        assert np.array_equal(img, read_image(path, (48, 64, 3)))
        assert lab == int(label)


def test_serialize_videos_end_to_end(tmp_path, tiny_video_tree):
    cfg = _serialize_config(tmp_path, [tiny_video_tree])
    ser.main(["serialize", str(cfg)])
    out = str(tiny_video_tree) + ".tfrecord"
    meta = records.read_size_file(out + ".size")
    assert meta["items"] == 3
    assert meta["cpi"] == [2, 2, 2]
    assert meta["fpc"] == 4
    reader = records.RecordReader(out)
    assert len(reader) == 3 * 2 * 4
    # clip doc file written
    docfile = str(tiny_video_tree) + ".2.cpv.4.fpc.rand_clips.cfm"
    with open(docfile) as f:
        doc_lines = [l for l in f if l.strip()]
    assert len(doc_lines) == 24


def test_serialize_videos_shuffled_writes_docs(tmp_path, tiny_video_tree):
    cfg = _serialize_config(tmp_path, [tiny_video_tree],
                            {"do_shuffle": True})
    ser.main(["serialize", str(cfg)])
    shuffled = str(tiny_video_tree) + ".shuffled"
    unshuffled = str(tiny_video_tree) + ".unshuffled"
    with open(shuffled) as f:
        pairs = [l.split() for l in f if l.strip()]
    assert len(pairs) == 3
    assert sorted(int(lab) for _, lab in pairs) == [0, 1, 2]
    with open(unshuffled) as f:
        assert len([l for l in f if l.strip()]) == 3


def test_serialize_determinism(tmp_path, tiny_video_tree):
    cfg = _serialize_config(tmp_path, [tiny_video_tree],
                            {"do_shuffle": True, "do_validate": False})
    ser.main(["serialize", str(cfg)])
    first = open(str(tiny_video_tree) + ".tfrecord", "rb").read()
    ser.main(["serialize", str(cfg)])
    second = open(str(tiny_video_tree) + ".tfrecord", "rb").read()
    assert first == second  # same seed -> byte-identical packing


# ----------------------------------------------------------------- imgproc
def test_imresize_matches_pil():
    from PIL import Image
    arr = np.random.RandomState(0).randint(0, 255, (30, 40, 3), np.uint8)
    ours = imresize(arr, (20, 24, 3))
    ref = np.asarray(Image.fromarray(arr).resize((24, 20), Image.BILINEAR))
    assert np.array_equal(ours, ref)


def test_mean_image_bgr_order():
    m = build_mean_image([10.0, 20.0, 30.0], (4, 5, 3))
    assert m.shape == (4, 5, 3)
    assert np.all(m[..., 0] == 10.0)
    assert np.all(m[..., 2] == 30.0)


def test_processor_center_crop_and_mean():
    proc = ImageProcessor(
        [defs.imgproc.center_crop, defs.imgproc.sub_mean],
        raw_image_shape=(48, 64, 3), desired_image_shape=(32, 48, 3),
        mean_scalars=[1.0, 2.0, 3.0])
    img = np.random.RandomState(1).randint(0, 255, (48, 64, 3), np.uint8)
    out = proc.process(img, random.Random(0))
    assert out.shape == (32, 48, 3)
    # center offsets: floor((48-32)/2)=8, floor((64-48)/2)=8
    expected = img[8:40, 8:56, :] - proc.mean_image
    assert np.allclose(out, expected)


def test_processor_params_path_equivalence():
    """Host process() and process_with_params() must agree when fed the
    same randomness — this is the contract the device path relies on."""
    proc = ImageProcessor(
        [defs.imgproc.rand_crop, defs.imgproc.rand_mirror,
         defs.imgproc.sub_mean],
        raw_image_shape=(48, 64, 3), desired_image_shape=(32, 48, 3),
        mean_scalars=[5.0, 5.0, 5.0])
    imgs = [np.random.RandomState(i).randint(0, 255, (48, 64, 3), np.uint8)
            for i in range(6)]
    params = proc.draw_params(6, random.Random(99))
    golden = [proc.process_with_params(im, *p) for im, p in zip(imgs, params)]
    again = [proc.process_with_params(im, *p) for im, p in zip(imgs, params)]
    for g, a in zip(golden, again):
        assert np.allclose(g, a)
    assert any(p[2] for p in params)  # some mirrors drawn


# Adversarial single-field mutations of the serializer config.  Property:
# a bad value must either be tolerated or raise FrameworkError — never a
# raw ValueError/TypeError from the loader (same contract as the run
# config, reference settings_.py:152-159 / serialize.py:49-116).
SERIALIZE_ADVERSARIAL = [
    {"num_threads": "many"},
    {"num_threads": 0},
    {"num_items_per_thread": "a few"},
    {"num_processes": -2},
    {"clip_offset_or_num": "two"},
    {"num_frames_per_clip": "sixteen"},
    {"num_frames_per_clip": 0},
    {"validate_pcnt": "all"},
    {"seed": "lucky"},
    {"clipframe_mode": "defs.clipframe_mode.bogus"},
    {"generation_error": "defs.generation_error.shrug"},
    {"logging_level": "logging.LOUD"},
]


@pytest.mark.parametrize("mutation", SERIALIZE_ADVERSARIAL,
                         ids=[str(m) for m in SERIALIZE_ADVERSARIAL])
def test_serialize_config_fuzz(tmp_path, tiny_image_tree, mutation):
    from video_learning_tpu.utils import FrameworkError
    cfg = _serialize_config(tmp_path, [tiny_image_tree], mutation)
    try:
        ser.SerializationSettings().initialize_from_file(
            ["serialize", str(cfg)])
    except FrameworkError:
        pass          # config-level rejection: good
    # tolerated parses are acceptable; any other exception type fails


# ----------------------------------------------------------------- dataset
def _packed_video_dataset(tmp_path, tiny_video_tree, batch_item="default",
                          device_preprocess=False):
    cfg = _serialize_config(tmp_path, [tiny_video_tree],
                            {"do_validate": False})
    ser.main(["serialize", str(cfg)])
    d = Dataset()
    d.initialize("dset", str(tiny_video_tree), [1.0, 2.0, 3.0], None,
                 (32, 48, 3),
                 [defs.imgproc.center_crop, defs.imgproc.sub_mean],
                 (48, 64, 3), defs.data_format.tfrecord, "jpg",
                 batch_item, 3, defs.dataset_tag.main, 2)
    d.device_preprocess = device_preprocess
    d.calculate_batches(2, defs.input_mode.video)
    return d


def test_dataset_video_batches(tmp_path, tiny_video_tree):
    d = _packed_video_dataset(tmp_path, tiny_video_tree)
    assert d.batches == [2, 1]  # 3 videos, batch_size 2
    b1 = d.get_next_batch()
    # 2 videos x 2 cpv x 4 fpc frames
    assert b1.visual.shape == (16, 32, 48, 3)
    assert b1.labels.shape == (4, 3)  # one label per clip
    assert np.array_equal(np.argmax(b1.labels, 1), [0, 0, 1, 1])
    b2 = d.get_next_batch()
    assert b2.visual.shape == (8, 32, 48, 3)
    assert np.array_equal(np.argmax(b2.labels, 1), [2, 2])
    assert not d.loop()


def test_dataset_clip_batches(tmp_path, tiny_video_tree):
    d = _packed_video_dataset(tmp_path, tiny_video_tree, batch_item="clip")
    assert d.batches == [2, 2, 2]  # 6 clips total, 2 per batch
    b = d.get_next_batch()
    assert b.visual.shape == (8, 32, 48, 3)
    assert b.labels.shape == (2, 3)


def test_dataset_restore_positioning(tmp_path, tiny_video_tree):
    d1 = _packed_video_dataset(tmp_path, tiny_video_tree)
    first = d1.get_next_batch()
    second = d1.get_next_batch()
    d2 = _packed_video_dataset(tmp_path, tiny_video_tree)
    d2.restore(1, 0)
    resumed = d2.get_next_batch()
    assert np.allclose(resumed.visual, second.visual)
    assert np.array_equal(resumed.labels, second.labels)


def test_dataset_device_preprocess_path(tmp_path, tiny_video_tree):
    d = _packed_video_dataset(tmp_path, tiny_video_tree,
                              device_preprocess=True)
    b = d.get_next_batch()
    assert b.visual.dtype == np.uint8
    assert b.visual.shape == (16, 48, 64, 3)  # raw shape, uncropped
    assert b.proc_params.shape == (16, 3)
