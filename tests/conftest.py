"""Test configuration: force JAX onto a virtual 8-device CPU mesh so that
multi-chip sharding tests run without TPU hardware (SURVEY.md §4)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores JAX_PLATFORMS from the environment in this
# image; force the platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import logging

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(autouse=True)
def _quiet_logs():
    logging.getLogger("vlt").setLevel(logging.WARNING)


@pytest.fixture
def rng():
    import random
    return random.Random(1234)


def make_image(h, w, seed=0):
    r = np.random.RandomState(seed)
    return r.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.fixture
def tiny_image_tree(tmp_path):
    """Create a tiny image-classification fixture: 8 jpgs + a paths file
    (format of examples/test_run/test_files, reference SURVEY §2.25)."""
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    lines = []
    for i in range(8):
        arr = make_image(48, 64, seed=i)
        p = img_dir / ("img_%04d.jpg" % i)
        # save as PNG-in-jpg-name would recompress; use BMP-free path: save
        # real jpeg, read-back is what the packer sees so parity holds.
        Image.fromarray(arr).save(p, quality=95)
        lines.append("%s %d" % (p, i % 4))
    paths_file = tmp_path / "data.train"
    paths_file.write_text("\n".join(lines) + "\n")
    return paths_file


@pytest.fixture
def tiny_video_tree(tmp_path):
    """Tiny video fixture: 3 video folders with 10/12/20 frames each."""
    vids = []
    for v, nframes in enumerate([10, 12, 20]):
        vdir = tmp_path / ("vid%d" % v)
        vdir.mkdir()
        for i in range(nframes):
            arr = make_image(48, 64, seed=v * 100 + i)
            Image.fromarray(arr).save(vdir / ("f_%04d.jpg" % i), quality=95)
        vids.append(vdir)
    paths_file = tmp_path / "videos.train"
    paths_file.write_text(
        "\n".join("%s %d" % (v, i) for i, v in enumerate(vids)) + "\n")
    return paths_file
