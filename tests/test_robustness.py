"""Robustness + cadence tests: corruption recovery, checkpoint pruning,
save cadence, LR schedule golden values, multi-label classification."""

import os
import pickle
import random

import numpy as np
import pytest

from video_learning_tpu.data import records
from video_learning_tpu.data.dataset import Dataset
from video_learning_tpu.defs import defs


# ------------------------------------------------------ corruption recovery
def _image_dataset(tmp_path, n=4, corrupt_idx=None):
    path = str(tmp_path / "d.tfrecord")
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (8, 8, 3), np.uint8) for _ in range(n)]
    with records.RecordWriter(path) as w:
        for i, im in enumerate(imgs):
            w.write(records.encode_image_example(im, i % 2))
    if corrupt_idx is not None:
        offsets = np.fromfile(path + ".idx", np.uint64)
        raw = bytearray(open(path, "rb").read())
        # trash the record length header so even unverified reads fail
        pos = int(offsets[corrupt_idx])
        raw[pos:pos + 4] = (2 ** 31 - 1).to_bytes(4, "little")
        open(path, "wb").write(bytes(raw))
    base = str(tmp_path / "d")
    with open(base, "w") as f:
        for i in range(n):
            f.write("%s %d\n" % (tmp_path / ("src%d.jpg" % i), i % 2))
    return base, imgs


def test_corruption_manual_fallback(tmp_path):
    """A destroyed record falls back to re-reading the source image
    (reference dataset_.py:233-241)."""
    from PIL import Image
    base, imgs = _image_dataset(tmp_path, corrupt_idx=1)
    # write the fallback source image for index 1
    fallback = np.random.RandomState(9).randint(0, 255, (8, 8, 3),
                                                np.uint8)
    Image.fromarray(fallback).save(tmp_path / "src1.jpg", quality=100)
    records.write_size_file(4, None, str(tmp_path / "d.tfrecord"),
                            "image", 1, None)
    d = Dataset()
    d.initialize("c", base, None, None, (8, 8, 3), [], None,
                 defs.data_format.tfrecord, "jpg", defs.batch_item.default,
                 2, defs.dataset_tag.main, 2)
    d.calculate_batches(4, defs.input_mode.image)
    d.native_reader = None  # exercise the python retry path
    batch = d.get_next_batch()
    assert batch.visual.shape == (4, 8, 8, 3)
    # record 0 is intact
    assert np.array_equal(batch.visual[0].astype(np.uint8), imgs[0])


def test_corruption_manual_fallback_under_host_shard(tmp_path):
    """The manual fallback maps the GLOBAL record index back to the
    shard-local frames list (regression: IndexError when host-sharded)."""
    from PIL import Image
    base, _ = _image_dataset(tmp_path, corrupt_idx=3)
    fallback = np.random.RandomState(5).randint(0, 255, (8, 8, 3), np.uint8)
    Image.fromarray(fallback).save(tmp_path / "src3.jpg", quality=100)
    records.write_size_file(4, None, str(tmp_path / "d.tfrecord"),
                            "image", 1, None)
    d = Dataset()
    d.initialize("c", base, None, None, (8, 8, 3), [], None,
                 defs.data_format.tfrecord, "jpg", defs.batch_item.default,
                 2, defs.dataset_tag.main, 2)
    d.host_shards, d.host_shard_index = 2, 1
    d.calculate_batches(2, defs.input_mode.image)
    d.native_reader = None
    batch = d.get_next_batch()  # covers global records 2 (ok) and 3 (bad)
    assert batch.visual.shape == (2, 8, 8, 3)


def test_corruption_unrecoverable_raises(tmp_path):
    from video_learning_tpu.utils import FrameworkError
    base, _ = _image_dataset(tmp_path, corrupt_idx=2)
    records.write_size_file(4, None, str(tmp_path / "d.tfrecord"),
                            "image", 1, None)
    d = Dataset()
    d.initialize("c", base, None, None, (8, 8, 3), [], None,
                 defs.data_format.tfrecord, "jpg", defs.batch_item.default,
                 2, defs.dataset_tag.main, 2)
    d.calculate_batches(4, defs.input_mode.image)
    d.native_reader = None
    with pytest.raises(Exception):
        d.get_next_batch()  # no src2.jpg on disk -> unrecoverable


# ------------------------------------------------------ checkpoint pruning
def test_checkpoint_pruning_max_to_keep(tmp_path):
    from video_learning_tpu.data.feeder import Feeder
    import time

    class T:
        epochs = 3
        epoch_index = 0
        batch_size = 1

    feeder = Feeder(defs.input_mode.video, [defs.phase.train], (T(), None),
                    1.0, str(tmp_path), False)
    feeder.phase = defs.phase.train
    feeder.num_saves = 2
    feeder.save_interval = 1
    feeder.train = T()
    feeder.datasets = {defs.phase.train: []}
    feeder.get_batch_index = lambda: 0
    for step in range(4):
        feeder.save({"params": {"w": np.ones(3)}}, "ep_%d" % step, step)
        time.sleep(0.01)
    remaining = [f for f in os.listdir(tmp_path / "checkpoints")
                 if f.endswith(".ckpt")]
    assert len(remaining) == 2  # max_to_keep pruning (feeder.py:201)
    snaps = [f for f in os.listdir(tmp_path / "checkpoints")
             if f.endswith(".snap")]
    assert len(snaps) == 2  # sidecars pruned along


def _async_feeder(tmp_path):
    from video_learning_tpu.data.feeder import Feeder

    class T:
        epochs = 3
        epoch_index = 0
        batch_size = 1

    feeder = Feeder(defs.input_mode.video, [defs.phase.train], (T(), None),
                    1.0, str(tmp_path), False)
    feeder.phase = defs.phase.train
    feeder.train = T()
    feeder.datasets = {defs.phase.train: []}
    feeder.get_batch_index = lambda: 7
    feeder.checkpoint_async = True
    return feeder


def test_async_checkpoint_save_and_restore(tmp_path):
    """checkpoint_async writes the same artifacts as the sync path: the
    params archive, the .snap sidecar (recording the position at SUBMIT
    time), and max_to_keep pruning — and finish_saves() joins cleanly."""
    import time
    from video_learning_tpu import checkpoint as ckpt_mod

    feeder = _async_feeder(tmp_path)
    feeder.num_saves = 2
    feeder.save_interval = 1
    paths = []
    for step in range(4):
        paths.append(feeder.save({"params": {"w": np.full(3, step * 1.0)}},
                                 "ep_%d" % step, step))
        feeder.get_batch_index = lambda s=step: s  # moves between saves
        time.sleep(0.01)
    feeder.finish_saves()
    remaining = sorted(f for f in os.listdir(tmp_path / "checkpoints")
                       if f.endswith(".ckpt"))
    assert len(remaining) == 2          # pruning ran on the worker
    state = {"params": {"w": np.zeros(3)}}
    ckpt_mod.restore_checkpoint(paths[-1], state)
    assert np.allclose(state["params"]["w"], 3.0)
    import json
    with open(paths[-1] + ".snap") as f:
        snap = json.load(f)
    assert snap == [7, 0, 3] or snap == [2, 0, 3]  # cursor at submit time


def test_async_checkpoint_error_propagates(tmp_path, monkeypatch):
    """A failed background write must surface on the main thread at the
    next save/finish_saves, not vanish with the worker."""
    from video_learning_tpu import checkpoint as ckpt_mod

    feeder = _async_feeder(tmp_path)

    def boom(path, state):
        raise IOError("disk full")

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", boom)
    feeder.save({"params": {"w": np.ones(3)}}, "ep_0", 0)
    with pytest.raises(IOError, match="disk full"):
        feeder.finish_saves()
    # the error is consumed: a later save starts clean
    monkeypatch.undo()
    feeder.save({"params": {"w": np.ones(3)}}, "ep_1", 1)
    feeder.finish_saves()


def test_should_save_cadence():
    from video_learning_tpu.data.feeder import Feeder
    feeder = Feeder(defs.input_mode.video, [defs.phase.train],
                    (object(), None), 1.0, "/tmp", False)
    feeder.phase = defs.phase.train
    feeder.save_interval = 3
    assert not feeder.should_save(1)
    assert not feeder.should_save(2)
    assert feeder.should_save(3)
    assert feeder.should_save(6)
    feeder.save_interval = -1
    assert not feeder.should_save(3)


# --------------------------------------------------------- LR schedule gold
class _S:
    pass


def _settings(base_lr, epochs, decay):
    s = _S()
    s.train = _S()
    s.train.base_lr = base_lr
    s.train.epochs = epochs
    s.train.lr_decay = decay
    s.run_folder = None
    s.run_id = "t"
    return s


def test_lr_schedule_staircase_interval():
    from video_learning_tpu.train import precompute_learning_rates
    lrs = precompute_learning_rates(
        _settings(1.0, 1, ["staircase", "interval", 4, 0.5]), 12)
    assert lrs == [1.0] * 4 + [0.5] * 4 + [0.25] * 4


def test_lr_schedule_drops():
    from video_learning_tpu.train import precompute_learning_rates
    # 10 batches x 2 epochs = 20 steps, 4 drops -> period ceil(20/4)=5
    lrs = precompute_learning_rates(
        _settings(1.0, 2, ["exp", "drops", 4, 0.1]), 10)
    assert len(lrs) == 20
    assert lrs[0] == 1.0
    assert lrs[5] == pytest.approx(0.1)
    assert lrs[10] == pytest.approx(0.01)
    assert len(set(lrs)) == 4


def test_lr_schedule_offset():
    from video_learning_tpu.train import precompute_learning_rates
    # 5th element: drop offset (reference train.py:58,94-96)
    lrs = precompute_learning_rates(
        _settings(1.0, 1, ["staircase", "interval", 2, 0.5, 3]), 8)
    assert lrs[:3] == [1.0, 1.0, 1.0]
    assert lrs[3] == 1.0  # shifted schedule start
    assert len(lrs) == 8


def test_lr_schedule_exp_equals_staircase_reference_quirk():
    """Reference parity pin: 'exp' decay yields the SAME schedule as
    'staircase' — the reference's idx is always a multiple of decay_freq
    when the fraction is taken (reference train.py:83-91), so the
    smooth/jagged branch is dead there, and deliberately dead here (see
    precompute_learning_rates docstring)."""
    from video_learning_tpu.train import precompute_learning_rates
    exp = precompute_learning_rates(
        _settings(1.0, 1, ["exp", "interval", 4, 0.5]), 12)
    stair = precompute_learning_rates(
        _settings(1.0, 1, ["staircase", "interval", 4, 0.5]), 12)
    assert exp == stair == [1.0] * 4 + [0.5] * 4 + [0.25] * 4


def test_lr_schedule_none_decay():
    from video_learning_tpu.train import precompute_learning_rates
    lrs = precompute_learning_rates(_settings(0.3, 2, None), 5)
    assert lrs == [0.3] * 10


def test_lr_schedule_warmup_flat():
    from video_learning_tpu.train import precompute_learning_rates
    s = _settings(1.0, 1, None)
    s.train.lr_warmup = 4
    lrs = precompute_learning_rates(s, 8)
    assert lrs == pytest.approx([0.25, 0.5, 0.75, 1.0, 1.0, 1.0, 1.0, 1.0])


def test_lr_schedule_warmup_on_decay():
    """Warmup multiplies whatever the decay produced — the ramp and an
    early staircase drop compose."""
    from video_learning_tpu.train import precompute_learning_rates
    s = _settings(1.0, 1, ["staircase", "interval", 2, 0.5])
    s.train.lr_warmup = 4
    lrs = precompute_learning_rates(s, 6)
    # decayed schedule: [1, 1, .5, .5, .25, .25]; ramp (i+1)/4 on first 4
    assert lrs == pytest.approx([0.25, 0.5, 0.375, 0.5, 0.25, 0.25])


def test_lr_schedule_cosine():
    from video_learning_tpu.train import precompute_learning_rates
    import math
    # 12 steps, recompute every 4 -> 3 segments: progress 0, 0.5, 1.0
    lrs = precompute_learning_rates(
        _settings(1.0, 1, ["cosine", "interval", 4, 0.1]), 12)
    seg = [lrs[0], lrs[4], lrs[8]]
    expect = [0.1 + 0.9 * 0.5 * (1 + math.cos(math.pi * p))
              for p in (0.0, 0.5, 1.0)]
    assert seg == pytest.approx(expect)
    assert lrs[0] == pytest.approx(1.0) and lrs[-1] == pytest.approx(0.1)
    assert lrs == sorted(lrs, reverse=True)  # monotone non-increasing


def test_lr_schedule_cosine_drops():
    from video_learning_tpu.train import precompute_learning_rates
    lrs = precompute_learning_rates(
        _settings(2.0, 2, ["cosine", "drops", 4, 0.0]), 10)
    assert len(lrs) == 20 and len(set(lrs)) == 4
    assert lrs[0] == pytest.approx(2.0) and lrs[-1] == pytest.approx(0.0)


# ------------------------------------------------------- multi-label loss
def test_multilabel_softmax_ce():
    from video_learning_tpu.train import softmax_cross_entropy
    import jax.numpy as jnp
    logits = jnp.asarray([[2.0, 2.0, -5.0]])
    multi_hot = jnp.asarray([[1, 1, 0]], jnp.int32)
    loss = float(softmax_cross_entropy(logits, multi_hot))
    # -sum over two active labels of log_softmax ~= 2 * log(2) for the
    # symmetric case (third logit negligible)
    assert loss == pytest.approx(2 * np.log(2), abs=0.01)


def test_greedy_decode_input_bias_mode():
    import jax
    from video_learning_tpu.models import lstm as lstm_mod
    from video_learning_tpu.models.layers import fc_init
    V, E, H, B, T = 7, 5, 6, 2, 4
    params = lstm_mod.init(jax.random.PRNGKey(0), E, H, 1)
    out_fc = fc_init(jax.random.PRNGKey(1), H, V)
    emb = jax.random.normal(jax.random.PRNGKey(2), (V, E))
    visual = jax.random.normal(jax.random.PRNGKey(3), (B, E))
    idx = lstm_mod.greedy_decode(params, out_fc, visual, emb, 0, T, H,
                                 defs.rnn_visual_mode.input_bias)
    assert idx.shape == (B, T)


def test_remat_matches_no_remat():
    """jax.checkpoint on the frame encoder must not change gradients."""
    import jax
    import __graft_entry__ as graft
    from video_learning_tpu.train import softmax_cross_entropy

    def grads_with(remat):
        settings, model = graft._flagship()
        settings.compute_dtype = "float32"
        settings.remat = remat
        params = model.init_params(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        feed = {"frames_main_input":
                rng.randn(8, 67, 67, 3).astype(np.float32)}
        labels = np.eye(16, dtype=np.int32)[np.arange(2) % 16]

        def loss(p):
            logits = model.apply(p, feed)
            return softmax_cross_entropy(logits, labels)

        return jax.jit(jax.grad(loss))(params)

    import jax
    g0 = grads_with(False)
    g1 = grads_with(True)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_greedy_decode_return_type_standard():
    import jax
    from video_learning_tpu.models import lstm as lstm_mod
    from video_learning_tpu.models.layers import fc_init
    V, E, H, B, T = 7, 5, 6, 2, 4
    params = lstm_mod.init(jax.random.PRNGKey(0), E, H, 1)
    out_fc = fc_init(jax.random.PRNGKey(1), H, V)
    emb = jax.random.normal(jax.random.PRNGKey(2), (V, E))
    visual = jax.random.normal(jax.random.PRNGKey(3), (B, H))
    idx, logits = lstm_mod.greedy_decode(
        params, out_fc, visual, emb, 0, T, H,
        defs.rnn_visual_mode.state_bias,
        return_type=defs.return_type.standard)
    assert idx.shape == (B, T)
    assert logits.shape == (B, T, V)
    # emitted indices are the logits' argmax at every step
    assert np.array_equal(np.argmax(np.asarray(logits), -1),
                          np.asarray(idx))


def test_clip_grads_per_tensor():
    import jax
    import jax.numpy as jnp
    from video_learning_tpu.train import _clip_per_tensor_norm
    tx = _clip_per_tensor_norm(1.0)
    grads = {"a": jnp.asarray([3.0, 4.0]),      # norm 5 -> scaled to 1
             "b": jnp.asarray([0.3, 0.4])}      # norm .5 -> untouched
    out, _ = tx.update(grads, tx.init(grads))
    assert np.isclose(float(jnp.linalg.norm(out["a"])), 1.0)
    assert np.allclose(np.asarray(out["b"]), [0.3, 0.4])


def test_batch_geometry_growth_and_mask():
    from video_learning_tpu.batching import BatchGeometry
    g = BatchGeometry()
    # ragged first batch (e.g. resume onto the final batch)
    f1 = {"labels": np.ones((2, 3)), "x": np.ones((4, 5))}
    out, n_valid, padding = g.pad_feed(f1)
    assert n_valid == 2 and padding == 0
    # full batch afterwards grows the geometry instead of erroring
    f2 = {"labels": np.ones((5, 3)), "x": np.ones((10, 5))}
    out, n_valid, padding = g.pad_feed(f2)
    assert out["labels"].shape == (5, 3)
    # then ragged again pads up with a correct mask
    f3 = {"labels": np.ones((3, 3)), "x": np.ones((6, 5))}
    out, n_valid, padding = g.pad_feed(f3)
    assert out["labels"].shape == (5, 3)
    assert out["x"].shape == (10, 5)
    assert padding == 2
    assert out["label_mask"].tolist() == [1, 1, 1, 0, 0]


def test_batch_geometry_preserves_caption_mask():
    from video_learning_tpu.batching import BatchGeometry
    g = BatchGeometry()
    feed = {"labels": np.ones((4, 3)),
            "label_mask": np.asarray([1.0, 0.0, 1.0, 0.0])}
    out, _, _ = g.pad_feed(feed)
    # intra-caption padding zeros must survive (was overwritten before)
    assert out["label_mask"].tolist() == [1, 0, 1, 0]


def test_orbax_checkpoint_roundtrip(tmp_path):
    """The orbax backend saves/restores the same flat mapping; name-diff
    restore and inspection keep working on directory checkpoints."""
    from video_learning_tpu import checkpoint as ck
    state = {"params": {"fc": {"w": np.arange(6, dtype=np.float32)
                               .reshape(2, 3),
                               "b": np.ones(3, np.float32)}},
             "opt_state_leaves": [np.zeros(2, np.float32)]}
    path = str(tmp_path / "x.ckpt")
    ck.save_checkpoint_orbax(path, state)
    assert ck.is_orbax_checkpoint(path)
    names = ck.get_checkpoint_tensor_names(path)
    assert "params/fc/w" in names
    target = {"params": {"fc": {"w": np.zeros((2, 3), np.float32),
                                "b": np.zeros(3, np.float32)}},
              "opt_state_leaves": [np.ones(2, np.float32)]}
    restored = ck.restore_checkpoint(path, target)
    assert np.allclose(restored["params"]["fc"]["w"],
                       state["params"]["fc"]["w"])
    assert np.allclose(restored["opt_state_leaves"][0], 0.0)
    ck.delete_checkpoint(path)
    import os
    assert not os.path.exists(path)


def test_fixed_name_checkpoint_overwrite(tmp_path):
    """feeder.save(fixed_name=...) overwrites one slot (best.ckpt) on
    both backends: the new params land, the .snap is rewritten, and the
    slot stays outside get_run_checkpoints."""
    import json as json_mod

    from video_learning_tpu import checkpoint as ck
    from video_learning_tpu.data.feeder import Feeder
    from video_learning_tpu.utils import get_run_checkpoints

    for backend in ("npz", "orbax"):
        folder = tmp_path / backend
        folder.mkdir()
        f = Feeder.__new__(Feeder)
        f.run_folder = str(folder)
        f.train = None
        f.num_saves = 0
        f.checkpoint_backend = backend
        f.checkpoint_async = False
        f.save({"w": np.full((3,), 1.0)}, "best", 1, batch_index=0,
               fixed_name="best")
        f.save({"w": np.full((3,), 2.0)}, "best", 7, batch_index=0,
               fixed_name="best")
        base = folder / "checkpoints" / "best.ckpt"
        assert base.exists()
        flat = ck.load_flat(str(base))
        np.testing.assert_array_equal(flat["w"], np.full((3,), 2.0))
        with open(str(base) + ".snap") as fh:
            assert json_mod.load(fh) == [0, 0, 7]
        # exactly one slot, and it is not in the rotation listing
        assert [p for p in (folder / "checkpoints").iterdir()
                if p.name.endswith(".ckpt")] == [base]
        assert get_run_checkpoints(str(folder)) == []
