"""Per-epoch reshuffling: deterministic, complete, resume-consistent."""

import numpy as np
import pytest

from video_learning_tpu.data import records
from video_learning_tpu.data.dataset import Dataset
from video_learning_tpu.defs import defs


def _pack_videos(tmp_path, cpvs, fpc=2):
    """One video per entry in cpvs; frame pixel value encodes (video,
    clip, frame) so order is observable."""
    path = str(tmp_path / "v.tfrecord")
    with records.RecordWriter(path) as w:
        for v, cpv in enumerate(cpvs):
            for c in range(cpv):
                for f in range(fpc):
                    img = np.full((4, 4, 3), v * 36 + c * 6 + f, np.uint8)
                    w.write(records.encode_image_example(img, v))
    records.write_size_file(len(cpvs), list(cpvs), path, "video", 1, fpc)
    base = str(tmp_path / "v")
    with open(base, "w") as f:
        for v in range(len(cpvs)):
            f.write("vid%d %d\n" % (v, v))
    return base


def _dataset(base, batch_size=2, shuffle=True, seed=7,
             batch_item="default", host_shards=1, host_shard_index=0):
    d = Dataset()
    d.initialize("es", base, None, None, (4, 4, 3), [], None,
                 defs.data_format.tfrecord, "jpg", batch_item, 8,
                 defs.dataset_tag.main, 1)
    d.epoch_shuffle = shuffle
    d.shuffle_seed = seed
    d.host_shards = host_shards
    d.host_shard_index = host_shard_index
    d.calculate_batches(batch_size, defs.input_mode.video)
    d.rewind(next_epoch=False)
    return d


def _epoch_video_order(d):
    """Consume an epoch; return the video id of every frame in order."""
    order = []
    while d.loop():
        b = d.get_next_batch()
        order.extend(int(b.visual[i].ravel()[0]) // 36
                     for i in range(b.visual.shape[0]))
    return order


def test_shuffle_is_complete_and_label_consistent(tmp_path):
    base = _pack_videos(tmp_path, [2, 1, 3, 2])
    d = _dataset(base)
    seen_labels = []
    while d.loop():
        b = d.get_next_batch()
        # each clip's label must match its frames' video id
        fpc = 2
        frames = b.visual.reshape(-1, fpc, 4, 4, 3)
        k = 0
        for row in range(b.labels.shape[0]):
            vid = int(frames[k].ravel()[0]) // 36
            assert np.argmax(b.labels[row]) == vid
            seen_labels.append(vid)
            k += 1
    # every clip seen exactly cpv times
    from collections import Counter
    assert Counter(seen_labels) == Counter({0: 2, 1: 1, 2: 3, 3: 2})


def test_epochs_differ_but_are_deterministic(tmp_path):
    base = _pack_videos(tmp_path, [1, 1, 1, 1, 1, 1])
    d1 = _dataset(base, batch_size=6)
    e0 = _epoch_video_order(d1)
    d1.rewind(next_epoch=True)
    e1 = _epoch_video_order(d1)
    assert sorted(e0) == sorted(e1)
    assert e0 != e1  # reshuffled between epochs
    # same seed + epoch -> same order
    d2 = _dataset(base, batch_size=6)
    assert _epoch_video_order(d2) == e0
    d2.rewind(next_epoch=True)
    assert _epoch_video_order(d2) == e1


def test_restore_reproduces_shuffled_stream(tmp_path):
    base = _pack_videos(tmp_path, [1, 1, 1, 1])
    d1 = _dataset(base, batch_size=1)
    d1.rewind(next_epoch=True)  # epoch 1
    batches = []
    while d1.loop():
        batches.append(d1.get_next_batch().visual.copy())
    d2 = _dataset(base, batch_size=1)
    d2.restore(2, 1)  # resume mid-epoch-1
    resumed = d2.get_next_batch().visual
    assert np.array_equal(resumed, batches[2])


def test_clip_mode_shuffle(tmp_path):
    base = _pack_videos(tmp_path, [2, 2], fpc=2)
    d = _dataset(base, batch_size=2, batch_item="clip")
    frames = []
    while d.loop():
        b = d.get_next_batch()
        # one value per frame
        frames.extend(int(x) for x in
                      b.visual.reshape(-1, 4 * 4 * 3)[:, 0])
    # clips stay contiguous (frame f follows frame f-1 within a clip)
    vals = np.asarray(frames).reshape(-1, 2)
    assert np.all(vals[:, 1] == vals[:, 0] + 1)
    # all 4 clips present
    assert sorted(vals[:, 0].tolist()) == [0, 6, 36, 42]


def test_no_shuffle_keeps_packed_order(tmp_path):
    base = _pack_videos(tmp_path, [1, 1, 1])
    d = _dataset(base, batch_size=3, shuffle=False)
    assert _epoch_video_order(d) == [0, 0, 1, 1, 2, 2]


def test_host_sharding_partitions_items(tmp_path):
    """Each host shard reads a disjoint equal-size item range; the union
    covers the divisible prefix of the dataset exactly once."""
    base = _pack_videos(tmp_path, [1, 2, 1, 1, 2, 1], fpc=2)
    seen = []
    for idx in range(2):
        d = _dataset(base, batch_size=2, shuffle=False,
                     host_shards=2, host_shard_index=idx)
        while d.loop():
            b = d.get_next_batch()
            seen.extend(int(b.visual[i].ravel()[0]) // 36
                        for i in range(0, b.visual.shape[0], 2))
    from collections import Counter
    # every clip exactly once across the two shards
    assert Counter(seen) == Counter({0: 1, 1: 2, 2: 1, 3: 1, 4: 2, 5: 1})


def test_host_sharding_drops_remainder_for_equal_step_counts(tmp_path):
    """With items % shards != 0, the remainder is dropped so every host
    runs an identical number of batches (multi-controller alignment)."""
    base = _pack_videos(tmp_path, [1, 1, 1, 1, 1], fpc=2)
    counts = []
    for idx in range(2):
        d = _dataset(base, batch_size=2, shuffle=False,
                     host_shards=2, host_shard_index=idx)
        counts.append(len(d.batches))
        assert d.num_items == 2
    assert counts[0] == counts[1]


def test_host_sharding_with_epoch_shuffle(tmp_path):
    base = _pack_videos(tmp_path, [1, 1, 1, 1], fpc=2)
    d = _dataset(base, batch_size=2, shuffle=True,
                 host_shards=2, host_shard_index=1)
    vids = _epoch_video_order(d)
    # second shard owns videos 2 and 3 only
    assert sorted(set(vids)) == [2, 3]


# ------------------------------------------------ rotating shard boundary
def test_host_shard_rotation_visits_every_item(tmp_path):
    """7 items on 3 shards (non-divisible): the per-epoch window rotates
    by the remainder, so the union of two consecutive epochs covers
    EVERY item — nothing is permanently excluded — while each shard
    keeps identical per-epoch item and step counts."""
    cpvs = [1, 2, 1, 1, 2, 1, 3]  # ragged cpv exercises the gather map
    base = _pack_videos(tmp_path, cpvs, fpc=2)
    seen = set()
    for epoch in range(2):
        per_epoch = []
        for idx in range(3):
            d = _dataset(base, batch_size=2, shuffle=False,
                         host_shards=3, host_shard_index=idx)
            if epoch:
                d.rewind(next_epoch=True)
            assert d.num_items == 2
            vids = set(_epoch_video_order(d))
            per_epoch.append(vids)
        # shards are disjoint within an epoch
        assert sum(len(s) for s in per_epoch) == \
            len(set().union(*per_epoch))
        seen |= set().union(*per_epoch)
    assert seen == set(range(7))


def test_host_shard_rotation_clip_labels_stay_consistent(tmp_path):
    """Under rotation the gather map must keep each clip's frames with
    its own video's label, including on wrapped windows."""
    cpvs = [1, 2, 1, 1, 2]  # 5 videos, 2 shards -> rotating
    base = _pack_videos(tmp_path, cpvs, fpc=2)
    for epoch in range(3):
        for idx in range(2):
            d = _dataset(base, batch_size=2, shuffle=False,
                         host_shards=2, host_shard_index=idx)
            for _ in range(epoch):
                d.rewind(next_epoch=True)
            while d.loop():
                b = d.get_next_batch()
                frames = b.visual.reshape(-1, 2, 4, 4, 3)
                k = 0
                for row in range(b.labels.shape[0]):
                    vid = int(frames[k].ravel()[0]) // 36
                    assert np.argmax(b.labels[row]) == vid
                    k += 1


def test_host_shard_rotation_restore_is_consistent(tmp_path):
    """restore(batch, epoch) re-derives the SAME rotated window and
    stream position a continuous run would have."""
    base = _pack_videos(tmp_path, [1, 1, 1, 1, 1], fpc=2)
    d1 = _dataset(base, batch_size=1, shuffle=False,
                  host_shards=2, host_shard_index=0)
    d1.rewind(next_epoch=True)  # epoch 1: window shifted by the remainder
    batches = []
    while d1.loop():
        batches.append(d1.get_next_batch().visual.copy())
    d2 = _dataset(base, batch_size=1, shuffle=False,
                  host_shards=2, host_shard_index=0)
    d2.restore(1, 1)
    assert np.array_equal(d2.get_next_batch().visual, batches[1])


def test_host_shard_rotation_composes_with_epoch_shuffle(tmp_path):
    """Rotation + epoch_shuffle: each epoch's shard holds exactly the
    rotated window's items (shuffled order), deterministically."""
    base = _pack_videos(tmp_path, [1, 1, 1, 1, 1, 1, 1], fpc=2)
    runs = []
    for _ in range(2):
        orders = []
        d = _dataset(base, batch_size=2, shuffle=True,
                     host_shards=3, host_shard_index=1)
        for epoch in range(3):
            if epoch:
                d.rewind(next_epoch=True)
            orders.append(_epoch_video_order(d))
        runs.append(orders)
    assert runs[0] == runs[1]  # deterministic in (seed, epoch)
    # shard 1 of 3 with per=2, rem=1: epoch e holds items {2+e, 3+e} mod 7
    for e, order in enumerate(runs[0]):
        assert sorted(set(order)) == sorted({(2 + e) % 7, (3 + e) % 7})
