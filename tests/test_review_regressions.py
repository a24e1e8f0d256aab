"""Regression tests for review findings (chunk ordering, prefetch
cancellation, caption grid contract, stale accuracy harvesting, 8-bit
WAV decoding)."""

import os
import pickle
import threading
import time
import wave

import numpy as np
import pytest


def test_combine_runs_numeric_chunk_order(tmp_path):
    from video_learning_tpu.tools.combine_runs import load_run_logits
    for i in (0, 1, 2, 10, 11):
        pickle.dump(np.full((1, 2), i, np.float32),
                    open(tmp_path / ("validation_logits_x.part_%d" % i),
                         "wb"))
    out = load_run_logits(str(tmp_path), 2)
    assert out[:, 0].astype(int).tolist() == [0, 1, 2, 10, 11]


def test_prefetcher_cancels_producer_on_consumer_exit():
    from video_learning_tpu.data.prefetch import FeedPrefetcher

    class FakeFeeder:
        def __init__(self):
            self.i = 0

        def loop(self):
            return self.i < 1000

        def get_batch_index(self):
            return self.i

        def get_feed(self, req):
            self.i += 1
            return {"x": self.i}, {}

    pf = FeedPrefetcher(FakeFeeder(), [], None, depth=2)
    tic = time.time()
    with pytest.raises(RuntimeError):
        for feed, batches, bi in pf:
            if bi == 3:
                raise RuntimeError("step failed")
    assert time.time() - tic < 5
    assert not [t for t in threading.enumerate()
                if t.name == "feed-prefetch" and t.is_alive()]


def test_labels_to_words_val_grid_contract():
    """include_labels=False (val) must still produce a B*T word grid."""
    from video_learning_tpu.data import captions as cap
    vocab = ["a", "b", "UNK", "EOS", "BOS"]
    emb = np.arange(5 * 3, dtype=np.float32).reshape(5, 3)
    out = cap.labels_to_words([[0, 1], [1]], emb, vocab, 5,
                              max_sequence_length=4, include_labels=False,
                              do_padding=True)
    assert out["word_embeddings"].shape == (2 * 4, 3)
    # only the BOS row is a real input in val mode
    assert out["mask"].tolist() == [[1, 0, 0, 0], [1, 0, 0, 0]]
    assert out["non_padding_index"] == [0, 4]


def test_caption_id_shortfall_errors(tmp_path):
    from video_learning_tpu.data import captions as cap
    from video_learning_tpu.utils import FrameworkError
    paths = tmp_path / "imgs.txt"
    paths.write_text("COCO_val_000000000001.jpg 0\n")
    rec = str(paths) + ".tfrecord"
    with pytest.raises(FrameworkError):
        cap.validation_logits_to_captions([[0], [1]], rec,
                                          ["a", "EOS"], "coco")


def test_wav_8bit_unsigned(tmp_path):
    from video_learning_tpu.audio.spectrograms import read_wav
    rate = 8000
    t = np.arange(rate) / rate
    # 8-bit unsigned samples centered at 128
    sig = (np.sin(2 * np.pi * 100 * t) * 100 + 128).astype(np.uint8)
    p = tmp_path / "u8.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(rate)
        w.writeframes(sig.tobytes())
    data, r = read_wav(str(p))
    assert r == rate
    assert abs(float(np.mean(data))) < 0.02       # centered
    assert 0.5 < float(np.max(data)) <= 1.0       # full positive swing


def test_stale_accuracy_not_harvested(tmp_path, monkeypatch):
    """evaluate_multiple_checkpoints must pick the run's fresh accuracy
    file, not a stale one from an earlier run."""
    from video_learning_tpu.tools import evaluate_multiple_checkpoints as e
    import yaml
    run_folder = tmp_path / "run"
    ckpt_dir = run_folder / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    # stale accuracy from some older run id
    (run_folder / "accuracy_old_run").write_text("0.111")
    time.sleep(0.01)
    ckpt = ckpt_dir / "170101_ep_1_btch_1_gs_1.ckpt"
    ckpt.write_bytes(pickle.dumps({"params": {}}))
    cfg = {"run": {"run_folder": str(run_folder), "phase":
                   "defs.phase.train", "data": {}}}
    cfg_path = tmp_path / "c.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    def fake_main(path):
        time.sleep(0.01)
        (run_folder / "accuracy_new_run").write_text("0.987")
        time.sleep(0.01)
        # the top-k artifacts ride along NEWER than the top-1 file; the
        # tool must harvest the primary top-1 accuracy, not these
        (run_folder / "accuracy_top5_new_run").write_text("1.0")

    import video_learning_tpu.run_task as rt
    monkeypatch.setattr(rt, "main", fake_main)
    results = e.evaluate(str(cfg_path))
    assert list(results.values()) == [0.987]


def test_as_num_int_rejects_nonintegral():
    """as_num with conv=int must surface 4.9 as a config error, not
    silently truncate to 4 (round-3 advisor finding)."""
    from video_learning_tpu.utils import FrameworkError, as_num
    assert as_num(4, "f", conv=int) == 4
    assert as_num("4", "f", conv=int) == 4
    assert as_num(4.0, "f", conv=int) == 4
    with pytest.raises(FrameworkError):
        as_num(4.9, "f", conv=int)
    with pytest.raises(FrameworkError):
        as_num("4.9", "f", conv=int)
    # float fields still accept fractional values
    assert as_num(4.9, "f", conv=float) == 4.9


def test_topk_accuracy_weights_chunks_by_size():
    """get_accuracies: top-1 stays unweighted (reference parity), the
    top-k additions weight chunks by row count (round-3 advisor
    finding: a small tail chunk must not be overweighted)."""
    from video_learning_tpu.val import Validation
    v = Validation.__new__(Validation)
    # chunk 0: 4 rows, top-1 correct and top-2 correct on all
    c0 = np.array([[3.0, 1.0, 0.0]] * 4, np.float32)
    l0 = np.array([[1, 0, 0]] * 4, np.float32)
    # chunk 1: 1 row, both top-1 and top-2 wrong
    c1 = np.array([[5.0, 4.0, 0.0]], np.float32)
    l1 = np.array([[0, 0, 1]], np.float32)
    chunks = [c0, c1]
    v.validation_logits_save_counter = 2
    v.validation_logits_save_interval = 1
    v.load_validation_logits_chunk = lambda idx: chunks[idx]
    v.item_logits = np.zeros((0, 3), np.float32)
    v.item_labels = np.concatenate([l0, l1])
    accs = v.get_accuracies([1, 2])
    assert accs[1] == pytest.approx(0.5)        # unweighted (4/4, 0/1)
    assert accs[2] == pytest.approx(0.8)        # weighted: 4 of 5 rows


def test_count_clips_uses_visual_rows_not_label_grid():
    """clips/s must count clips — caption labels are a (B*T, C) word
    grid (round-3 advisor finding)."""
    from video_learning_tpu.run_task import _count_clips

    class B:
        def __init__(self, n):
            self.visual = np.zeros((n, 4), np.float32)

    # main: 2 clips x 8 fpc = 16 frame rows; aux: 6 vector rows (fpc None)
    batches = {"main": B(16), "aux": B(6)}
    assert _count_clips(batches, {"main": 8, "aux": None}) == 2 + 6


def test_compile_cache_dir_rebinds_within_process(tmp_path):
    """JAX binds its persistent compilation cache object at the FIRST
    compile that sees a configured dir and ignores later dir changes;
    config.py must reset that binding so a multi-run process (eval
    fan-outs, the suite itself) writes each run's executables into THAT
    run's directory (round-5 ordering failure: the multiclass anchor's
    compile_cache: True starved test_compile_cache_persists_executables'
    tmpdir)."""
    import jax
    import jax.numpy as jnp
    from video_learning_tpu.config import enable_compile_cache

    dir_a, dir_b = tmp_path / "a", tmp_path / "b"
    try:
        enable_compile_cache(str(dir_a))
        jax.jit(lambda x: x * 2.0 + 1.0)(jnp.arange(8.0)).block_until_ready()
        assert list(dir_a.iterdir()), "dir A received no executables"
        enable_compile_cache(str(dir_b))
        jax.jit(lambda x: x * 3.0 - 2.0)(jnp.arange(9.0)).block_until_ready()
        assert list(dir_b.iterdir()), (
            "dir B empty: the persistent-cache binding did not follow "
            "the configured dir change")
    finally:
        from jax.experimental.compilation_cache import \
            compilation_cache as _cc
        _cc.reset_cache()
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
