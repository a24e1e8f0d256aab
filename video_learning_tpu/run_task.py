"""CLI driver: training and validation runs from a YAML config.

Counterpart of /root/reference/run_task.py.  Flow (run_task.py:117-152):
Settings -> Feeder -> Model -> Train/Validation -> checkpoint restore ->
one of do_train / do_test.  The hot loop keeps the reference's logging and
checkpoint cadence (per-iteration loss/lr/nats lines, min-loss tracking,
periodic + end-of-training saves) while the compute is a single jitted SPMD
step; metrics stream to a JSONL writer instead of TF summaries.

Usage: python -m video_learning_tpu.run_task config.yml
"""

import argparse
import json
import math
import os
import time

import jax
import numpy as np

from video_learning_tpu import checkpoint as ckpt_mod
from video_learning_tpu.config import Settings
from video_learning_tpu.data import captions as captions_mod
from video_learning_tpu.defs import defs
from video_learning_tpu.models.pipeline import Model
from video_learning_tpu.observe import MetricsWriter
from video_learning_tpu.train import Train
from video_learning_tpu.utils import elapsed_str, error, info, warning
from video_learning_tpu.val import Validation


def print_iter_info(settings, feeder, num_data, num_labels, padding,
                    batch_index=None):
    dataset = feeder.datasets[settings.phase][0]
    if batch_index is None:
        batch_index = dataset.batch_index
    padinfo = " (%d padding)" % padding if padding > 0 else ""
    epoch_str = "" if settings.phase == defs.phase.val else \
        "epoch: %2d/%2d," % (settings.train.epoch_index + 1,
                             settings.train.epochs)
    info("Mode: [%s], %s batch %4d / %4d : %s data%s, %s labels"
         % (settings.phase, epoch_str, batch_index,
            len(dataset.batches), str(num_data), padinfo, str(num_labels)))


def _prepare_feed(feed, batches, model):
    """Attach caption inputs when the main dataset is a captioner."""
    main = batches.get(defs.dataset_tag.main)
    if main is not None and main.caption is not None:
        cap = main.caption
        feed["caption_words"] = cap["word_embeddings"]
        feed["caption_lengths"] = np.asarray(
            [l + 1 for l in cap["caption_lengths"]], np.int32)
        feed["caption_mask"] = cap["mask"]
        if len(cap["non_padding_index"]) == len(main.labels):
            # training: scatter the (caption+EOS) one-hots onto the padded
            # (B*T, C) word grid so loss rows align with LSTM outputs
            B, T = cap["mask"].shape
            C = main.labels.shape[-1]
            padded = np.zeros((B * T, C), main.labels.dtype)
            padded[np.asarray(cap["non_padding_index"], np.int64)] = \
                main.labels
            feed["labels"] = padded
            feed["label_mask"] = cap["mask"].reshape(-1)
    return feed


def _count_clips(batches, fpc_by_tag):
    """CLIPS in a step's batches, for the streamed clips/s metric.
    Counts visual rows / frames-per-clip rather than label rows —
    caption training pads labels to a (B*T, C) word grid, which would
    overstate the rate by the caption length T."""
    return sum(b.visual.shape[0] // (fpc_by_tag.get(tag) or 1)
               for tag, b in batches.items())


def _install_preempt_handler():
    """Catch SIGTERM — the grace signal cloud schedulers send before
    reclaiming a preemptible TPU VM — and record it instead of dying
    mid-step, so the train loop can save a resumable checkpoint and exit
    cleanly.  Returns (flag, restore_fn); flag["sig"] is set when the
    signal arrives.  No-op when not on the main thread (signal handlers
    can only be installed there, e.g. under some test harnesses)."""
    import signal
    flag = {"sig": None}

    def handler(signum, frame):
        flag["sig"] = signum

    try:
        prev = signal.signal(signal.SIGTERM, handler)
    except ValueError:          # not the main thread
        return flag, lambda: None

    def restore():
        signal.signal(signal.SIGTERM, prev)

    return flag, restore


def _make_inline_validation(settings, feeder, model):
    """Build the Validation for train-phase inline eval
    (``eval_every_epochs``, a TPU-native addition — the reference rejects
    simultaneous train+val and re-runs run_task per checkpoint).  Logits
    stay in memory (no chunk files: the standalone val phase owns those
    artifacts) and the forward is compiled once and reused every eval.
    Built with the feeder on the VAL phase so device-preprocessor specs
    come from the val datasets."""
    from video_learning_tpu.val import Validation
    old_interval = settings.val.logits_save_interval
    settings.val.logits_save_interval = None
    feeder.set_phase(defs.phase.val)
    try:
        return Validation(settings, model)
    finally:
        feeder.set_phase(defs.phase.train)
        settings.val.logits_save_interval = old_interval


def run_inline_eval(settings, val, params, feeder, model):
    """One full pass over the val datasets with the LIVE training params;
    returns accuracy.  The train-phase feeder position is untouched (val
    datasets are separate objects; the phase flips back in all cases).
    The loop body is do_test's own run_val_batch, so inline numbers can
    never drift from the standalone val phase."""
    from video_learning_tpu.batching import BatchGeometry
    val.reset_accumulation()
    feeder.set_phase(defs.phase.val)
    try:
        feeder.rewind_datasets(next_epoch=False)
        geometry = BatchGeometry()
        while feeder.loop():
            feed, batches = feeder.get_feed(model.required_input)
            feed = _prepare_feed(feed, batches, model)
            feed, _, padding = geometry.pad_feed(feed)
            run_val_batch(settings, val, params, model, feed, batches,
                          padding, [])
        return val.get_accuracy()
    finally:
        # training replaces params every step; a reused Validation must
        # not pin this eval's full parameter copies in HBM until the
        # next eval
        val.release_params()
        feeder.set_phase(defs.phase.train)


def _eval_state_path(settings):
    return os.path.join(settings.run_folder, "checkpoints",
                        "eval_state.json")


def _load_eval_state(settings):
    """(best_acc, stale_evals) for resumed runs — without this a
    preemption resume would reset best_acc and let the next (worse)
    eval overwrite best.ckpt, and early_stop_patience would restart."""
    try:
        with open(_eval_state_path(settings)) as f:
            d = json.load(f)
        return float(d["best_acc"]), int(d["stale_evals"])
    except (OSError, ValueError, KeyError):
        return -1.0, 0


def _save_eval_state(settings, best_acc, stale_evals):
    import jax
    if jax.process_index() != 0:        # shared run folder: one writer
        return
    path = _eval_state_path(settings)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"best_acc": best_acc, "stale_evals": stale_evals}, f)
    os.replace(tmp, path)


def do_train(settings, engine, feeder, model, writer):
    """Epoch/batch training loop (reference run_task.py:25-81) with a
    background prefetcher overlapping host decode and device compute."""
    from video_learning_tpu.data.prefetch import FeedPrefetcher
    required_input = model.required_input
    run_batch_count = 0
    min_train_loss = (1e9, -1)
    eval_every = int(getattr(settings.train, "eval_every_epochs", 0) or 0)
    patience = int(getattr(settings.train, "early_stop_patience", 0) or 0)
    inline_val = None
    best_acc, stale_evals = -1.0, 0
    if eval_every and settings.should_resume():
        best_acc, stale_evals = _load_eval_state(settings)
    preempt, restore_handler = _install_preempt_handler()
    preempted = False
    step_tic = None     # e2e throughput clock (clips/s in the metrics)
    fpc_by_tag = {d.tag: d.num_frames_per_clip
                  for d in feeder.get_datasets()}
    profiler = None
    if getattr(settings, "profile_steps", None):
        from video_learning_tpu.observe import StepProfiler
        profiler = StepProfiler(
            os.path.join(settings.run_folder, "profile"),
            settings.profile_steps[0], settings.profile_steps[1])
    info("Starting train")
    def prepare(feed, batches):
        # runs in the prefetch thread: caption framing + padding + the
        # host->device transfer all overlap the previous step's compute
        feed = _prepare_feed(feed, batches, model)
        return engine.prepare_device_feed(feed)

    try:
        for _ in range(settings.train.epoch_index, settings.train.epochs):
            epoch_start_count = run_batch_count
            prefetcher = FeedPrefetcher(feeder, required_input, prepare)
            for feed, batches, batch_index in prefetcher:
                num_data = [b.visual.shape[0] for b in batches.values()]
                # log the production-time index: the prefetch thread
                # advances the feeder's live cursor ahead of the batch
                # being trained
                print_iter_info(settings, feeder, num_data,
                                len(feed["labels"]), 0,
                                batch_index=batch_index + 1)
                run_batch_count += 1
                if profiler:
                    profiler.maybe_start(engine.global_step)
                metrics = engine.run_step(feed)
                settings.global_step = engine.global_step
                if profiler:
                    profiler.maybe_stop(engine.global_step)
                # end-to-end throughput (host input + transfer + device
                # step, prefetch overlap included): wall time between
                # consecutive completed steps.  The first step has no
                # predecessor (and absorbs the jit compile), so it
                # reports none — the reference's north-star metric
                # (clips/sec/chip) streamed per step instead of only
                # measured offline by bench.py
                now = time.monotonic()
                if step_tic is not None:
                    metrics["clips_per_sec"] = round(
                        _count_clips(batches, fpc_by_tag)
                        / max(now - step_tic, 1e-9), 2)
                step_tic = now
                if metrics["loss"] < min_train_loss[0]:
                    min_train_loss = (metrics["loss"], engine.global_step)
                nats = metrics["loss"] / math.log(settings.num_classes)
                info("Learning rate %2.8f, global step: %d, batch "
                     "loss/nats : %2.5f / %2.3f%s"
                     % (metrics["lr"], engine.global_step,
                        metrics["loss"], nats,
                        (", clips/s: %2.1f" % metrics["clips_per_sec"])
                        if "clips_per_sec" in metrics else ""))
                writer.write(engine.global_step, **metrics)
                saved_this_batch = feeder.should_save(run_batch_count)
                if saved_this_batch:
                    progress = "ep_%d_btch_%d_gs_%d" % (
                        1 + settings.train.epoch_index, batch_index + 1,
                        engine.global_step)
                    feeder.save(engine.state_dict(), progress,
                                engine.global_step,
                                batch_index=batch_index + 1)
                    # checkpoint time is not training throughput: restart
                    # the step clock so the next step's clips/s does not
                    # absorb the save
                    step_tic = time.monotonic()
                if preempt["sig"] is not None:
                    info("Caught signal %d (preemption): saving "
                         "checkpoint and stopping after %d batches this "
                         "epoch." % (preempt["sig"], batch_index + 1))
                    if saved_this_batch:
                        # the periodic save above already checkpointed
                        # this exact position — a second full save would
                        # only burn a max_to_keep slot and (async) block
                        # on the write
                        info("Position already checkpointed by the "
                             "periodic save this batch; skipping the "
                             "duplicate.")
                    else:
                        progress = "ep_%d_btch_%d_gs_%d_preempt" % (
                            1 + settings.train.epoch_index,
                            batch_index + 1, engine.global_step)
                        feeder.save(engine.state_dict(), progress,
                                    engine.global_step,
                                    batch_index=batch_index + 1)
                    preempted = True
                    break
            if preempted:
                # mid-epoch stop: do NOT advance epoch_index or rewind —
                # the .snap sidecar holds (batch_index, epoch) and resume
                # restores the position O(1) (data/dataset.py restore)
                break
            if run_batch_count > 0:
                info("Epoch [%d] training run complete."
                     % (1 + settings.train.epoch_index))
            else:
                info("Resumed epoch [%d] is already complete."
                     % (1 + settings.train.epoch_index))
            settings.train.epoch_index += 1
            feeder.rewind_datasets()
            if eval_every and run_batch_count > epoch_start_count and \
                    settings.train.epoch_index % eval_every == 0:
                # skip epochs that trained no batches (a resume landing
                # on an already-complete epoch): the params didn't
                # change, so re-evaluating would double-count staleness
                if inline_val is None:
                    inline_val = _make_inline_validation(settings, feeder,
                                                         model)
                acc = run_inline_eval(settings, inline_val,
                                      engine.eval_params(), feeder, model)
                step_tic = None   # eval time is not training throughput
                info("Inline validation after epoch %d: accuracy %2.5f"
                     % (settings.train.epoch_index, acc))
                writer.write(engine.global_step, val_accuracy=acc)
                if acc > best_acc:
                    best_acc, stale_evals = acc, 0
                    if getattr(settings.train, "eval_keep_best", False):
                        # position = start of the next epoch (the feeder
                        # just rewound); resume with resume_file: best
                        feeder.save(engine.state_dict(), "best",
                                    engine.global_step, batch_index=0,
                                    fixed_name="best")
                else:
                    stale_evals += 1
                _save_eval_state(settings, best_acc, stale_evals)
                if patience and stale_evals >= patience:
                    info("Early stop: val accuracy has not improved "
                         "over %2.5f for %d evals." % (best_acc,
                                                       stale_evals))
                    break
        info("Minimum training loss: %2.5f at global step %d"
             % min_train_loss)
        if run_batch_count > 0 and not preempted and \
                not feeder.should_save(run_batch_count):
            info("Saving model checkpoint out of turn (training "
                 "finished).")
            progress = "ep_%d_btch_%d_gs_%d" % (
                1 + settings.train.epoch_index, feeder.get_num_batches(),
                settings.global_step)
            feeder.save(engine.state_dict(), progress,
                        settings.global_step)
    finally:
        # join any in-flight async checkpoint write (and surface its
        # error) even when the loop itself raised — otherwise the process
        # unwinds past a daemon writer mid-write, killing the file it
        # already logged as saved (and dropping a stored earlier failure)
        try:
            feeder.finish_saves()
        finally:
            restore_handler()
    if preempted:
        info("Training preempted — resume with resume_file: latest to "
             "continue from the saved position.")


def run_val_batch(settings, val, params, model, feed, batches, padding,
                  caption_rows):
    """Forward + accumulate one validation batch.  Shared by do_test and
    tools/infer so serving can never drift from evaluation."""
    if model.caption_dataset is not None:
        # one decoded row per batch ITEM (for video datasets
        # visual.shape[0] counts frames, not items — use the caption
        # framing's item count)
        main = batches[defs.dataset_tag.main]
        real_items = len(main.caption["caption_lengths"])
        idx_rows = val.run_forward(params, feed, decode=True)
        dset = model.caption_dataset
        for row in idx_rows[:real_items]:
            caption_rows.append(captions_mod.trim_at_eos(
                row, dset.vocabulary, dset.max_caption_length))
    else:
        logits = val.run_forward(params, feed)
        val.process_validation_logits(
            defs.dataset_tag.main, settings, logits, feed["labels"],
            padding)
        val.save_validation_logits_chunk()


def do_test(settings, val, params, feeder, model, writer):
    """Validation loop (reference run_task.py:84-114)."""
    from video_learning_tpu.batching import BatchGeometry
    tic = time.time()
    required_input = model.required_input
    geometry = BatchGeometry()
    is_caption = model.caption_dataset is not None
    caption_rows = []
    top_ks = list(settings.val.top_k or [])
    for k in top_ks:
        # fail BEFORE the (potentially hours-long) eval loop, not in the
        # accuracy pass after it
        if k >= settings.num_classes:
            error("val: top_k=%d needs more than %d classes"
                  % (k, settings.num_classes))
    while feeder.loop():
        feed, batches = feeder.get_feed(required_input)
        feed = _prepare_feed(feed, batches, model)
        feed, n_valid, padding = geometry.pad_feed(feed)
        num_data = [b.visual.shape[0] for b in batches.values()]
        print_iter_info(settings, feeder, num_data, n_valid, padding)
        run_val_batch(settings, val, params, model, feed, batches,
                      padding, caption_rows)
    accuracy = None
    if is_caption:
        val.process_description(settings, caption_rows)
    else:
        val.save_validation_logits_chunk(save_all=True)
        accs = val.get_accuracies([1] + top_ks)
        accuracy = accs[1]
        info("Validation run complete in [%s], accuracy: %2.5f"
             % (elapsed_str(tic), accuracy))
        # extra top-k accuracies (val: top_k) — top-1 stays the primary
        # artifact for reference compatibility
        topk_accs = {k: accs[k] for k in top_ks}
        for k in top_ks:
            info("Top-%d accuracy: %2.5f" % (k, topk_accs[k]))
        if val.validation_logits_save_interval is not None and \
                jax.process_index() == 0:  # shared run folder: one writer
            import os
            with open(os.path.join(settings.run_folder,
                                   "accuracy_" + settings.run_id),
                      "w") as f:
                f.write(str(accuracy))
            for k, acc in topk_accs.items():
                with open(os.path.join(
                        settings.run_folder,
                        "accuracy_top%d_%s" % (k, settings.run_id)),
                          "w") as f:
                    f.write(str(acc))
    writer.flush()
    return accuracy


def main(init_file):
    from video_learning_tpu.parallel.mesh import init_platform
    init_platform()
    settings = Settings()
    feeder = settings.initialize(init_file)

    model = Model(settings)
    writer = MetricsWriter(settings.tensorboard_folder, settings.run_id,
                           settings.timestamp,
                           events=getattr(settings, "tensorboard_events",
                                          False),
                           primary=jax.process_index() == 0)

    if settings.train:
        engine = Train(settings, feeder, model, seed=settings.seed)
        engine.global_step = settings.global_step
        ignorables = model.get_ignorable_variable_names()
        if not settings.train.ema_decay:
            # a checkpoint from an EMA run restores cleanly into a
            # non-EMA continuation (shadow params skipped silently)
            ignorables = ignorables + ["ema_params"]
        loaded = []
        state = feeder.init_saveload(
            engine.state_dict(), settings.resume_file, ignorables,
            loaded_out=loaded)
        engine.load_state_dict(state, restored_names=loaded)
        engine.place_params()
        do_train(settings, engine, feeder, model, writer)
    else:
        val = Validation(settings, model)
        params = model.init_params(jax.random.PRNGKey(settings.seed))
        use_ema = bool(settings.val and
                       getattr(settings.val, "use_ema", False))
        state, ignorables = ckpt_mod.prepare_eval_state(
            params, model.get_ignorable_variable_names(), use_ema)
        feeder.compute_save_interval()
        loaded = []
        resumed = settings.should_resume()
        if resumed:
            state = feeder.init_saveload(
                state, settings.resume_file, ignorables,
                loaded_out=loaded)
        eval_params, _ = ckpt_mod.select_eval_params(
            state, loaded, use_ema, resumed, "val: use_ema")
        do_test(settings, val, eval_params, feeder, model, writer)

    writer.close()
    info("Run [%s] complete." % settings.run_id, email=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("init_file", help="YAML configuration for the run.")
    args = parser.parse_args()
    main(args.init_file)
