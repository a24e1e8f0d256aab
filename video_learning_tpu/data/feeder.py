"""Feeder: multi-dataset coordinator + checkpoint/resume orchestration.

Counterpart of /root/reference/feeder.py.  Coordinates datasets keyed by
phase and dataset tag (main/aux), matches each model input requirement
``(name, net_input_type, tag)`` to the right dataset's batch
(feeder.py:84-106), computes the save cadence from ``save_freq_per_epoch``
(feeder.py:123-129), and orchestrates two-part checkpoints: a parameter
checkpoint (handled by checkpoint.py) plus a ``.snap`` training-position
sidecar [batch_index, epoch_index, global_step] (feeder.py:263-288), with
``latest``-checkpoint resolution (feeder.py:143-194).

Graph feed_dicts are replaced by plain dicts of numpy arrays consumed by the
jitted train/eval step functions.
"""

import json
import os
import pickle

from video_learning_tpu.data import dataset as dataset_mod
from video_learning_tpu.defs import defs
from video_learning_tpu.utils import (error, get_datetime_str,
                                      get_run_checkpoints, info)


class Feeder:

    def __init__(self, input_mode, phases, trainval, save_freq_per_epoch,
                 run_folder, resume):
        self.datasets = {}
        self.input_mode = input_mode
        self.phases = phases
        self.phase = None
        self.run_folder = run_folder
        self.resume = resume
        self.train, self.val = trainval
        self.save_freq_per_epoch = save_freq_per_epoch
        self.save_interval = -1
        self.num_saves = 0
        self.checkpoint_async = False
        self._async_saver = None

    # -------------------------------------------------------------- set-up
    def add_dataset(self, dataset_phase, id, path, mean_image, prepend_folder,
                    image_shape, imgproc, raw_image_shape, data_format,
                    frame_format, batch_item, num_classes, tag, read_tries,
                    captioning_config=None):
        dset = dataset_mod.Dataset()
        self.datasets.setdefault(dataset_phase, []).append(dset)
        dset.initialize(id, path, mean_image, prepend_folder, image_shape,
                        imgproc, raw_image_shape, data_format, frame_format,
                        batch_item, num_classes, tag, read_tries,
                        captioning_config)

    def set_phase(self, phase):
        self.phase = phase

    def initialize_datasets(self):
        if not self.datasets:
            error("No dataset configured to active phase [%s]" % self.phase)
        for phase in self.phases:
            for i, dset in enumerate(self.datasets.get(phase, [])):
                info("Reading dataset %d/%d : [%s]"
                     % (i + 1, len(self.datasets[phase]), dset.id))
                if phase == defs.phase.train and self.train:
                    dset.calculate_batches(self.train.batch_size,
                                           self.input_mode)
                elif phase == defs.phase.val and self.val:
                    dset.calculate_batches(self.val.batch_size,
                                           self.input_mode)

    # ------------------------------------------------------------ iteration
    def loop(self):
        return self.datasets[self.phase][0].loop()

    def get_dataset_by_tag(self, tag):
        return [d for d in self.datasets[self.phase] if d.tag == tag]

    def get_num_batches(self):
        if not self.datasets:
            return -1
        return len(self.datasets[self.phase][0].batches)

    def get_batch_index(self):
        return self.datasets[self.phase][0].batch_index

    def get_batch_sizes(self):
        return [d.batch_size for d in self.datasets[self.phase]]

    def get_datasets(self):
        return self.datasets[self.phase]

    def rewind_datasets(self, next_epoch=True):
        for dset in self.datasets[self.phase]:
            dset.rewind(next_epoch=next_epoch)

    def get_next_batch(self):
        """Advance every active dataset one batch; returns
        {tag: Batch} (reference feeder.py:74-81)."""
        out = {}
        for dset in self.datasets[self.phase]:
            if dset.tag in out:
                error("Multiple datasets with tag [%s] in phase [%s]"
                      % (dset.tag, self.phase))
            out[dset.tag] = dset.get_next_batch()
        return out

    def get_feed(self, required_input):
        """Build the model/step input dict by matching each requirement
        ``(name, net_input_type, tag)`` to the tagged dataset's batch
        (reference feeder.py:84-106).  Returns (feed dict, batches dict)."""
        batches = self.get_next_batch()
        feed = {}
        for name, itype, itag in required_input:
            if itag not in batches:
                error("No dataset with tag [%s] for required input [%s]"
                      % (itag, name))
            batch = batches[itag]
            if itype == defs.net_input.visual:
                feed[name] = batch.visual
                if batch.proc_params is not None:
                    feed[name + "/proc_params"] = batch.proc_params
            elif itype == defs.net_input.labels:
                if batch.labels is None:
                    error("Dataset [%s] produced no labels for required "
                          "input [%s]" % (itag, name))
                feed[name] = batch.labels
            else:
                error("Unknown net input type [%s]" % itype)
        return feed, batches

    # ------------------------------------------------------------- cadence
    def compute_save_interval(self):
        if not self.train:
            self.save_interval, self.num_saves = -1, 0
            return
        # cadence follows the first (main) dataset; aux datasets may
        # have different batch plans and must not override it
        dset = self.datasets[self.phase][0]
        self.save_interval, self.num_saves = dset.compute_dataset_portion(
            self.save_freq_per_epoch, self.train.epochs)

    def should_save(self, step):
        if self.save_interval < 0 or self.phase == defs.phase.val:
            return False
        return step % self.save_interval == 0

    # ------------------------------------------------------ save / restore
    def _resolve_checkpoint(self, resume_file, require_snap=False):
        """Resolve 'latest' to the newest checkpoint in the run folder
        (reference feeder.py:146-160).  With require_snap, checkpoints
        whose ``.snap`` sidecar is missing (a save interrupted between
        the atomic param write and the sidecar write) are skipped with a
        warning instead of bricking every subsequent resume."""
        if resume_file == "best":
            best = os.path.join(self.run_folder, "checkpoints",
                                "best.ckpt")
            if not os.path.exists(best):
                error("resume_file: best, but no best.ckpt in %s "
                      "(written by train: eval_keep_best)"
                      % os.path.dirname(best))
            return best
        if resume_file == defs.names.latest_savefile:
            ckpts = get_run_checkpoints(self.run_folder)
            if not ckpts:
                error("Resume requested but no checkpoints in %s"
                      % self.run_folder)
            if require_snap:
                from video_learning_tpu.utils import warning
                for ckpt in reversed(ckpts):
                    if os.path.exists(ckpt + ".snap"):
                        return ckpt
                    warning("Skipping checkpoint without .snap sidecar "
                            "(interrupted save?): %s" % ckpt)
                error("Resume requires a checkpoint with a .snap "
                      "position sidecar, but none of the %d checkpoints "
                      "in %s has one" % (len(ckpts), self.run_folder))
            return ckpts[-1]
        return resume_file

    def resume_snap(self, resume_file):
        """Restore dataset positions + global step from the ``.snap``
        sidecar (reference feeder.py:143-194).  Returns (epoch, step)."""
        if not self.resume:
            return 0, 0
        ckpt = self._resolve_checkpoint(resume_file, require_snap=True)
        snap_path = ckpt + ".snap"
        info("Resuming training position from [%s]" % snap_path)
        if not os.path.exists(snap_path):
            error("Snapshot savefile does not exist: %s" % snap_path)
        try:
            with open(snap_path, "r") as f:
                params = json.load(f)
        except (UnicodeDecodeError, json.JSONDecodeError):
            # legacy (round-1) pickle sidecar — trusted-files-only path
            from video_learning_tpu.utils import warning
            warning("Loading legacy pickle .snap sidecar [%s]" % snap_path)
            with open(snap_path, "rb") as f:
                params = pickle.load(f)
        batch_info, epoch, global_step = params[0], params[1], params[2]
        for dset in self.get_datasets():
            idx = batch_info.get(dset.tag, 0) \
                if isinstance(batch_info, dict) else batch_info
            dset.restore(idx, epoch)
        info("Restored snapshot of epoch %d, batch %s, global step %d"
             % (epoch + 1, str(batch_info), global_step))
        return epoch, global_step

    def save(self, state, progress, global_step, batch_index=None,
             fixed_name=None):
        """Save a parameter checkpoint + ``.snap`` position sidecar
        (reference feeder.py:263-288).  ``state`` is the TrainState pytree
        handled by checkpoint.py.  ``batch_index`` overrides the feeder's
        live cursor (needed when batches are prefetched ahead).
        ``fixed_name`` writes/overwrites ``<name>.ckpt`` instead of a
        timestamped rotation slot (eval_keep_best's best.ckpt)."""
        from video_learning_tpu import checkpoint as ckpt_mod
        # multi-controller runs share the run folder; params are global
        # (replicated/GSPMD) and every host reaches should_save at the
        # same step with the same cursor, so exactly one process writes —
        # concurrent writers would race on the same .tmp path and the
        # prune's exists/remove pair
        import jax
        if jax.process_count() > 1 and jax.process_index() != 0:
            return None
        folder = os.path.join(self.run_folder, "checkpoints")
        os.makedirs(folder, exist_ok=True)
        base = os.path.join(
            folder, "%s.ckpt" % fixed_name if fixed_name else
            "%s_%s.ckpt" % (get_datetime_str(), progress))
        info("Saving checkpoint to [%s]" % base)
        if batch_index is None:
            batch_index = self.get_batch_index()
        # snapshot the position NOW — an async write must record the
        # cursor at submit time, not whatever it is when the thread runs
        snap = [batch_index,
                self.train.epoch_index if self.train else 0,
                int(global_step)]
        backend = getattr(self, "checkpoint_backend", "npz")

        def write():
            if fixed_name and os.path.exists(base + ".snap"):
                # overwriting a fixed slot: drop the OLD sidecar first so
                # a crash mid-overwrite can never pair new params with a
                # stale position (resume then fails loudly on the missing
                # .snap instead of silently misaligning — rotation slots
                # are always fresh paths and don't have this window)
                os.remove(base + ".snap")
            if backend == "orbax":
                if fixed_name and os.path.exists(base):
                    # orbax checkpoints are directories; overwriting a
                    # fixed-name slot needs the old one cleared (the npz
                    # backend overwrites atomically via os.replace)
                    ckpt_mod.delete_checkpoint(base)
                ckpt_mod.save_checkpoint_orbax(base, state)
            else:
                ckpt_mod.save_checkpoint(base, state)
            # JSON (data-only) — resuming a tampered sidecar must not be
            # able to execute code, unlike the round-1 pickle format;
            # written strictly AFTER the params so a .snap's existence
            # implies a complete checkpoint (resume_snap relies on it)
            with open(base + ".snap", "w") as f:
                json.dump(snap, f)
            self._prune_checkpoints()

        if getattr(self, "checkpoint_async", False):
            if self._async_saver is None:
                from video_learning_tpu.checkpoint import AsyncSaver
                self._async_saver = AsyncSaver()
            # ``state`` leaves are host-numpy snapshots (Train.state_dict),
            # so later optimizer steps cannot mutate what the thread writes
            self._async_saver.submit(write)
        else:
            write()
        return base

    def finish_saves(self):
        """Block until any in-flight async checkpoint write completes
        (re-raising its error).  Must run before the process exits and
        before reading back a just-written checkpoint."""
        if getattr(self, "_async_saver", None) is not None:
            self._async_saver.wait()

    def _prune_checkpoints(self):
        """Keep at most num_saves checkpoints (Saver max_to_keep semantics,
        reference feeder.py:201)."""
        if self.num_saves <= 0:
            return
        ckpts = get_run_checkpoints(self.run_folder)
        excess = len(ckpts) - self.num_saves
        for path in ckpts[:max(0, excess)]:
            from video_learning_tpu import checkpoint as ckpt_mod
            ckpt_mod.delete_checkpoint(path)

    def init_saveload(self, state, resume_file, ignorable_variable_names,
                      loaded_out=None):
        """Compute save cadence and, when resuming, load the parameter
        checkpoint into ``state`` with name diffing against the current
        model (reference feeder.py:198-257).  Returns the (possibly
        restored) state."""
        from video_learning_tpu import checkpoint as ckpt_mod
        self.compute_save_interval()
        if not self.resume:
            return state
        # in training, params must come from the same checkpoint that
        # resume_snap() selected: require the .snap sidecar so a save
        # interrupted between the atomic param write and the sidecar
        # write cannot misalign params vs. data cursor / LR schedule
        ckpt = self._resolve_checkpoint(resume_file,
                                        require_snap=bool(self.train))
        info("Resuming parameters from: [%s]" % ckpt)
        if not os.path.exists(ckpt):
            error("Checkpoint does not exist: %s" % ckpt)
        ignorables = list(ignorable_variable_names or [])
        if self.val and not self.train:
            # evaluation needs params only (reference feeder.py:226-227
            # ignores global_step; optimizer slots likewise).  A training
            # run that also carries val options (inline eval_every_epochs)
            # must still restore its optimizer state and step.
            ignorables.append(defs.names.global_step)
            ignorables.append("opt_state_leaves")
        return ckpt_mod.restore_checkpoint(ckpt, state, ignorables,
                                           loaded_out=loaded_out)
