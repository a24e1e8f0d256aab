"""Validation / evaluation engine.

Counterpart of /root/reference/val.py: accumulates per-clip / per-item
logits+labels on the host, fuses clip logits into video logits at eval time
in both batch granularities — batch_item=clip accumulates until a video's
cpv is complete (val.py:63-88); batch_item=default fuses cpv-sized chunks
inline (val.py:89-110) — persists logits in chunked pickles
(``.part_N`` / ``.total``, val.py:115-148), computes accuracy across chunks
(val.py:174-198), and drives caption evaluation: decoded word indices ->
COCO-format ``coco.results.json`` -> the reimplemented caption metrics
(val.py:205-250; the py2+Java subprocess chain is replaced by
metrics/coco_eval.py).

The forward pass itself is a single jitted function over padded batches;
padding rows are dropped before accumulation.
"""

import json
import os
import pickle

import jax
import numpy as np

from video_learning_tpu.defs import defs
from video_learning_tpu.ops.preprocess import make_preprocessor, \
    supports_device_path
from video_learning_tpu.utils import (debug, duplicates, error, info,
                                      warning)


class Validation:

    def __init__(self, settings, model=None):
        if not settings.val:
            return
        self.settings = settings
        self.model = model
        self.num_classes = settings.num_classes
        self.reset_accumulation()
        self.validation_logits_save_interval = \
            settings.val.logits_save_interval
        self.run_folder = settings.run_folder
        self.run_id = settings.run_id
        self.timestamp = settings.timestamp
        self._forward = None
        self._decode = None
        self._preprocessors = {}
        # evaluation scales over the same device mesh as training: feeds
        # shard over the data axis, wide kernels stay tensor-parallel
        # (GSPMD; see parallel/).  On a 1-device mesh this is a no-op.
        from video_learning_tpu.parallel import mesh as mesh_mod
        self.mesh = mesh_mod.make_mesh(
            getattr(settings, "mesh_shape", None))
        self.data_sharding = mesh_mod.data_sharding(self.mesh)
        self._src_params = None
        self._src_leaf0 = None
        self._placed_params = None
        self._q_src_params = None
        self._q_src_leaf0 = None
        self._q_params = None
        self._row_maps = {}
        # multi-controller runs share the run folder: exactly one process
        # persists artifacts (chunk pickles, coco json, accuracy files) —
        # every host computes identical full-set metrics (val datasets
        # are not host-sharded), so non-main hosts keep logits in memory
        # instead of racing on the same paths
        self._is_main_process = jax.process_index() == 0
        if model is not None:
            self._build_forward()

    # ------------------------------------------------------------ forward
    def _build_forward(self):
        model = self.model
        for key, itype, tag in model.required_input:
            if itype != defs.net_input.visual:
                continue
            dsets = self.settings.feeder.get_dataset_by_tag(tag)
            if dsets and dsets[0].device_preprocess and \
                    dsets[0].processor is not None:
                if not supports_device_path(dsets[0].imgproc, dsets[0]):
                    error("Device preprocessing unsupported for imgproc %s"
                          % dsets[0].imgproc)
                self._preprocessors[key] = make_preprocessor(
                    dsets[0].processor,
                    out_dtype=model.compute_dtype)

        pre = self._preprocessors
        quantize = getattr(self.settings.val, "quantize", None)
        if quantize:
            info("Evaluation forward quantized: %s (w8a8 frame encoders)"
                 % quantize)

        def forward(params, feed):
            feed = dict(feed)
            for key, p in pre.items():
                feed[key] = p(feed[key], feed.pop(key + "/proc_params"))
            return model.apply(params, feed, train=False,
                               quantize=quantize)

        def decode(params, feed):
            feed = dict(feed)
            for key, p in pre.items():
                feed[key] = p(feed[key], feed.pop(key + "/proc_params"))
            return model.apply(params, feed, train=False, decode=True,
                               quantize=quantize)

        jit_kw = {}
        if self.mesh.size > 1:
            # replicate the (small) outputs so every host materializes the
            # full logits/decode rows — without this a multi-controller
            # np.asarray of a batch-sharded global array would fail
            # (SURVEY §5: eval logit gathers on DCN)
            from video_learning_tpu.parallel import mesh as mesh_mod
            jit_kw["out_shardings"] = mesh_mod.replicated(self.mesh)
        self._forward = jax.jit(forward, **jit_kw)
        self._decode = jax.jit(decode, **jit_kw)

    def _local_rows(self, n_local, n_global):
        """Global row indices this process contributed when every process
        assembles ``n_local`` rows over the data axis (cached per
        geometry).  Derived empirically — a marker array pushed through
        the SAME assembly (``make_array_from_process_local_data`` with the
        same sharding) and gathered back replicated — so no assumption
        about device-order/process contiguity is made."""
        rows = self._row_maps.get(n_local)
        if rows is None:
            from video_learning_tpu.parallel import mesh as mesh_mod
            pid = jax.process_index()
            marker = jax.make_array_from_process_local_data(
                self.data_sharding, np.full((n_local,), pid, np.int32))
            gathered = np.asarray(jax.jit(
                lambda x: x,
                out_shardings=mesh_mod.replicated(self.mesh))(marker))
            rows = np.flatnonzero(gathered == pid)
            # hard checks (not asserts: row misattribution under -O would
            # silently pair another host's logits with local labels)
            if len(rows) != n_local or len(gathered) != n_global:
                error("Row-ownership map mismatch: %d local rows mapped "
                      "of %d, %d global of %d"
                      % (len(rows), n_local, len(gathered), n_global))
            self._row_maps[n_local] = rows
        return rows

    def _calibration_ranges(self, params, feed, decode=False):
        """One float forward over ``feed`` (the first eval batch) with
        activation-range taps at every int8-eligible encoder layer —
        the per-layer amax values that int8_static bakes into static
        scales.  Runs the SAME preprocessing + DAG as the serving
        forward so the taps see exactly the serving activations.

        Runs under the SAME mesh shardings as the real eval forward —
        an unsharded jit would place the full (mesh-sized) batch and the
        float params on one device, OOMing exactly the configurations
        that need the mesh.  Multi-controller note: the taps are
        replicated outputs of the sharded global first batch, so the
        ranges — and therefore the quantized params — are identical
        across hosts."""
        pre = self._preprocessors
        model = self.model

        def calib(params, feed):
            feed = dict(feed)
            for key, p in pre.items():
                pkey = key + "/proc_params"
                if pkey in feed:        # build_serving_fn sample feeds may
                    feed[key] = p(feed[key], feed.pop(pkey))  # omit these
            taps = {}
            model.apply(params, feed, train=False, decode=decode,
                        calib_taps=taps)
            return taps

        taps_fn = jax.jit(calib)
        if self.mesh.size > 1:
            from video_learning_tpu.parallel import mesh as mesh_mod
            from video_learning_tpu.parallel.sharding import shard_params
            params = shard_params(params, self.mesh)
            feed = mesh_mod.shard_feed(feed, self.mesh,
                                       self.data_sharding)
            taps_fn = jax.jit(
                calib, out_shardings=mesh_mod.replicated(self.mesh))
        taps = jax.device_get(taps_fn(params, feed))
        if not taps:
            error("int8_static calibration collected no activation "
                  "ranges — no pipeline has an int8-capable frame "
                  "encoder (DCNN)")
        info("int8_static calibration ranges: %s"
             % {p: {k: float(v) for k, v in t.items()}
                for p, t in taps.items()})
        return taps

    def _maybe_quantize(self, params, feed=None, decode=False):
        """Pre-quantize the int8-eligible encoder weights ONCE per params
        CONTENT (same identity-cache rules as the shard cache below) —
        an in-graph weight quantize would re-run every batch since each
        forward(params, feed) call re-executes the whole trace.  In
        int8_static mode the first call additionally runs a calibration
        forward over ``feed`` (the first eval batch) to bake static
        activation scales."""
        mode = getattr(self.settings.val, "quantize", None)
        if not mode:
            return params
        leaves = jax.tree_util.tree_leaves(params)
        leaf0 = leaves[0] if leaves else None
        if params is not self._q_src_params or \
                leaf0 is not self._q_src_leaf0:
            ranges = None
            if mode == "int8_static":
                if feed is None:
                    error("quantize: int8_static requires a calibration "
                          "batch; this entry point quantizes without one "
                          "— use 'int8' (dynamic scales) here")
                ranges = self._calibration_ranges(params, feed, decode)
            quantized = self.model.quantize_params(params,
                                                   act_ranges=ranges)
            self._q_params = quantized
            self._q_src_params = params
            self._q_src_leaf0 = leaf0
        return self._q_params

    def build_serving_fn(self, params, sample_feed, decode=False):
        """The bare serving computation for AOT export
        (tools/export_serving): exactly the val forward — fused device
        preprocessing + model.apply(train=False) with the optional int8
        quantization — but with the (pre-quantized) parameters CLOSED
        OVER so the exported artifact is self-contained, and with the
        visual feed arrays as a flat positional signature.

        ``decode=True`` exports the caption decode instead: the batched
        greedy/beam feedback search (embedding matrix baked in as a
        constant) returning (B, T) int32 word indices — index->word
        mapping is the only host-side step, via the vocabulary the
        exporter records in the artifact meta.

        ``sample_feed`` provides the static shapes/dtypes (pass a real,
        geometry-padded feed so the exported signature matches what the
        production feeder produces).  Returns (serve_fn, names, specs):
        serve_fn(*arrays) -> logits (or word indices), names[i] the feed
        key of positional input i, specs[i] its jax.ShapeDtypeStruct."""
        pre = self._preprocessors
        quantize = getattr(self.settings.val, "quantize", None)
        params = self._maybe_quantize(params, sample_feed, decode)
        model = self.model
        names = []
        for key, itype, tag in model.required_input:
            if itype != defs.net_input.visual:
                continue
            names.append(key)
            pkey = key + "/proc_params"
            if key in pre and pkey in sample_feed:
                names.append(pkey)
        if not names:
            error("No visual inputs to export")

        def serve(*arrays):
            feed = dict(zip(names, arrays))
            for key, p in pre.items():
                pkey = key + "/proc_params"
                if pkey in feed:
                    feed[key] = p(feed[key], feed.pop(pkey))
            return model.apply(params, feed, train=False, decode=decode,
                               quantize=quantize)

        specs = [jax.ShapeDtypeStruct(tuple(sample_feed[n].shape),
                                      sample_feed[n].dtype)
                 for n in names]
        return serve, names, specs

    def run_forward(self, params, feed, decode=False):
        fn = self._decode if decode else self._forward
        params = self._maybe_quantize(params, feed, decode)
        if self.mesh.size > 1:
            # shard once per params CONTENT (do_test passes the same tree
            # every batch).  The cache compares OBJECT IDENTITY of the
            # tree and its first leaf: checkpoint.restore_checkpoint
            # rewrites leaves in place (same outer dict, new arrays), so
            # the tree alone is not enough; and strong references to the
            # cached source are held below because ``id()`` of a freed
            # object can be reused by a new allocation — ``is`` against
            # kept-alive objects cannot alias.  The cache fields are only
            # updated after a successful placement so a failed
            # shard_params cannot leave them inconsistent.
            leaves = jax.tree_util.tree_leaves(params)
            leaf0 = leaves[0] if leaves else None
            if params is not self._src_params or \
                    leaf0 is not self._src_leaf0:
                from video_learning_tpu.parallel.sharding import \
                    shard_params
                placed = shard_params(params, self.mesh)
                self._placed_params = placed
                self._src_params = params
                self._src_leaf0 = leaf0
            params = self._placed_params
            from video_learning_tpu.parallel import mesh as mesh_mod
            feed = mesh_mod.shard_feed(feed, self.mesh,
                                       self.data_sharding)
        out = np.asarray(fn(params, feed))
        procs = jax.process_count()
        if self.mesh.size > 1 and procs > 1:
            # shard_feed assembled a GLOBAL batch from the per-process
            # local feeds and the replicated out_shardings materialize
            # the GLOBAL rows on every host — but everything downstream
            # (labels, tail padding, caption framing, dataset clip
            # bookkeeping) is host-local.  Return exactly this host's
            # rows so accumulation pairs logits with their own labels.
            if out.shape[0] % procs != 0:
                error("Global output rows %d not divisible by %d "
                      "processes; per-host batches must be equal"
                      % (out.shape[0], procs))
            n_local = out.shape[0] // procs
            out = out[self._local_rows(n_local, out.shape[0])]
        return out

    # ------------------------------------------------- logits accumulation
    def process_validation_logits(self, tag, settings, logits, labels,
                                  padding=0):
        """Accumulate one batch of logits (reference val.py:59-113).
        ``padding`` rows at the tail are dropped first."""
        if padding:
            logits = logits[:len(logits) - padding]
            labels = labels[:len(labels) - padding]
        dataset = settings.feeder.get_dataset_by_tag(tag)[0]

        if dataset.batch_item == defs.batch_item.clip:
            self.clip_logits = np.vstack((self.clip_logits, logits))
            self.clip_labels = np.vstack((self.clip_labels, labels))
            debug("Accumulated %d clip logits (total %d)"
                  % (len(logits), len(self.clip_logits)))
            while dataset.video_index < len(dataset.clips_per_video):
                cpv = dataset.clips_per_video[dataset.video_index]
                if cpv > len(self.clip_logits):
                    break
                self.apply_clip_fusion(self.clip_logits, cpv,
                                       self.clip_labels,
                                       settings.val.clip_fusion_method)
                self.clip_logits = self.clip_logits[cpv:, :]
                self.clip_labels = self.clip_labels[cpv:, :]
                dataset.video_index += 1
        else:
            if dataset.input_mode == defs.input_mode.video:
                maxvid = dataset.batch_index * dataset.batch_size
                minvid = maxvid - dataset.batch_size
                for vidx in range(minvid, maxvid):
                    if vidx >= dataset.num_items:
                        break
                    cpv = dataset.clips_per_video[vidx]
                    self.apply_clip_fusion(logits, cpv, labels,
                                           settings.val.clip_fusion_method)
                    logits = logits[cpv:, :]
                    labels = labels[cpv:, :]
                if len(logits) != 0 or len(labels) != 0:
                    error("Logits/labels non-empty after video aggregation!")
                acc = np.mean(self.get_chunk_accuracy(self.item_logits,
                                                      self.item_labels))
                info("Incremental accuracy up to current batch: %2.3f" % acc)
            else:
                self.add_item_logits_labels(logits, labels)

    def apply_clip_fusion(self, clips_logits, cpv, video_labels,
                          clip_fusion):
        """Fuse cpv clip logits into one video row (val.py:158-167)."""
        curr = clips_logits[0:cpv, :]
        label = video_labels[0, :]
        if clip_fusion == defs.fusion_method.avg:
            video_logits = np.mean(curr, axis=0)
        elif clip_fusion == defs.fusion_method.last:
            video_logits = curr[-1, :]
        else:
            error("Unsupported clip fusion [%s]" % clip_fusion)
        self.add_item_logits_labels(video_logits, label)

    def add_item_logits_labels(self, logits, label):
        self.item_logits = np.vstack((self.item_logits, logits))
        self.item_labels = np.vstack((self.item_labels, label))

    # -------------------------------------------------- chunk persistence
    def save_validation_logits_chunk(self, save_all=False):
        """Chunked persistence of accumulated logits
        (reference val.py:115-148)."""
        if not self._is_main_process:
            # multi-controller: the run folder is shared — only process 0
            # writes chunk files.  Non-main hosts keep their (identical)
            # logits in memory so get_accuracy still works everywhere.
            return
        if self.validation_logits_save_interval is None or \
                len(self.item_logits) == 0:
            return
        if self.validation_logits_save_interval <= 0:
            if save_all:
                path = os.path.join(
                    self.run_folder, "validation_logits_%s_%s.total"
                    % (self.run_id, self.timestamp))
                info("Saving all %d validation logits to %s"
                     % (len(self.item_logits), path))
                with open(path, "wb") as f:
                    pickle.dump(self.item_logits, f)
            return
        if len(self.item_logits) >= self.validation_logits_save_interval \
                or save_all:
            path = os.path.join(
                self.run_folder, "validation_logits_%s_%s.part_%d"
                % (self.run_id, self.timestamp,
                   self.validation_logits_save_counter))
            info("Saving a %d-row chunk of validation logits to %s"
                 % (len(self.item_logits), path))
            with open(path, "wb") as f:
                pickle.dump(self.item_logits, f)
            if isinstance(self.item_logits, np.ndarray):
                self.item_logits = np.zeros([0, self.num_classes],
                                            np.float32)
            else:
                self.item_logits = []
            self.validation_logits_save_counter += 1

    def load_validation_logits_chunk(self, chunk_idx):
        if self.validation_logits_save_interval is None:
            return self.item_logits
        path = os.path.join(self.run_folder,
                            "validation_logits_%s_%s.part_%d"
                            % (self.run_id, self.timestamp, chunk_idx))
        with open(path, "rb") as f:
            return pickle.load(f)

    # ------------------------------------------------------------ metrics
    def reset_accumulation(self):
        """Clear the logits/labels accumulation so one Validation (and
        its compiled forward) can score multiple passes — the inline
        eval_every_epochs loop calls this between epochs."""
        self.item_logits = np.zeros([0, self.num_classes], np.float32)
        self.item_labels = np.zeros([0, self.num_classes], np.float32)
        self.clip_logits = np.zeros([0, self.num_classes], np.float32)
        self.clip_labels = np.zeros([0, self.num_classes], np.float32)
        self.validation_logits_save_counter = 0

    def release_params(self):
        """Drop the identity-cached parameter placements (sharded and
        quantized copies).  The inline eval loop calls this after each
        pass so a reused Validation doesn't pin stale full parameter
        copies in device memory while training continues."""
        self._src_params = None
        self._src_leaf0 = None
        self._placed_params = None
        self._q_src_params = None
        self._q_src_leaf0 = None
        self._q_params = None

    def get_accuracy(self, k=1):
        """Mean accuracy over saved chunks + the live tail
        (val.py:174-198).  ``k`` > 1 reports top-k accuracy (the true
        class anywhere in the k highest logits) — a TPU-native addition;
        the reference computes top-1 only."""
        return self.get_accuracies([k])[k]

    def get_accuracies(self, ks):
        """Accuracies for several ``k`` values in ONE pass over the
        persisted chunks: each chunk is unpickled once, not once per k
        (``val: top_k: [3, 5]`` would otherwise repeat the full chunk
        IO per entry).

        Weighting: top-1 averages per-chunk accuracies UNWEIGHTED —
        reference parity (ref val.py:174-198 does exactly this, so a
        smaller tail chunk is overweighted there too).  The top-k
        additions (k > 1) carry no compat constraint and weight each
        chunk by its row count (equivalent to pooled correct/total)."""
        accuracies = {k: [] for k in ks}
        sizes = []

        def add(logits, labels):
            sizes.append(len(logits))
            for k in ks:
                accuracies[k].append(
                    self.get_chunk_accuracy(logits, labels, k))

        curr = 0
        for idx in range(self.validation_logits_save_counter):
            logits = self.load_validation_logits_chunk(idx)
            size = len(logits)
            add(logits, self.item_labels[curr:curr + size, :])
            curr += size
        if len(self.item_logits) > 0:
            size = len(self.item_logits)
            add(self.item_logits, self.item_labels[curr:curr + size, :])
        return {k: float(np.mean(accuracies[k]) if k <= 1 else
                         np.average(accuracies[k], weights=sizes))
                for k in ks}

    def get_chunk_accuracy(self, logits, labels, k=1):
        logits = np.asarray(logits)
        ref = np.argmax(labels, axis=1)
        if k <= 1:
            pred = np.argmax(logits, axis=1)
            return np.mean(np.equal(pred, ref))
        if k >= logits.shape[1]:
            error("top_k=%d needs more than %d classes"
                  % (k, logits.shape[1]))
        # membership of the true class among the k highest logits
        topk = np.argpartition(-logits, k - 1, axis=1)[:, :k]
        return np.mean(np.any(topk == ref[:, None], axis=1))

    # --------------------------------------------------------- captioning
    def process_description(self, settings, caption_rows=None):
        """Caption evaluation (val.py:205-250): decoded index rows ->
        {image_id, caption} json -> reimplemented COCO metrics.  When
        ``caption_rows`` is given it is used directly (list of per-image
        index sequences, already EOS-trimmed); otherwise saved chunks are
        replayed."""
        if settings.captioning.eval_type != defs.eval_type.coco:
            error("Unsupported eval type %s"
                  % settings.captioning.eval_type)
        if not self._is_main_process:
            # shared run folder: results/eval json written once; every
            # host decoded the identical full val set
            info("Skipping caption artifact writes on process %d"
                 % jax.process_index())
            return None
        dataset = settings.feeder.get_dataset_by_tag(
            defs.dataset_tag.main)[0]
        ids_captions = []
        num = 0
        if caption_rows is not None:
            ids_captions = dataset.validation_logits_to_captions(
                caption_rows, 0)
        else:
            # replay persisted DECODE chunks (rows of word indices).  A
            # caption run that accumulated nothing has nothing to score —
            # and classification logits chunks must never be interpreted
            # as word indices.
            if self.validation_logits_save_counter == 0:
                error("No decoded caption rows were passed and no saved "
                      "chunks exist; run the val phase with a caption "
                      "model first")
            for idx in range(self.validation_logits_save_counter):
                chunk = self.load_validation_logits_chunk(idx)
                if np.asarray(chunk).dtype.kind != "i":
                    error("Saved chunk %d holds %s data, not integer word "
                          "indices — these are classification logits, "
                          "not decoded captions"
                          % (idx, np.asarray(chunk).dtype))
                ids_captions.extend(
                    dataset.validation_logits_to_captions(chunk, num))
                num += len(chunk)
        dupl = [obj["image_id"] for obj in ids_captions]
        if duplicates(dupl):
            error("Duplicate image ids in coco validation: %s" % str(dupl))
        results_file = os.path.join(settings.run_folder,
                                    "coco.results.json")
        info("Writing captioning results to %s" % results_file)
        with open(results_file, "w") as fp:
            json.dump(ids_captions, fp)
        gt = settings.captioning.caption_ground_truth
        if not gt or not os.path.exists(str(gt)):
            warning("No caption ground truth file; skipping metric "
                    "computation.")
            return None
        from video_learning_tpu.metrics.coco_eval import evaluate_captions
        scores = evaluate_captions(results_file, gt)
        eval_file = results_file + ".eval.json"
        with open(eval_file, "w") as f:
            json.dump(scores, f, indent=2)
        info("Caption metrics: %s" % scores)
        return scores
