"""YAML configuration system: Settings + Network (pipeline spec) loading.

TPU-native counterpart of the reference's config layer
(/root/reference/settings_.py).  The external contract is preserved:

* one YAML file with ``run:`` / ``serialize:`` / ``captions:`` documents,
* enum values written as validated ``defs.*`` dotted strings,
* ``run.network.pipelines``: an ordered, named DAG of pipeline specs
  {input, representation, frame_encoding_layer, fc_output_dim, classifier,
  lstm_params, weights_file, frame_fusion, input_shape, input_fusion}
  (settings_.py:167-208), with unknown-field rejection,
* per-phase train/val option blocks (settings_.py:271-298),
* ``data:`` entries describing datasets with imgproc chains
  (settings_.py:304-366),
* run-id / run-folder / provenance-copy conventions (settings_.py:210-243,
  404-421).

Internals are new: configs resolve to plain dataclass-style objects consumed
by the jitted training/eval engines.
"""

import logging
import os
import shutil

import yaml

from video_learning_tpu.defs import defs
from video_learning_tpu.parse_opts import parse_seq, parse_shape
from video_learning_tpu.utils import (CustomLogger, error, warning, info,
                                      debug, get_datetime_str, prep_email,
                                      as_num as _num)


class Network:
    """Parsed spec of a single pipeline (reference settings_.py:29-31 +
    read_network :167-208)."""
    input = None
    input_shape = None
    input_fusion = None
    representation = None
    frame_encoding_layer = None
    fc_output_dim = None
    classifier = None
    lstm_params = None
    weights_file = None
    frame_fusion = None


class TrainOpts:
    batch_size = 100
    epochs = 15
    epoch_index = 0
    optimizer = defs.optim.sgd
    base_lr = 0.001
    lr_mult = None
    lr_decay = None
    lr_warmup = 0                   # linear-ramp batches (0 = off)
    clip_norm = None
    clip_grads = None
    dropout_keep_prob = 0.5
    batch_item = defs.batch_item.default
    accum_steps = 1                 # micro-batches per optimizer step
    ema_decay = 0.0                 # weight EMA factor (0 = off)
    weight_decay = 0.0              # adamw decoupled decay (0 = off)
    eval_every_epochs = 0           # inline validation cadence (0 = off)
    early_stop_patience = 0         # stop after N non-improving evals
    eval_keep_best = False          # keep best.ckpt at the best val acc


class ValOpts:
    batch_size = 1
    logits_save_interval = None
    clip_fusion_type = None
    clip_fusion_method = None
    batch_item = defs.batch_item.default
    quantize = None                 # "int8"/"int8_static": w8a8 serving
    use_ema = False                 # evaluate the EMA weights
    top_k = None                    # extra top-k accuracies, e.g. [5]


class CaptionOpts:
    caption_search = defs.caption_search.max
    eval_type = defs.eval_type.coco
    caption_ground_truth = None
    word_embeddings_file = None
    caption_max_length = None
    beam_width = 4
    length_norm = 0.0


def enable_compile_cache(value):
    """Point JAX's persistent XLA compilation cache at ``value`` (a
    directory path, or True for the default user cache) and return the
    resolved path.  Executables from previous processes are reused, so
    restarts / preemption resumes / multi-checkpoint eval fan-outs skip
    the 20-40 s TPU compile.

    JAX binds the persistent cache object ONCE, at the first compile
    that sees a configured dir; a later dir change via config.update is
    silently ignored for the rest of the process.  Multi-run processes
    (eval fan-outs, the test suite) do change it — drop any existing
    binding so THIS run's directory takes effect (the disk cache itself
    persists; only the in-process handle resets)."""
    path = value if isinstance(value, str) \
        else "~/.cache/video_learning_tpu/xla"
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    import jax
    from jax.experimental.compilation_cache import compilation_cache
    compilation_cache.reset_cache()
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every executable (the default 1 s threshold would skip
    # small-geometry runs entirely; entries are cheap)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


class Settings:
    """Run settings: parses and validates the ``run:`` YAML document and
    instantiates the Feeder with its datasets."""

    def __init__(self):
        self.run_id = ""
        self.resume_file = None
        self.run_folder = None
        self.global_step = 0
        self.feeder = None
        self.pipelines = {}
        self.pipeline_names = []
        self.train = None
        self.val = None
        self.captioning = None
        self.phases = []
        self.phase = None
        self.num_classes = None
        self.logging_level = "logging.INFO"
        self.tensorboard_folder = "tensorboard"
        self.tensorboard_events = False
        self.print_tensors = False
        self.email_notify = None
        self.save_freq_per_epoch = 1
        self.profile_steps = None
        self.timestamp = None
        self.logger = None
        self.seed = 0
        # mesh/sharding options (TPU-native addition; defaults single-chip)
        self.mesh_shape = None          # e.g. {"data": 4, "model": 2}
        self.compute_dtype = "bfloat16"
        self.remat = False              # rematerialize the frame encoder
        self._inline_eval = False       # train-phase eval_every_epochs
        self._pipeline_field_cache = []

    # ------------------------------------------------------------- helpers
    def get_batch_size(self):
        if defs.phase.train in self.phases:
            return self.train.batch_size
        return self.val.batch_size

    def get_dropout(self):
        if self.phase == defs.phase.train:
            return self.train.dropout_keep_prob
        return 0.0

    def should_resume(self):
        return bool(self.resume_file)

    def get_train_str(self):
        tr = self.train
        s = "classes: %d, epochs: %d, optim: %s, lr: %s" % (
            self.num_classes, tr.epochs, tr.optimizer, tr.base_lr)
        if tr.lr_mult is not None:
            s += ", lr_mult: %s" % tr.lr_mult
        if tr.lr_decay is not None:
            s += ", decay: %s" % (tr.lr_decay,)
        if tr.clip_norm is not None:
            s += ", clip_norm: %s" % tr.clip_norm
        return s

    # ------------------------------------------------------- field reading
    def read_field(self, config, fieldname, validate=None, required=False,
                   listify=False):
        """Read+validate one pipeline field, tracking touched fields so that
        unknown config keys can be rejected (settings_.py:135-164,204-207)."""
        self._pipeline_field_cache.append(fieldname)
        val = config.get(fieldname)
        if val is None:
            if required:
                error("No value specified for required field [%s]" % fieldname)
            return [None] if listify else None
        if validate is not None:
            if isinstance(validate, (list, tuple)):
                val = list(val)
                if len(validate) != len(val):
                    error("Field [%s] requires %d entries, found: [%s]"
                          % (fieldname, len(validate), str(val)))
                val = [defs.check(el, v) for el, v in zip(val, validate)]
            else:
                val = defs.check(val, validate)
        if listify and not isinstance(val, (list, tuple)):
            val = [val]
        return list(val) if listify else val

    def read_network(self, pipeline_content):
        """Parse one pipeline spec (settings_.py:167-208)."""
        network = Network()
        self._pipeline_field_cache = []
        network.input = self.read_field(pipeline_content, "input",
                                        listify=True)
        if any(x is None for x in network.input):
            error("<None> or undefined <input> tag in pipeline: %s"
                  % pipeline_content)
        for i, inp in enumerate(network.input):
            if inp in self.pipelines:
                continue
            is_tag, tagname = defs.check(inp, defs.dataset_tag,
                                         do_boolean=True)
            if is_tag:
                network.input[i] = tagname
            else:
                error("Input identifier [%s] is not a dataset tag, and no "
                      "such pipeline has been declared yet." % inp)

        network.representation = self.read_field(
            pipeline_content, "representation", required=True,
            validate=defs.representation)
        if network.representation == defs.representation.dcnn:
            network.frame_encoding_layer = self.read_field(
                pipeline_content, "frame_encoding_layer", required=True)
        if network.representation == defs.representation.fc:
            network.fc_output_dim = _num(
                self.read_field(pipeline_content, "fc_output_dim",
                                required=True),
                "fc_output_dim", int, minimum=1)

        network.classifier = self.read_field(pipeline_content, "classifier",
                                             validate=defs.classifier)
        if network.classifier == defs.classifier.lstm:
            params = self.read_field(pipeline_content, "lstm_params")
            if params is None:
                error("LSTM classifier requires lstm_params")
            if not isinstance(params, (list, tuple)) or len(params) < 3:
                error("lstm_params needs [hidden_dim, num_layers, "
                      "fusion_method(, visual_mode)], got: [%s]"
                      % (params,))
            network.lstm_params = [
                _num(params[0], "lstm_params[0] (hidden_dim)", int, 1),
                _num(params[1], "lstm_params[1] (num_layers)", int, 1),
                defs.check(params[2], defs.fusion_method)]
            # optional 4th entry: visual conditioning mode for captioning
            # (state_bias / input_bias / input_concat, reference
            # defs_.py:57-58; selects among the lstm.py caption graphs)
            if len(params) > 3:
                network.lstm_params.append(
                    defs.check(params[3], defs.rnn_visual_mode))

        network.weights_file = self.read_field(pipeline_content,
                                               "weights_file")
        # accept the reference's alternate key too (config.example.yml:43)
        lw = self.read_field(pipeline_content, "load_weights")
        if network.weights_file is None and lw is not None:
            network.weights_file = lw
        network.frame_fusion = self.read_field(
            pipeline_content, "frame_fusion",
            validate=(defs.fusion_type, defs.fusion_method))
        raw_shapes = self.read_field(pipeline_content, "input_shape",
                                     listify=True)
        network.input_shape = [
            None if shp in (None, "None") else parse_shape(shp)
            for shp in raw_shapes]
        network.input_fusion = self.read_field(pipeline_content,
                                               "input_fusion",
                                               validate=defs.fusion_method)

        unread = [k for k in pipeline_content
                  if k not in self._pipeline_field_cache]
        if unread:
            error("Undefined pipeline field(s): %s" % str(unread))
        return network

    # --------------------------------------------------------- main parser
    def read_config(self, config, init_file):
        self.resume_file = config.get("resume_file")
        self.run_folder = config["run_folder"]
        if config.get("run_id"):
            self.run_id = config["run_id"]
        self.seed = _num(config.get("seed", 0), "seed", int)
        if config.get("mesh_shape"):
            self.mesh_shape = dict(config["mesh_shape"])
        if config.get("compute_dtype"):
            self.compute_dtype = str(config["compute_dtype"])
        self.remat = bool(config.get("remat", False))
        # persistent XLA compilation cache: executables from previous
        # processes are reused, so restarts / preemption resumes /
        # multi-checkpoint eval fan-outs skip the 20-40 s TPU compile.
        # Value: a directory path, or True for the default user cache.
        self.compile_cache = config.get("compile_cache")
        if self.compile_cache:
            self.compile_cache = enable_compile_cache(self.compile_cache)
            info("Persistent compilation cache: %s" % self.compile_cache)
        self.checkpoint_backend = str(config.get("checkpoint_backend",
                                                 "npz"))
        if self.checkpoint_backend == "pickle":
            # historical name for the default backend; the format written
            # has always been the data-only .npz (checkpoint.py) — accept
            # and normalize so old configs keep working
            self.checkpoint_backend = "npz"
        if self.checkpoint_backend not in ("npz", "orbax"):
            error("checkpoint_backend must be 'npz' or 'orbax'")
        # overlap checkpoint writes with training (checkpoint.AsyncSaver);
        # the final save is always joined before the process exits
        self.checkpoint_async = bool(config.get("checkpoint_async", False))

        # phases + run id (settings_.py:219-239)
        self.phases = defs.check(config["phase"], defs.phase)
        if not isinstance(self.phases, list):
            self.phases = [self.phases]
        self.phase = self.phases[0]
        trainval_str = ""
        if defs.phase.train in self.phases:
            trainval_str = "train"
        if defs.phase.val in self.phases:
            trainval_str += "val"
        trainval_str += "_resume" if self.should_resume() else "_scratch"
        base = self.run_id if self.run_id else os.path.basename(init_file)
        self.run_id = "_".join([base, trainval_str])

        if not os.path.exists(self.run_folder):
            warning("Non existent run folder %s - creating." % self.run_folder)
            os.makedirs(self.run_folder, exist_ok=True)

        # logging (settings_.py:246-256)
        logcfg = config.get("logging", {})
        self.save_freq_per_epoch = _num(
            logcfg.get("save_freq_per_epoch", 1),
            "logging.save_freq_per_epoch", minimum=0.0)
        self.logging_level = str(logcfg.get("level", "logging.INFO"))
        valid_levels = ["logging." + x for x in ("INFO", "DEBUG", "WARN")]
        if self.logging_level not in valid_levels:
            error("Invalid logging level: %s" % self.logging_level)
        self.tensorboard_folder = logcfg.get("tensorboard_folder",
                                             "tensorboard")
        # opt-in stock-TensorBoard event files next to the JSONL metrics
        # (the reference's start-tensorboard.sh workflow)
        self.tensorboard_events = bool(logcfg.get("tensorboard_events",
                                                  False))
        self.print_tensors = bool(logcfg.get("print_tensors", False))
        # per-tensor descriptive statistics (the reference's
        # add_descriptive_summary, utils_.py:172-184): regex patterns
        # matched against checkpoint-style param paths; each matching
        # param AND its gradient streams mean/std/min/max into the JSONL
        # metrics (and the TB event sink, when enabled) every step
        self.watch_tensors = parse_seq(logcfg.get("watch_tensors")) or []
        self.watch_tensors = [str(p) for p in self.watch_tensors]
        # optional [start_step, num_steps] to capture a jax.profiler trace
        profile = parse_seq(logcfg.get("profile"))
        self.profile_steps = (
            (_num(profile[0], "logging.profile[0]", int, 0),
             _num(profile[1], "logging.profile[1]", int, 1))
            if profile else None)
        self.email_notify = logcfg.get("email_notify")
        if self.email_notify:
            self.email_notify = prep_email(self.email_notify)
        self.configure_logging()

        # pipelines, in config order (settings_.py:260-267)
        for pipeline in config["network"]["pipelines"]:
            pname, content = list(pipeline.items())[0]
            debug("Reading network [%s]" % pname)
            self.pipelines[pname] = self.read_network(content)
            self.pipeline_names.append(pname)
        self.num_classes = _num(config["network"]["num_classes"],
                                "network.num_classes", int, minimum=1)

        # per-phase option blocks (settings_.py:271-298)
        for phase in self.phases:
            obj = config[phase]
            if phase == defs.phase.train:
                tr = TrainOpts()
                tr.batch_size = _num(obj["batch_size"],
                                     "train.batch_size", int, minimum=1)
                tr.epochs = _num(obj["epochs"], "train.epochs", int,
                                 minimum=0)
                tr.optimizer = defs.check(obj["optimizer"], defs.optim)
                wd = obj.get("weight_decay")
                tr.weight_decay = (0.0 if wd in (None, "None")
                                   else _num(wd, "train.weight_decay"))
                if tr.weight_decay < 0:
                    error("weight_decay must be >= 0 (got %s)"
                          % tr.weight_decay)
                if tr.weight_decay and tr.optimizer != defs.optim.adamw:
                    error("weight_decay is decoupled decay and needs "
                          "optimizer: defs.optim.adamw (got %s)"
                          % tr.optimizer)
                tr.base_lr = _num(obj["base_lr"], "train.base_lr")
                tr.lr_mult = (None if str(obj.get("lr_mult")) in
                              ("None", "") or obj.get("lr_mult") is None
                              else _num(obj["lr_mult"], "train.lr_mult"))
                lr_decay = parse_seq(obj.get("lr_decay"))
                if lr_decay is not None:
                    if len(lr_decay) < 4:
                        error("lr_decay needs [decay, periodicity, N, "
                              "factor(, offset)], got: [%s]" % (lr_decay,))
                    parsed = [defs.check(lr_decay[0], defs.decay),
                              defs.check(lr_decay[1], defs.periodicity),
                              _num(lr_decay[2], "lr_decay[2]", int),
                              _num(lr_decay[3], "lr_decay[3]")]
                    if len(lr_decay) > 4:
                        parsed.append(_num(lr_decay[4], "lr_decay[4]",
                                           int))
                    tr.lr_decay = parsed
                tr.lr_warmup = _num(obj.get("lr_warmup", 0) or 0,
                                    "train.lr_warmup", int)
                if tr.lr_warmup < 0:
                    error("lr_warmup must be >= 0 (got %d)" % tr.lr_warmup)
                cn = obj.get("clip_norm")
                tr.clip_norm = (None if cn in (None, "None")
                                else _num(cn, "train.clip_norm"))
                cg = parse_seq(obj.get("clip_grads"))
                tr.clip_grads = (None if not cg or cg == [None]
                                 else (_num(cg[0], "train.clip_grads[0]"),
                                       _num(cg[1], "train.clip_grads[1]")))
                tr.dropout_keep_prob = _num(
                    obj.get("dropout_keep_prob", 0.5),
                    "train.dropout_keep_prob", minimum=0.0)
                tr.accum_steps = _num(obj.get("accum_steps", 1),
                                      "train.accum_steps", int)
                if tr.accum_steps < 1:
                    error("accum_steps must be >= 1 (got %d)"
                          % tr.accum_steps)
                if tr.batch_size % tr.accum_steps:
                    error("accum_steps (%d) must divide batch_size (%d): "
                          "the batch is split into equal on-device "
                          "micro-batches" % (tr.accum_steps, tr.batch_size))
                ema = obj.get("ema_decay")
                tr.ema_decay = (0.0 if ema in (None, "None")
                                else _num(ema, "train.ema_decay"))
                if tr.ema_decay and not 0.0 < tr.ema_decay < 1.0:
                    error("ema_decay must be in (0, 1) (got %s)"
                          % tr.ema_decay)
                tr.eval_every_epochs = _num(
                    obj.get("eval_every_epochs", 0) or 0,
                    "train.eval_every_epochs", int)
                if tr.eval_every_epochs < 0:
                    error("eval_every_epochs must be >= 0 (got %d)"
                          % tr.eval_every_epochs)
                tr.early_stop_patience = _num(
                    obj.get("early_stop_patience", 0) or 0,
                    "train.early_stop_patience", int)
                if tr.early_stop_patience and not tr.eval_every_epochs:
                    error("early_stop_patience needs eval_every_epochs "
                          "(stopping is judged on inline val accuracy)")
                tr.eval_keep_best = bool(obj.get("eval_keep_best", False))
                if tr.eval_keep_best and not tr.eval_every_epochs:
                    error("eval_keep_best needs eval_every_epochs (best "
                          "is judged on inline val accuracy)")
                self.train = tr
            if phase == defs.phase.val:
                self.val = self._read_val_opts(obj)

        # inline validation during training (TPU-native addition; the
        # reference rejects simultaneous train+val phases and evaluates
        # checkpoints in separate processes): eval_every_epochs runs the
        # val phase on the LIVE params every N training epochs, so it
        # needs the val: block and the val-phase datasets registered
        self._inline_eval = bool(self.train and
                                 self.train.eval_every_epochs > 0)
        if self._inline_eval:
            if defs.phase.val in self.phases:
                error("eval_every_epochs runs validation inline; use "
                      "phase: defs.phase.train (not both phases)")
            if "val" not in config:
                error("eval_every_epochs needs a val: options block")
            if "captioning" in config:
                error("eval_every_epochs supports classification runs; "
                      "evaluate captioners with "
                      "tools/evaluate_multiple_checkpoints")
            self.val = self._read_val_opts(config["val"])
            if self.val.use_ema and not self.train.ema_decay:
                # the inline evals would silently judge best.ckpt /
                # early stopping on the LIVE weights
                error("val: use_ema needs train: ema_decay (no EMA "
                      "shadow is maintained without it)")

        # captioning options (config.example.yml:93-97)
        if "captioning" in config:
            cap = config["captioning"]
            co = CaptionOpts()
            co.caption_search = defs.check(
                cap.get("caption_search", "defs.caption_search.max"),
                defs.caption_search)
            co.eval_type = defs.check(
                cap.get("eval_type", "defs.eval_type.coco"), defs.eval_type)
            co.caption_ground_truth = cap.get("caption_ground_truth")
            co.word_embeddings_file = cap.get("word_embeddings_file")
            co.beam_width = _num(cap.get("beam_width", 4),
                                 "captioning.beam_width", int, minimum=1)
            co.length_norm = _num(cap.get("length_norm", 0.0),
                                  "captioning.length_norm")
            cml = cap.get("caption_max_length")
            co.caption_max_length = (None if cml is None else _num(
                cml, "captioning.caption_max_length", int, minimum=1))
            if co.length_norm < 0:
                error("captioning.length_norm must be >= 0 (got %s)"
                      % co.length_norm)
            self.captioning = co

        # datasets -> feeder (settings_.py:302-366).  Inline eval keeps
        # the RUN phase train but registers + plans the val-phase
        # datasets too.
        feed_phases = list(self.phases)
        if self._inline_eval:
            feed_phases.append(defs.phase.val)
        from video_learning_tpu.data.feeder import Feeder
        self.feeder = Feeder(defs.input_mode.video, feed_phases,
                             (self.train, self.val),
                             self.save_freq_per_epoch, self.run_folder,
                             self.should_resume())
        self.feeder.checkpoint_backend = self.checkpoint_backend
        self.feeder.checkpoint_async = self.checkpoint_async
        for dataid, dataobj in config.get("data", {}).items():
            dataset_phase = defs.check(dataobj["phase"], defs.phase)
            if dataset_phase not in feed_phases:
                info("Omitting dataset [%s] due to its phase [%s]"
                     % (dataid, dataset_phase))
                continue
            path = dataobj["data_path"]
            mean_image = parse_seq(dataobj.get("mean_image"))
            batch_item = (defs.check(dataobj["batch_item"], defs.batch_item)
                          if "batch_item" in dataobj
                          else defs.batch_item.default)
            prepend_folder = dataobj.get("prepend_folder") or None
            image_shape = parse_shape(dataobj.get("image_shape"))
            imgproc = [defs.check(opt, defs.imgproc)
                       for opt in (parse_seq(dataobj.get("imgproc")) or [])]
            if defs.imgproc.sub_mean in imgproc and not mean_image:
                error("[%s] requires a supplied mean image intensity."
                      % defs.imgproc.sub_mean)
            raw_image_shape = parse_shape(dataobj.get("raw_image_shape"))
            data_format = defs.check(dataobj["data_format"], defs.data_format)
            frame_format = dataobj.get("frame_format")
            tag = defs.check(dataobj["tag"], defs.dataset_tag)
            if raw_image_shape is not None and \
                    defs.imgproc.raw_resize not in imgproc:
                imgproc.append(defs.imgproc.raw_resize)
            if mean_image is not None and \
                    defs.imgproc.sub_mean not in imgproc:
                imgproc.append(defs.imgproc.sub_mean)
            excl = [defs.imgproc.rand_crop in imgproc,
                    defs.imgproc.center_crop in imgproc,
                    defs.imgproc.resize in imgproc]
            if sum(excl) > 1:
                error("Need at most one of rand_crop/center_crop/resize. "
                      "Imgproc params: %s" % imgproc)
            if self.val and dataset_phase == defs.phase.val:
                if defs.imgproc.rand_crop in imgproc:
                    warning("Random cropping is enabled in validation mode.")
                if defs.imgproc.rand_mirror in imgproc:
                    warning("Random mirroring is enabled in validation mode.")
            read_tries = _num(dataobj.get("read_tries", 1),
                              "read_tries", int, minimum=1)
            captioning_config = None
            if "captioning" in dataobj:
                c = dataobj["captioning"]
                captioning_config = (c.get("word_embeddings_file"),
                                     c.get("caption_ground_truth"),
                                     c.get("eval_type"),
                                     c.get("caption_search"))
            self.feeder.add_dataset(
                dataset_phase, dataid, path, mean_image, prepend_folder,
                image_shape, imgproc, raw_image_shape, data_format,
                frame_format, batch_item, self.num_classes, tag, read_tries,
                captioning_config)
            dset = self.feeder.datasets[dataset_phase][-1]
            # TPU-native additions: per-epoch reshuffling (random-access
            # reader makes it free) and device-side preprocessing
            dset.epoch_shuffle = bool(dataobj.get("epoch_shuffle", False))
            dset.shuffle_seed = _num(
                dataobj.get("shuffle_seed", self.seed), "shuffle_seed",
                int)
            # multi-host input sharding: default to this process's slot
            # when running under multi-controller jax
            shards = dataobj.get("host_shards", "auto")
            if shards == "auto":
                if dataset_phase == defs.phase.train:
                    # only training data shards automatically; every host
                    # must evaluate the FULL validation set (per-shard
                    # accuracies would collide in the shared run folder)
                    import jax
                    dset.host_shards = jax.process_count()
                    dset.host_shard_index = jax.process_index()
            else:
                dset.host_shards = _num(shards, "host_shards", int,
                                        minimum=1)
                dset.host_shard_index = _num(
                    dataobj.get("host_shard_index", 0),
                    "host_shard_index", int, minimum=0)
            if "device_preprocess" in dataobj:
                dset.device_preprocess = bool(dataobj["device_preprocess"])

    @staticmethod
    def _read_val_opts(obj):
        """Parse a ``val:`` options block (shared by the val phase and
        the train phase's inline eval_every_epochs)."""
        va = ValOpts()
        va.batch_size = _num(obj["batch_size"], "val.batch_size", int,
                             minimum=1)
        lsi = obj.get("logits_save_interval")
        va.logits_save_interval = (
            None if lsi in (None, "None")
            else _num(lsi, "val.logits_save_interval", int))
        clip_fusion = parse_seq(obj.get("clip_fusion"))
        if clip_fusion is not None:
            va.clip_fusion_type = defs.check(clip_fusion[0],
                                             defs.fusion_type)
            va.clip_fusion_method = defs.check(clip_fusion[1],
                                               defs.fusion_method)
        quant = obj.get("quantize")
        if quant not in (None, "None", "int8", "int8_static"):
            error("val quantize must be 'int8' (dynamic activation "
                  "scales) or 'int8_static' (scales calibrated on the "
                  "first eval batch), got %r" % quant)
        va.quantize = None if quant in (None, "None") else quant
        va.use_ema = bool(obj.get("use_ema", False))
        # extra top-k accuracy reporting (top-1 is always computed); a
        # scalar or list of ints, e.g. top_k: 5 or top_k: [3, 5]
        tk = parse_seq(obj.get("top_k"))
        if tk is not None:
            try:
                va.top_k = sorted({int(k) for k in tk})
            except (TypeError, ValueError):
                error("val top_k must be an int or list of ints, got %r"
                      % obj.get("top_k"))
            if any(k < 2 for k in va.top_k):
                error("val top_k entries must be >= 2 (top-1 is always "
                      "reported), got %s" % (va.top_k,))
        return va

    # ------------------------------------------------------- orchestration
    def configure_logging(self):
        self.timestamp = get_datetime_str()
        logfile = os.path.join(
            self.run_folder,
            "log_%s_%s.log" % (self.run_id, self.timestamp))
        self.logger = CustomLogger()
        self.logger.configure_logging(logfile, self.logging_level,
                                      self.email_notify)

    def initialize_from_file(self, init_file):
        if init_file is None:
            return
        if not os.path.exists(init_file):
            error("Unable to read initialization file [%s]." % init_file)
        if init_file.endswith(".ini"):
            error(".ini files deprecated.")
        with open(init_file, "r") as f:
            config = yaml.safe_load(f)["run"]
        self.read_config(config, init_file)
        info("Initialized run [%s] from file %s" % (self.run_id, init_file))

    def attach_captioning(self):
        """Wire captioning metadata (vocabulary + embedding matrix) into
        datasets that declared it, before batch plans are computed."""
        from video_learning_tpu.data import captions as captions_mod
        for phase, dsets in self.feeder.datasets.items():
            for d in dsets:
                emb_file = None
                if d.captioning_config is not None:
                    emb_file = d.captioning_config[0]
                elif self.captioning is not None:
                    emb_file = self.captioning.word_embeddings_file
                if emb_file:
                    captions_mod.attach_captioning(
                        d, emb_file,
                        include_labels=(phase == defs.phase.train),
                        do_padding=True)
                    if self.captioning is not None and \
                            self.captioning.caption_max_length:
                        # config cap on decoded/padded caption length
                        # (reference config.example.yml:135
                        # caption_max_length; data with longer captions
                        # still errors in get_input_data_count)
                        d.max_caption_length = \
                            self.captioning.caption_max_length
                        d.max_sequence_length = d.max_caption_length + 1
                    info("Attached captioning to dataset [%s] (V=%d)"
                         % (d.id, len(d.vocabulary)))

    def initialize(self, init_file):
        """Full startup: parse config, copy it into the run folder for
        provenance, attach captioning, initialize datasets, resume if
        requested (settings_.py:404-444).  Returns the Feeder."""
        self.initialize_from_file(init_file)
        self.attach_captioning()

        if os.path.dirname(os.path.abspath(init_file)) != \
                os.path.abspath(self.run_folder):
            shutil.copyfile(init_file, os.path.join(
                self.run_folder, os.path.basename(init_file)))

        if self.train and self.val and not self._inline_eval:
            error("Cannot specify simultaneous training and validation run.")
        if not (self.train or self.val):
            error("Neither training nor validation is enabled.")
        if self._inline_eval and not self.feeder.datasets.get(
                defs.phase.val):
            # fail at startup, not after the first (possibly hours-long)
            # training epoch when the eval pass first dereferences it
            error("eval_every_epochs needs at least one val-phase "
                  "dataset in data: (all entries are phase train)")

        self.tensorboard_folder = os.path.join(
            self.run_folder, self.tensorboard_folder, self.phase)

        self.feeder.initialize_datasets()
        self.feeder.set_phase(self.phase)

        if self.should_resume():
            if self.train:
                info("Resuming training.")
                self.train.epoch_index, self.global_step = \
                    self.feeder.resume_snap(self.resume_file)
            elif self.val:
                info("Evaluating trained network.")
        else:
            if self.train:
                info("Starting training from scratch.")
            elif self.val:
                warning("Starting validation-only run with an untrained "
                        "network.")
        info("Starting run on folder [%s]." % self.run_folder)
        return self.feeder
