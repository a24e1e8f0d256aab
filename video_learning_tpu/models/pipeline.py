"""Model: interprets the config's ordered pipelines DAG into a functional
(init_params, apply) pair.

Counterpart of /root/reference/models/model.py:18-175.  Semantics preserved:

* pipelines are built in config order; each pipeline's ``input`` entries are
  either dataset tags (a model input is created, with shape/cpv/fpc pulled
  from the tagged dataset — model.py:41-66) or the outputs of previously
  built pipelines (model.py:43-46),
* optional multi-input fusion avg/maximum/concat/ibias (model.py:73-76),
* representation: DCNN (AlexNet with frame_encoding_layer truncation) / FC
  / NOP (model.py:84-97),
* early fusion aggregates fpc frame vectors before classification
  (model.py:103-106); late fusion aggregates per-frame logits after
  (model.py:149-151),
* classifier FC (dim-converting) or LSTM; a second pipeline input becomes
  the LSTM initial state (encoder-decoder composition, model.py:128-134);
  ``fusion_method.state`` returns the final hidden state (model.py:137-139),
* shape/cpv/fpc metadata flows between pipelines so temporal fusion sizes
  are static compile-time constants (model.py:111,153),
* the final logits are the last pipeline's output (model.py:157-162).

Captioning composition: when the main dataset carries captioning metadata,
an LSTM-classifier pipeline becomes a captioner — visual encodings condition
the LSTM (state_bias via initial state / ibias via prepended timestep) and
word embeddings stream in as an extra input; in val phase the same
parameters drive a batched greedy decode (see models/lstm.py).

Instead of TF placeholders, the Model publishes ``required_input``:
``(input_key, net_input_type, dataset_tag)`` triples the Feeder matches to
batches (reference model.py:55 + feeder.py:84-106).
"""

import jax
import jax.numpy as jnp
import numpy as np

from video_learning_tpu.defs import defs
from video_learning_tpu.models import lstm as lstm_mod
from video_learning_tpu.models import vectorizer
from video_learning_tpu.models.layers import (convert_dim_fc_apply,
                                              convert_dim_fc_init, dropout)
from video_learning_tpu.ops import fusion
from video_learning_tpu.utils import debug, error, print_tensor, warning


class _InputSource:
    """Resolved origin of one pipeline input: a dataset tag or a previously
    built pipeline."""

    def __init__(self, kind, name, shape, cpv, fpc, dim):
        self.kind = kind        # "dataset" | "pipeline"
        self.name = name
        self.shape = shape
        self.cpv = cpv
        self.fpc = fpc
        self.dim = dim


def _dataset_cpv(dataset):
    cpv = dataset.clips_per_video
    if cpv is None:
        return 1
    if isinstance(cpv, int):
        return cpv
    if not all(cpv[0] == c for c in cpv):
        warning("Non-equal clips per item; using the first (%d)" % cpv[0])
    return cpv[0]


class Model:

    def __init__(self, settings):
        self.settings = settings
        self.num_classes = settings.num_classes
        self.compute_dtype = (jnp.bfloat16
                              if settings.compute_dtype == "bfloat16"
                              else jnp.float32)
        self.required_input = []
        self.pipeline_meta = {}     # name -> dict(dim, cpv, fpc, caption)
        self.specs = []             # build order
        self._ignorables = []
        self.caption_dataset = None
        self._resolve()

    # ------------------------------------------------------------- resolve
    def _dataset_by_tag(self, tag):
        dsets = self.settings.feeder.get_dataset_by_tag(tag)
        if not dsets:
            error("Could not find a dataset with tag [%s]" % tag)
        return dsets[0]

    def _resolve(self):
        """Static pass: resolve every pipeline's inputs and output metadata
        (what the reference does while building the graph)."""
        for pname in self.settings.pipeline_names:
            net = self.settings.pipelines[pname]
            sources = []
            for i, input_name in enumerate(net.input):
                if input_name in self.pipeline_meta:
                    meta = self.pipeline_meta[input_name]
                    sources.append(_InputSource(
                        "pipeline", input_name, meta["shape"], meta["cpv"],
                        meta["fpc"], meta["dim"]))
                else:
                    dset = self._dataset_by_tag(input_name)
                    shp = net.input_shape[i] if i < len(net.input_shape) \
                        else None
                    if shp is None:
                        shp = tuple(dset.get_image_shape())
                    cpv = _dataset_cpv(dset)
                    fpc = dset.num_frames_per_clip or 1
                    key = "%s_%s_input" % (pname, input_name)
                    self.required_input.append(
                        (key, defs.net_input.visual, input_name))
                    sources.append(_InputSource("dataset", key, shp, cpv,
                                                fpc, int(shp[-1])))
                    if dset.embedding_matrix is not None:
                        self.caption_dataset = dset
                        if len(dset.vocabulary) != self.num_classes:
                            error("Captioning requires num_classes == "
                                  "vocabulary size (%d != %d)"
                                  % (self.num_classes,
                                     len(dset.vocabulary)))
                debug("Resolved pipeline input [%s] for [%s]"
                      % (input_name, pname))

            # only the final pipeline becomes the captioner (its logits
            # are the run's output, reference model.py:157-162);
            # intermediate LSTM pipelines stay encoders
            is_last = pname == self.settings.pipeline_names[-1]
            caption = (net.classifier == defs.classifier.lstm and
                       self.caption_dataset is not None and is_last)
            if net.classifier == defs.classifier.lstm and not caption:
                # reference build-time guards (model.py:121-125)
                ft = net.frame_fusion[0] if net.frame_fusion else None
                if ft not in (None, defs.fusion_type.none):
                    error("The LSTM classifier should be used only with "
                          "[none] fusion, but it's [%s]" % ft)
                in_fpc = sources[0].fpc
                if net.input_fusion == defs.fusion_method.ibias:
                    in_fpc += 1
                if in_fpc <= 1:
                    error("The LSTM classifier requires an fpc greater "
                          "than 1 (pipeline [%s])" % pname)
            spec = {"name": pname, "net": net, "sources": sources,
                    "caption": caption,
                    "vectorizer": vectorizer.make_vectorizer(
                        net, self.num_classes)}
            self.specs.append(spec)
            self.pipeline_meta[pname] = self._output_meta(spec)
        # training labels are required input too (reference train.py:117-118
        # registers the labels placeholder)
        self.required_input.append(
            ("labels", defs.net_input.labels, defs.dataset_tag.main))

    def _fused_input_meta(self, spec):
        """Metadata after optional input fusion."""
        net, sources = spec["net"], spec["sources"]
        dims = [s.dim for s in sources]
        fpcs = [s.fpc for s in sources]
        cpvs = [s.cpv for s in sources]
        if net.input_fusion is not None:
            dim = (sum(dims) if net.input_fusion == defs.fusion_method.concat
                   else dims[0])
            fpc = fpcs[0] + 1 if net.input_fusion == \
                defs.fusion_method.ibias else fpcs[0]
            return dim, cpvs[0], fpc
        return dims[0], cpvs[0], fpcs[0]

    def _repr_dim(self, spec, in_dim, in_shape):
        return spec["vectorizer"].output_dim(in_dim)

    def _output_meta(self, spec):
        net = spec["net"]
        in_dim, cpv, fpc = self._fused_input_meta(spec)
        shape = spec["sources"][0].shape
        dim = self._repr_dim(spec, in_dim, shape)
        out_fpc = fpc
        ft, _ = (net.frame_fusion if net.frame_fusion else (None, None))
        if ft == defs.fusion_type.early and fpc > 1:
            out_fpc = 1
        if net.classifier is not None:
            # after any classifier the temporal dim is consumed
            # (reference model.py:153 records fpc=1)
            dim = self.num_classes
            out_fpc = 1
        return {"dim": dim, "cpv": cpv, "fpc": out_fpc, "shape": shape}

    # ---------------------------------------------------------------- init
    def init_params(self, rng):
        params = {}
        self._groups = {"regular": [], "modified": []}
        for spec in self.specs:
            rng, sub = jax.random.split(rng)
            params[spec["name"]] = self._init_pipeline(sub, spec)
        return params

    def _init_pipeline(self, rng, spec):
        net, name = spec["net"], spec["name"]
        p = {}
        keys = jax.random.split(rng, 6)
        in_dim, cpv, fpc = self._fused_input_meta(spec)
        in_shape = spec["sources"][0].shape

        # representation: dispatch through the vectorizer wrappers
        # (reference model.py:84-97 builds via vectorizer.Vectorizer.build)
        vec = spec["vectorizer"]
        if vec.param_key is not None:
            vec_shape = in_shape if vec.wants_image_input else (in_dim,)
            p[vec.param_key] = vec.init(keys[0], vec_shape)
            for group, rels in (("regular", vec.train_regular),
                                ("modified", vec.train_modified)):
                self._groups[group].extend(
                    name + "/" + vec.param_key + ("/" + rel if rel else "")
                    for rel in rels)
        dim = vec.output_dim(in_dim)

        if net.classifier == defs.classifier.fc:
            p["clf_fc"] = convert_dim_fc_init(keys[1], dim, self.num_classes)
            if p["clf_fc"] is not None:
                self._groups["modified"].append(name + "/clf_fc")
        elif net.classifier == defs.classifier.lstm:
            num_hidden, num_layers = net.lstm_params[:2]
            lstm_in = dim
            if spec["caption"]:
                emb_dim = self.caption_dataset.get_embedding_dim()
                mode = self._caption_mode(net)
                if mode == defs.rnn_visual_mode.state_bias:
                    lstm_in = emb_dim
                    # map visual encodings to the state dim (reference
                    # lstm.py:552-564 fc_bias_state)
                    p["state_fc"] = convert_dim_fc_init(keys[2], dim,
                                                        num_hidden)
                elif mode == defs.rnn_visual_mode.input_concat:
                    # image (+) word concat fed per step (lstm.py:481-529)
                    lstm_in = emb_dim + dim
                elif mode == defs.rnn_visual_mode.input_bias:
                    # visual becomes the first timestep input; map it to
                    # the embedding dim (ibias requires matching dims,
                    # tf_util.py:153-176)
                    lstm_in = emb_dim
                    p["state_fc"] = convert_dim_fc_init(keys[2], dim,
                                                        emb_dim)
                if p.get("state_fc") is not None:
                    self._groups["modified"].append(name + "/state_fc")
            p["lstm"] = lstm_mod.init(keys[3], lstm_in, num_hidden,
                                      num_layers)
            self._groups["modified"].append(name + "/lstm")
            if len(spec["sources"]) > 1 and not spec["caption"]:
                p["input_state_fc"] = convert_dim_fc_init(
                    keys[4], spec["sources"][1].dim, num_hidden)
                if p["input_state_fc"] is not None:
                    self._groups["modified"].append(name + "/input_state_fc")
            if spec["caption"]:
                # caption logits span the vocabulary; the FC always exists
                # (reference lstm.py:543-548 creates fc_out unconditionally)
                from video_learning_tpu.models.layers import fc_init
                p["output_fc"] = fc_init(keys[5], num_hidden,
                                         self.num_classes)
            else:
                p["output_fc"] = convert_dim_fc_init(keys[5], num_hidden,
                                                     self.num_classes)
            if p["output_fc"] is not None:
                self._groups["modified"].append(name + "/output_fc")
        return p

    def param_groups(self):
        """(regular, modified) parameter path prefixes for two-tier LR
        (reference train.py:152-197 + Trainable lists)."""
        return self._groups["regular"], self._groups["modified"]

    def get_ignorable_variable_names(self):
        return list(self._ignorables)

    def quantize_params(self, params, act_ranges=None):
        """Pre-quantize every int8-capable frame encoder's weights ONCE
        per restored checkpoint (serving path; layers.conv_apply_int8
        documents why in-graph weight quantization would re-run per
        batch).  Pipelines whose representation has no int8 path keep
        their params untouched; if NO pipeline quantizes, warns loudly —
        the forward then runs fully unquantized.

        ``act_ranges`` ({pipeline_name: {layer: amax}} from
        calibration_ranges) additionally bakes static activation scales
        into each encoder (quantize: int8_static)."""
        out = dict(params)
        quantized = 0
        for spec in self.specs:
            vec = spec["vectorizer"]
            if vec.param_key is None:
                continue
            sub = out.get(spec["name"]) or {}
            vp = sub.get(vec.param_key)
            if vp is None:
                continue
            ranges = (act_ranges or {}).get(spec["name"])
            qp = vec.quantize_params(vp, act_ranges=ranges)
            if qp is not None:
                sub = dict(sub)
                sub[vec.param_key] = qp
                out[spec["name"]] = sub
                quantized += 1
        if quantized == 0:
            warning("quantize requested but no pipeline has an "
                    "int8-capable frame encoder (DCNN) — the forward "
                    "runs UNQUANTIZED")
        return out

    # --------------------------------------------------------------- apply
    def apply(self, params, feed, train=False, dropout_rng=None,
              decode=False, quantize=None, calib_taps=None):
        """Run the full DAG.  feed: {input_key: array}.  Returns logits —
        (num_items, num_classes) for classification, (B*T, num_classes) for
        caption training, (B, T) int32 indices when decode=True.
        quantize="int8"/"int8_static" selects the w8a8 serving forward for
        the frame encoders (forward-only; rejected in training).

        ``calib_taps``: pass a dict to run the FLOAT forward while
        collecting {pipeline_name: {layer: amax}} activation ranges from
        every int8-capable frame encoder — the calibration pass for
        static int8 scales (quantize_params(act_ranges=...))."""
        if quantize is not None and train:
            error("quantize=%s is a serving (forward-only) mode; "
                  "training gradients through int8 rounding are zero"
                  % quantize)
        if calib_taps is not None and quantize is not None:
            error("calibration runs the float forward; it cannot be "
                  "combined with quantize=%s" % quantize)
        outputs = {}
        logits = None
        for i, spec in enumerate(self.specs):
            # distinct dropout stream per pipeline: two same-shaped
            # dropout sites in different pipelines must not share a mask
            rng_i = jax.random.fold_in(dropout_rng, i) \
                if dropout_rng is not None else None
            logits = self._apply_pipeline(params[spec["name"]], spec, feed,
                                          outputs, train, rng_i, decode,
                                          quantize, calib_taps)
            outputs[spec["name"]] = logits
        return logits

    def _apply_pipeline(self, p, spec, feed, outputs, train, dropout_rng,
                        decode, quantize=None, calib_taps=None):
        net, name = spec["net"], spec["name"]
        inputs, dims, fpcs, cpvs = [], [], [], []
        for src in spec["sources"]:
            if src.kind == "pipeline":
                inputs.append(outputs[src.name])
            else:
                if src.name not in feed:
                    error("Missing feed input [%s]" % src.name)
                inputs.append(feed[src.name])
            dims.append(src.dim)
            fpcs.append(src.fpc)
            cpvs.append(src.cpv)

        if net.input_fusion is not None:
            fused, dim, fpc, cpv = fusion.apply_tensor_list_fusion(
                inputs, net.input_fusion, dims, fpcs, cpvs)
            inputs, dims, fpcs, cpvs = [fused], [dim], [fpc], [cpv]

        x = inputs[0]
        fpc = fpcs[0]
        output_fpc = fpc
        fusion_type, fusion_method = (net.frame_fusion if net.frame_fusion
                                      else (None, None))

        # representation: one code path through the vectorizer wrappers
        # (frames arrive in the compute dtype from the device preprocessor
        # or f32 from host paths; the wrappers cast as needed)
        vec = spec["vectorizer"]

        if calib_taps is not None and \
                (res := vec.apply_calib(p.get(vec.param_key), x,
                                        compute_dtype=self.compute_dtype)) \
                is not None:
            # static-int8 calibration pass: float encoder forward plus
            # {layer: amax} activation-range taps for this pipeline
            x, calib_taps[name] = res
        else:
            def vec_fn(vp, inp):
                return vec.apply(vp, inp, compute_dtype=self.compute_dtype,
                                 quant=quantize)
            if vec.supports_remat and getattr(self.settings, "remat",
                                              False):
                # rematerialize the frame encoder's activations in the
                # backward pass: trades FLOPs for HBM, enabling larger
                # frame batches (jax.checkpoint)
                vec_fn = jax.checkpoint(vec_fn)
            x = vec_fn(p.get(vec.param_key), x)
        dim = int(x.shape[-1])
        if self.settings.print_tensors:
            x = print_tensor(x, "Vectorized output [%s]" % name)

        # early fusion (model.py:103-106)
        if fusion_type == defs.fusion_type.early and fpc > 1:
            x = fusion.aggregate_clip_vectors(x, dim, fpc, fusion_method)
            if self.settings.print_tensors:
                x = print_tensor(x, "Early fusion [%s]" % name)
            output_fpc = 1

        if net.classifier is None:
            return x

        if net.classifier == defs.classifier.fc:
            logits = convert_dim_fc_apply(p.get("clf_fc"), x,
                                          self.compute_dtype)
        elif net.classifier == defs.classifier.lstm:
            if spec["caption"]:
                logits = self._apply_captioner(p, spec, x, feed, train,
                                               dropout_rng, decode)
                return logits
            # a 4th entry (rnn_visual_mode) is legal config even when the
            # pipeline ends up non-caption (e.g. encoder-decoder reuse)
            num_hidden, num_layers, lstm_fusion = net.lstm_params[:3]
            init_state = None
            if len(inputs) > 1:
                state = fusion.replicate_auxiliary_tensor(
                    inputs[1], dims[1], cpvs[0], cpvs[1])
                init_state = convert_dim_fc_apply(p.get("input_state_fc"),
                                                  state)
            # one LSTM strategy object per spec (trace-time only, but no
            # point rebuilding it every apply)
            vec_l = spec.get("clf_lstm")
            if vec_l is None or vec_l.sequence_len != output_fpc:
                vec_l = vectorizer.LSTM(num_hidden, num_layers,
                                        output_fpc)
                spec["clf_lstm"] = vec_l
            seq_out, states = vec_l.apply(
                p["lstm"], x, compute_dtype=self.compute_dtype,
                init_state=init_state)
            if lstm_fusion == defs.fusion_method.state:
                logits = states[-1][1]  # final hidden state (model.py:137)
            else:
                logits = fusion.apply_temporal_fusion(
                    seq_out, num_hidden, seq_out.shape[1], lstm_fusion)
                if train:
                    logits = dropout(dropout_rng, logits,
                                     self.settings.get_dropout())
            logits = convert_dim_fc_apply(p.get("output_fc"), logits,
                                          self.compute_dtype)
        else:
            error("Undefined classifier [%s]" % net.classifier)

        if self.settings.print_tensors:
            logits = print_tensor(logits, "Post-classification logits "
                                  "[%s]" % name)
        # late fusion (model.py:149-151)
        if fusion_type == defs.fusion_type.late and fpc > 1 and \
                logits.ndim == 2 and logits.shape[0] != 0:
            logits = fusion.aggregate_clip_vectors(
                logits, self.num_classes, fpc, fusion_method)
            if self.settings.print_tensors:
                logits = print_tensor(logits, "Late fusion [%s]" % name)
        return logits

    # ----------------------------------------------------------- captioner
    @staticmethod
    def _caption_mode(net):
        if len(net.lstm_params) > 3:
            return net.lstm_params[3]
        return defs.rnn_visual_mode.state_bias

    def _apply_captioner(self, p, spec, visual, feed, train, dropout_rng,
                         decode):
        """Caption branch.  Training emits per-word logits over the padded
        (B, T) word grid; decoding runs a batched greedy feedback search.
        Visual conditioning modes (reference lstm.py):
          state_bias   — visual vector as every layer's initial (c, h)
                         (define_lstm_inputbias, :732-810),
          input_concat — visual concatenated to each timestep's word input
                         (define_imgdesc_inputstep, :481-529),
          input_bias   — visual fed as an extra first timestep
                         (ibias fusion, tf_util.py:153-176).
        """
        net = spec["net"]
        num_hidden = net.lstm_params[0]
        mode = self._caption_mode(net)
        dset = self.caption_dataset
        T = dset.max_sequence_length
        visual = convert_dim_fc_apply(p.get("state_fc"), visual,
                                      self.compute_dtype)
        if decode:
            emb = jnp.asarray(dset.embedding_matrix)
            cap_opts = self.settings.captioning
            if cap_opts is not None and \
                    cap_opts.caption_search == defs.caption_search.beam:
                return lstm_mod.beam_decode(
                    p["lstm"], p["output_fc"], visual, emb,
                    dset.vocabulary.index("BOS"),
                    dset.vocabulary.index("EOS"), T, num_hidden, mode,
                    beam_width=cap_opts.beam_width,
                    length_norm=cap_opts.length_norm)
            return lstm_mod.greedy_decode(
                p["lstm"], p["output_fc"], visual, emb,
                dset.vocabulary.index("BOS"), T, num_hidden, mode)

        words = feed["caption_words"]          # (B*T, E)
        lengths = feed["caption_lengths"]      # (B,) input lengths (1+len)
        E = words.shape[-1]
        if mode == defs.rnn_visual_mode.state_bias:
            seq_out, _ = lstm_mod.evaluate_sequence(
                p["lstm"], words, num_hidden, T, lengths=lengths,
                init_state=visual, compute_dtype=self.compute_dtype)
        elif mode == defs.rnn_visual_mode.input_concat:
            grid = words.reshape(-1, T, E)
            vis = jnp.broadcast_to(visual[:, None, :],
                                   (grid.shape[0], T, visual.shape[-1]))
            combo = jnp.concatenate([grid, vis], axis=-1)
            seq_out, _ = lstm_mod.evaluate_sequence(
                p["lstm"], combo.reshape(-1, combo.shape[-1]),
                num_hidden, T, lengths=lengths,
                compute_dtype=self.compute_dtype)
        elif mode == defs.rnn_visual_mode.input_bias:
            grid = words.reshape(-1, T, E)
            combo = jnp.concatenate([visual[:, None, :], grid], axis=1)
            seq_out, _ = lstm_mod.evaluate_sequence(
                p["lstm"], combo.reshape(-1, E), num_hidden, T + 1,
                lengths=lengths + 1, compute_dtype=self.compute_dtype)
            seq_out = seq_out[:, 1:, :]  # drop the visual step's output
        else:
            error("Unknown rnn visual mode [%s]" % mode)
        out = seq_out.reshape(-1, num_hidden)
        if train:
            out = dropout(dropout_rng, out, self.settings.get_dropout())
        return convert_dim_fc_apply(p["output_fc"], out, self.compute_dtype)

    # ------------------------------------------------------------- helpers
    def example_feed(self, batch_items=2):
        """Synthetic feed matching required_input — used for jit warmup,
        the graft entry, and shape tests."""
        feed = {}
        for key, itype, tag in self.required_input:
            if itype != defs.net_input.visual:
                continue
            spec_src = None
            for spec in self.specs:
                for src in spec["sources"]:
                    if src.kind == "dataset" and src.name == key:
                        spec_src = src
            n = batch_items * spec_src.cpv * spec_src.fpc
            feed[key] = np.zeros((n,) + tuple(spec_src.shape), np.float32)
        n_items = self.num_labeled_items(batch_items)
        feed["labels"] = np.zeros((n_items, self.num_classes), np.int32)
        if self.caption_dataset is not None:
            # caption models additionally consume the framed word inputs
            # (run_task._prepare_feed builds these from real batches)
            dset = self.caption_dataset
            T = dset.max_sequence_length
            E = int(np.asarray(dset.embedding_matrix).shape[1])
            feed["caption_words"] = np.zeros((batch_items * T, E),
                                             np.float32)
            feed["caption_lengths"] = np.ones((batch_items,), np.int32)
            feed["caption_mask"] = np.zeros((batch_items, T), np.float32)
        return feed

    def num_labeled_items(self, batch_items):
        """Logit/label rows produced per batch of ``batch_items`` videos."""
        last = self.pipeline_meta[self.settings.pipeline_names[-1]]
        return batch_items * last["cpv"] * last["fpc"]

    def get_output_meta(self):
        return self.pipeline_meta[self.settings.pipeline_names[-1]]
