"""Vectorizer strategy objects: NOP / DCNN / FC / LSTM.

Counterpart of /root/reference/vectorizer.py:7-78 — strategy objects
bridging raw inputs to feature vectors with input-rank checks.  The
pipeline DAG builder (models/pipeline.py) dispatches every
``representation`` through these (``make_vectorizer`` + ``init`` /
``apply``), exactly as the reference's model.py builds its graph through
Vectorizer.build; the LSTM wrapper additionally backs the non-caption
LSTM classifier sequence pass.

Contract with the pipeline builder:
* ``param_key``       — name of the vectorizer's subtree inside the
                        pipeline's parameter dict (None: stateless),
* ``init(rng, shape)``— build the parameter tree; fills
                        ``train_regular`` / ``train_modified`` with
                        RELATIVE parameter paths ("" = the whole tree)
                        for the two-tier LR groups the reference's
                        ``Trainable`` base tracked (utils_.py:250-257),
* ``apply(params, x, compute_dtype)`` — run it.
"""

from video_learning_tpu.models import alexnet, lstm as lstm_mod
from video_learning_tpu.models.layers import (convert_dim_fc_apply,
                                              convert_dim_fc_init)
from video_learning_tpu.utils import error, warning_once


class Vectorizer:
    """Transforms raw input data into a feature vector."""

    name = "base"
    description = "abstract vectorizer"
    param_key = None
    # contract flags the pipeline builder dispatches on (instead of
    # type-checking concrete strategies):
    # wants_image_input: init() receives the full (H, W, C) input shape
    #                    rather than the flattened trailing dim
    # supports_remat:    apply() is expensive enough that jax.checkpoint
    #                    (rematerialize activations in backward) pays off
    wants_image_input = False
    supports_remat = False

    def __init__(self):
        self.train_regular = []
        self.train_modified = []
        self.ignorable_variable_names = []

    def __str__(self):
        return "%s:%s" % (self.name, self.description)

    def require_input(self, shape, rank):
        if len(shape) < rank:
            error("The [%s] vectorizer requires input rank >= %d, got "
                  "shape %s" % (self.name, rank, tuple(shape)))

    def init(self, rng, input_shape):
        return None

    def quantize_params(self, params, act_ranges=None):
        """Pre-quantized (int8 serving) form of this vectorizer's params,
        or None when the strategy has no int8 path (quantization is then
        skipped for the pipeline and Model.quantize_params warns).
        ``act_ranges`` ({layer: amax} from apply_calib) bakes static
        activation scales for the int8_static mode."""
        return None

    def apply_calib(self, params, x, compute_dtype=None):
        """Float forward + activation-range taps for static int8
        calibration, or None when the strategy has no int8 path (the
        pipeline then runs the plain apply and calibrates nothing)."""
        return None

    def output_dim(self, in_dim):
        """Feature dimension produced for inputs of trailing dim
        ``in_dim`` (static metadata for the DAG resolve pass)."""
        return in_dim

    def apply(self, params, x, compute_dtype=None, quant=None):
        raise NotImplementedError


class NOP(Vectorizer):
    name = "nop"
    description = "Does not transform input"

    def apply(self, params, x, compute_dtype=None, quant=None):
        if quant:
            # trace-time advisory, deduplicated across compiles AND
            # across quantize modes (int8 + int8_static would otherwise
            # repeat it once per mode)
            warning_once("quantize=%s has no effect on a [nop] "
                         "representation" % quant, key="nop-quantize")
        return x


class DCNN(Vectorizer):
    name = "dcnn"
    description = "Deep convolutional neural net (AlexNet)"
    param_key = "dcnn"
    wants_image_input = True
    supports_remat = True

    def __init__(self, num_classes, frame_encoding_layer="fc7",
                 weights_file=None):
        super().__init__()
        self.num_classes = num_classes
        self.frame_encoding_layer = frame_encoding_layer
        self.weights_file = weights_file

    def init(self, rng, input_shape):
        self.require_input(input_shape, 3)
        fc6_in = alexnet.conv_output_flat_dim(input_shape)
        params = alexnet.init(rng, self.num_classes,
                              self.frame_encoding_layer, self.weights_file,
                              fc6_in=fc6_in)
        self.train_regular, self.train_modified = \
            alexnet.param_groups(params)
        return params

    def output_dim(self, in_dim):
        return alexnet.output_dim(self.frame_encoding_layer,
                                  self.num_classes)

    def apply(self, params, x, compute_dtype=None, quant=None):
        self.require_input(x.shape, 3)
        if quant in ("int8", "int8_static"):
            # forward-only serving path (val/infer with quantize: int8 /
            # int8_static); params may be raw or pre-quantized
            # (alexnet.quantize_params — static scales ride in the params
            # as "xs" entries, so both modes share one forward)
            return alexnet.apply_int8(params, x, self.frame_encoding_layer,
                                      compute_dtype=compute_dtype)
        return alexnet.apply(params, x, self.frame_encoding_layer,
                             compute_dtype=compute_dtype)

    def quantize_params(self, params, act_ranges=None):
        return alexnet.quantize_params(params, act_ranges=act_ranges)

    def apply_calib(self, params, x, compute_dtype=None):
        self.require_input(x.shape, 3)
        return alexnet.apply_calib(params, x, self.frame_encoding_layer,
                                   compute_dtype=compute_dtype)


class FC(Vectorizer):
    name = "FC"
    description = "Fully-connected layer"
    param_key = "repr_fc"

    def __init__(self, fc_output_dim):
        super().__init__()
        self.fc_output_dim = fc_output_dim

    def init(self, rng, input_shape):
        params = convert_dim_fc_init(rng, int(input_shape[-1]),
                                     self.fc_output_dim)
        self.train_modified = [""]
        return params

    def output_dim(self, in_dim):
        return self.fc_output_dim

    def apply(self, params, x, compute_dtype=None, quant=None):
        self.require_input(x.shape, 2)
        if quant:
            # trace-time advisory (deduplicated): the FC encoder is a
            # single skinny matmul — int8 would save nothing, but the
            # user must know this pipeline runs unquantized
            warning_once("quantize=%s is implemented for DCNN frame "
                         "encoders only; the [FC] representation runs "
                         "unquantized" % quant, key="fc-quantize")
        return convert_dim_fc_apply(params, x, compute_dtype)


class LSTM(Vectorizer):
    name = "lstm"
    description = "Long short-term memory network"
    param_key = "lstm"

    def __init__(self, num_hidden, num_layers, sequence_len):
        super().__init__()
        self.num_hidden = num_hidden
        self.num_layers = num_layers
        self.sequence_len = sequence_len

    def init(self, rng, input_shape):
        params = lstm_mod.init(rng, int(input_shape[-1]), self.num_hidden,
                               self.num_layers)
        self.train_modified = [""]
        return params

    def output_dim(self, in_dim):
        return self.num_hidden

    def apply(self, params, x, compute_dtype=None, lengths=None,
              init_state=None):
        self.require_input(x.shape, 2)
        return lstm_mod.evaluate_sequence(params, x, self.num_hidden,
                                          self.sequence_len, lengths,
                                          init_state,
                                          compute_dtype=compute_dtype)


def make_vectorizer(net, num_classes):
    """Vectorizer for a pipeline's ``representation`` setting (the
    dispatch the reference's model.py:84-97 performs inline)."""
    from video_learning_tpu.defs import defs
    if net.representation == defs.representation.dcnn:
        return DCNN(num_classes, net.frame_encoding_layer,
                    net.weights_file)
    if net.representation == defs.representation.fc:
        return FC(net.fc_output_dim)
    if net.representation == defs.representation.nop:
        return NOP()
    error("Undefined representation [%s]" % net.representation)
