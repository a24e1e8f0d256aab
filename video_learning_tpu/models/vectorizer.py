"""Vectorizer strategy wrappers: NOP / DCNN / FC / LSTM.

Counterpart of /root/reference/vectorizer.py:7-78 — thin strategy objects
bridging raw inputs to feature vectors with input-rank checks.  The
pipeline DAG builder (models/pipeline.py) dispatches representations
directly; these wrappers exist for library users composing models outside
the config system, and carry the two-tier training groups the reference's
``Trainable`` base tracked (utils_.py:250-257).
"""

from video_learning_tpu.models import alexnet, lstm as lstm_mod
from video_learning_tpu.models.layers import (convert_dim_fc_apply,
                                              convert_dim_fc_init)
from video_learning_tpu.utils import error


class Vectorizer:
    """Transforms raw input data into a feature vector."""

    name = "base"
    description = "abstract vectorizer"

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
        return {}

    def apply(self, params, x):
        raise NotImplementedError


class NOP(Vectorizer):
    name = "nop"
    description = "Does not transform input"

    def apply(self, params, x):
        return x


class DCNN(Vectorizer):
    name = "dcnn"
    description = "Deep convolutional neural net (AlexNet)"

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

    def apply(self, params, x):
        self.require_input(x.shape, 3)
        return alexnet.apply(params, x, self.frame_encoding_layer)


class FC(Vectorizer):
    name = "FC"
    description = "Fully-connected layer"

    def __init__(self, output_dim):
        super().__init__()
        self.output_dim = output_dim

    def init(self, rng, input_shape):
        params = convert_dim_fc_init(rng, int(input_shape[-1]),
                                     self.output_dim)
        self.train_modified = ["fc"]
        return params

    def apply(self, params, x):
        self.require_input(x.shape, 2)
        return convert_dim_fc_apply(params, x)


class LSTM(Vectorizer):
    name = "lstm"
    description = "Long short-term memory network"

    def __init__(self, num_hidden, num_layers, sequence_len):
        super().__init__()
        self.num_hidden = num_hidden
        self.num_layers = num_layers
        self.sequence_len = sequence_len

    def init(self, rng, input_shape):
        params = lstm_mod.init(rng, int(input_shape[-1]), self.num_hidden,
                               self.num_layers)
        self.train_modified = ["lstm"]
        return params

    def apply(self, params, x, lengths=None, init_state=None):
        self.require_input(x.shape, 2)
        return lstm_mod.evaluate_sequence(params, x, self.num_hidden,
                                          self.sequence_len, lengths,
                                          init_state)
