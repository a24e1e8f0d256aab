"""AlexNet DCNN frame encoder.

Functional JAX reimplementation of the reference's raw-TF AlexNet
(/root/reference/models/alexnet/alexnet.py): grouped convolutions
(group=2 on conv2/4/5, expressed as XLA feature_group_count rather than
split/concat), LRN after conv1/conv2, three max pools, fc6/fc7 (4096) and a
fresh fc8 sized to num_classes (alexnet.py:273-280).  Supports

* pretrained ``bvlc_alexnet.npy`` weight loading (per-layer
  net_data[name][0/1] arrays, alexnet.py:49-51),
* ``frame_encoding_layer`` truncation at fc6 / fc7 / prob
  (alexnet.py:233-255),
* two-tier LR parameter groups: conv*/fc6/fc7 -> "regular", fc8 ->
  "modified" (alexnet.py:214,231,251,280).

Geometry (input 227x227x3, SAME conv1 like the reference):
conv1 11x11x96 s4 SAME -> LRN -> pool3 s2 -> conv2 5x5x256 g2 -> LRN ->
pool -> conv3 3x3x384 -> conv4 3x3x384 g2 -> conv5 3x3x256 g2 -> pool ->
fc6 9216->4096 -> fc7 4096 -> fc8 num_classes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from video_learning_tpu.models.layers import (conv_apply, conv_init,
                                              fc_apply, fc_init, flat_dim,
                                              local_response_normalization,
                                              max_pool)
from video_learning_tpu.utils import error, info

# (kernel_h, kernel_w, in_ch, out_ch, stride, groups)
_CONV_SPECS = {
    "conv1": (11, 11, 3, 96, 4, 1),
    "conv2": (5, 5, 48, 256, 1, 2),
    "conv3": (3, 3, 256, 384, 1, 1),
    "conv4": (3, 3, 192, 384, 1, 2),
    "conv5": (3, 3, 192, 256, 1, 2),
}
_FC6_IN = 9216  # 6*6*256 for 227x227 input
_FC_DIM = 4096


def load_bvlc_weights(weights_file):
    """Load the public bvlc_alexnet.npy dict: {layer: [w, b]}
    (reference alexnet.py:49-51)."""
    if not os.path.exists(weights_file):
        error("AlexNet weights file does not exist: %s" % weights_file)
    net_data = np.load(weights_file, encoding="latin1",
                       allow_pickle=True).item()
    return net_data


def init(rng, num_classes, final_layer="prob", weights_file=None,
         fc6_in=None):
    """Build the parameter tree.  When ``weights_file`` is given, conv and
    fc6/fc7 weights come from the pretrained npy; fc8 is always freshly
    initialized at the configured class count (alexnet.py:273-280)."""
    if final_layer is None:
        final_layer = "prob"
    net_data = load_bvlc_weights(weights_file) if weights_file else None
    if net_data is not None:
        info("AlexNet: loading pretrained weights from %s" % weights_file)
    params = {}
    keys = jax.random.split(rng, 8)
    for i, (name, (kh, kw, cin, cout, _, _)) in enumerate(
            _CONV_SPECS.items()):
        if net_data is not None and name in net_data:
            params[name] = {"w": jnp.asarray(net_data[name][0]),
                            "b": jnp.asarray(net_data[name][1])}
        else:
            params[name] = conv_init(keys[i], (kh, kw, cin, cout),
                                     init_w=(0.0, 0.05), bias=0.1)
    fc6_in = fc6_in or _FC6_IN
    specs = [("fc6", fc6_in, _FC_DIM), ("fc7", _FC_DIM, _FC_DIM)]
    for j, (name, din, dout) in enumerate(specs):
        if final_layer == "fc6" and name == "fc7":
            break
        pretrained = net_data.get(name) if net_data is not None else None
        if pretrained is not None and \
                tuple(pretrained[0].shape) != (din, dout):
            # non-227 inputs change fc6's fan-in; the pretrained kernel
            # cannot apply (reference assumes 227x227, alexnet.py:224)
            info("AlexNet %s: pretrained shape %s != required (%d, %d); "
                 "initializing fresh" % (name, pretrained[0].shape, din,
                                         dout))
            pretrained = None
        if pretrained is not None:
            params[name] = {"w": jnp.asarray(pretrained[0]),
                            "b": jnp.asarray(pretrained[1])}
        else:
            params[name] = fc_init(keys[5 + j], din, dout)
    if final_layer not in ("fc6", "fc7"):
        params["fc8"] = fc_init(keys[7], _FC_DIM, num_classes)
    return params


def param_groups(params, prefix=""):
    """Two-tier LR split: everything but fc8 is 'regular' (pretrained
    rates), fc8 is 'modified' (fresh-layer rate) — alexnet.py:214-280."""
    regular, modified = [], []
    for name in params:
        target = modified if name == "fc8" else regular
        target.append(prefix + name)
    return regular, modified


def apply(params, x, final_layer="prob", compute_dtype=None):
    """Forward pass.  x: (N, H, W, 3) float32 (BGR, preprocessed).
    Returns the encoding at ``final_layer`` (fc6/fc7) or fc8 logits."""
    if final_layer is None:
        final_layer = "prob"

    def conv(name, inp, padding="SAME"):
        _, _, _, _, stride, groups = _CONV_SPECS[name]
        return conv_apply(params[name], inp, (stride, stride), padding,
                          groups=groups, relu=True,
                          compute_dtype=compute_dtype)

    x = conv("conv1", x)
    x = local_response_normalization(x)
    x = max_pool(x, (3, 3), (2, 2), "VALID")
    x = conv("conv2", x)
    x = local_response_normalization(x)
    x = max_pool(x, (3, 3), (2, 2), "VALID")
    x = conv("conv3", x)
    x = conv("conv4", x)
    x = conv("conv5", x)
    x = max_pool(x, (3, 3), (2, 2), "VALID")
    x = x.reshape(x.shape[0], flat_dim(x.shape[1:]))

    x = jax.nn.relu(fc_apply(params["fc6"], x, compute_dtype))
    if final_layer == "fc6":
        return x
    x = jax.nn.relu(fc_apply(params["fc7"], x, compute_dtype))
    if final_layer == "fc7":
        return x
    return fc_apply(params["fc8"], x, compute_dtype)


def output_dim(final_layer, num_classes):
    if final_layer in ("fc6", "fc7"):
        return _FC_DIM
    return num_classes


def conv_output_flat_dim(input_shape):
    """Flattened conv-stack output dim for a given (H, W, C) input —
    sizes fc6 for non-227 inputs without running real compute."""
    import math

    h, w = int(input_shape[0]), int(input_shape[1])

    def same(s, k, st):
        return math.ceil(s / st)

    def valid(s, k, st):
        return (s - k) // st + 1

    h, w = same(h, 11, 4), same(w, 11, 4)       # conv1 SAME s4
    h, w = valid(h, 3, 2), valid(w, 3, 2)       # pool1
    h, w = valid(h, 3, 2), valid(w, 3, 2)       # pool2 (convs SAME s1)
    h, w = valid(h, 3, 2), valid(w, 3, 2)       # pool5
    if h <= 0 or w <= 0:
        error("AlexNet input %s too small for the conv stack"
              % (input_shape,))
    return h * w * 256
