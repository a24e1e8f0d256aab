"""Audionet: small CIFAR10-style CNN for audio spectrogram images.

Counterpart of /root/reference/models/audionet/audionet.py: three
conv+maxpool stages (5x5x64 s1, 5x5x64 s1, 11x11x64 s2, each followed by a
3x3 s2 SAME max pool) -> flatten -> FC to num_classes.  The reference's
``make_pool`` call is a latent name bug (tf_util.py defines ``make_fusion``);
the documented intent — max pooling — is implemented here.
"""

import jax
import jax.numpy as jnp

from video_learning_tpu.models.layers import (conv_apply, conv_init,
                                              fc_init, fc_apply, flat_dim,
                                              max_pool)

_SPECS = [
    ("conv1", (5, 5, 3, 64), (1, 1)),
    ("conv2", (5, 5, 64, 64), (1, 1)),
    ("conv3", (11, 11, 64, 64), (2, 2)),
]


def _conv_stack(params, x, compute_dtype=None):
    for name, _, strides in _SPECS:
        x = conv_apply(params[name], x, strides, "SAME", relu=True,
                       compute_dtype=compute_dtype)
        x = max_pool(x, (3, 3), (2, 2), "SAME")
    return x


def init(rng, input_shape, num_classes):
    keys = jax.random.split(rng, len(_SPECS) + 1)
    params = {}
    for key, (name, kshape, _) in zip(keys, _SPECS):
        params[name] = conv_init(key, kshape)
    # size the FC from the conv stack's output
    dummy = jax.eval_shape(
        lambda p, x: _conv_stack(p, x),
        params, jax.ShapeDtypeStruct((1,) + tuple(input_shape), jnp.float32))
    params["fc1"] = fc_init(keys[-1], flat_dim(dummy.shape[1:]), num_classes)
    return params


def apply(params, x, compute_dtype=None):
    x = _conv_stack(params, x, compute_dtype)
    x = x.reshape(x.shape[0], flat_dim(x.shape[1:]))
    return fc_apply(params["fc1"], x, compute_dtype)


def param_groups(params, prefix=""):
    """All audionet layers train at the fresh-layer rate."""
    return [], [prefix + name for name in params]
