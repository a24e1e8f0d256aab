"""Shared functional layers: parameter init + apply for FC / conv / LRN.

Initialization specs follow the reference so fresh layers train with the
same statistics (truncated normal std 0.05, bias 0.1 for FC layers —
tf_util.py:32-60; truncated normal (0.0, 0.1) / zero bias for conv helpers
— tf_util.py:80-97).  Matmuls/convs run through the MXU in the configured
compute dtype with float32 accumulation (preferred_element_type).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from video_learning_tpu.utils import error


def truncated_normal(rng, shape, stddev=0.05, mean=0.0):
    """TF-style truncated normal: values beyond 2 std are re-drawn."""
    return mean + stddev * jax.random.truncated_normal(
        rng, -2.0, 2.0, shape, dtype=jnp.float32)


# ------------------------------------------------------------------- dense
def fc_init(rng, in_dim, out_dim, w_stddev=0.05, bias=0.1):
    """FC params (reference tf_util.py:42-49 init spec)."""
    return {"w": truncated_normal(rng, (in_dim, out_dim), w_stddev),
            "b": jnp.full((out_dim,), bias, jnp.float32)}


def fc_apply(params, x, compute_dtype=None):
    """x @ w + b with f32 accumulation on the MXU."""
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(jnp.float32)


def convert_dim_fc_init(rng, in_dim, out_dim):
    """Init a dim-converting FC only when dims differ
    (reference tf_util.py:32-60 returns the input unchanged otherwise)."""
    if in_dim == out_dim:
        return None
    return fc_init(rng, in_dim, out_dim)


def convert_dim_fc_apply(params, x, compute_dtype=None):
    if params is None:
        return x
    return fc_apply(params, x, compute_dtype)


# -------------------------------------------------------------------- conv
def conv_init(rng, kernel_params, init_w=(0.0, 0.1), bias=0.0):
    """Conv params, HWIO layout (reference tf_util.py:91-93 init spec)."""
    return {"w": truncated_normal(rng, tuple(kernel_params), init_w[1],
                                  init_w[0]),
            "b": jnp.full((kernel_params[-1],), bias, jnp.float32)}


def conv_apply(params, x, strides, padding, groups=1, relu=True,
               compute_dtype=None):
    """NHWC conv with optional grouped channels (AlexNet's group=2 split,
    reference models/alexnet/alexnet.py:15-31, expressed natively via XLA's
    feature_group_count instead of split/concat)."""
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        # compute in the low-precision dtype (the MXU accumulates in f32
        # internally) and keep activations resident in it — halving the
        # HBM traffic of the following LRN/pool chain (26% faster AlexNet
        # forward measured on v5e vs f32-resident activations)
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=tuple(strides), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    y = y + b.astype(y.dtype)
    return jax.nn.relu(y) if relu else y


def max_pool(x, window, strides, padding):
    """NHWC max pool (reference tf_util.py:66-78)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window[0], window[1], 1),
        window_strides=(1, strides[0], strides[1], 1),
        padding=padding)


# --------------------------------------------------------------------- LRN
def _lrn_band_apply(v, band):
    # Accumulate in the activation dtype: with alpha=2e-5 the window sum
    # perturbs the denominator (~= bias) at most O(alpha * acc), so bf16
    # accumulation changes the output by < 1e-3 relative — below the bf16
    # output quantization itself — and halves the matmul's HBM write
    # traffic (measured 1.6x faster fwd at the AlexNet conv1 site).
    c = v.shape[-1]
    acc = jax.lax.dot_general(
        v.reshape(-1, c), band, (((1,), (0,)), ((), ())),
        preferred_element_type=v.dtype)
    return acc.reshape(v.shape).astype(jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _lrn_xla(x, depth_radius, bias, alpha, beta):
    return _lrn_xla_fwd(x, depth_radius, bias, alpha, beta)[0]


def _lrn_xla_fwd(x, depth_radius, bias, alpha, beta):
    from video_learning_tpu.ops.pallas_kernels import (_pow_neg_beta,
                                                       band_matrix)
    band = band_matrix(x.shape[-1], depth_radius, x.dtype)
    d = bias + alpha * _lrn_band_apply(jnp.square(x), band)
    p = _pow_neg_beta(d, beta)
    return x * p.astype(x.dtype), (x, d, p)


def _lrn_xla_bwd(depth_radius, bias, alpha, beta, res, g):
    # dL/dx_k = g_k p_k - 2*alpha*beta * x_k * sum_{|i-k|<=r} g_i x_i
    #           * d_i**(-beta-1); the band matrix is symmetric so the
    #           window sum is the same matmul as the forward's.
    from video_learning_tpu.ops.pallas_kernels import band_matrix
    x, d, p = res
    band = band_matrix(x.shape[-1], depth_radius, x.dtype)
    gf = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    inner = (gf * xf * (p / d)).astype(x.dtype)
    s = _lrn_band_apply(inner, band)
    dx = gf * p - (2.0 * alpha * beta) * xf * s
    return (dx.astype(x.dtype),)


_lrn_xla.defvjp(_lrn_xla_fwd, _lrn_xla_bwd)


def _lrn_slide(x, depth_radius, bias, alpha, beta):
    """Sliding-slice formulation: 2r shifted adds over the channel axis.
    The right shape for CPU/non-matrix backends — as a (rows, C) @ (C, C)
    band matmul the same window sum costs C/(2r+1) ~ 19x more scalar
    FLOPs, which measured 13x slower end-to-end on this image's 1-core
    host when the band form briefly became the CPU path too."""
    sq = jnp.square(x).astype(jnp.float32)
    pad = [(0, 0)] * (x.ndim - 1) + [(depth_radius, depth_radius)]
    sq = jnp.pad(sq, pad)
    c = x.shape[-1]
    acc = sq[..., 0:c]
    for i in range(1, 2 * depth_radius + 1):
        acc = acc + sq[..., i:i + c]
    return x * jnp.power(bias + alpha * acc, -beta).astype(x.dtype)


def local_response_normalization(x, depth_radius=2, bias=1.0, alpha=2e-5,
                                 beta=0.75):
    """AlexNet local response normalization over channels, matching
    tf.nn.local_response_normalization semantics
    (reference models/alexnet/alexnet.py:85-89):
      out = x / (bias + alpha * sum_{d-r..d+r} x_d^2) ** beta.

    On TPU the channel-window sum of squares runs as a banded-matrix
    matmul — MXU work instead of the lane-rotation channel shifts a
    sliding-slice formulation lowers to (measured at the AlexNet conv1
    site, 2048 bf16 55x55x96 frames on v5e: fwd 11.6 vs 26.3 ms, fwd+bwd
    17.8 vs 55.2 ms = 3.1x; BASELINE.md has the ladder).  A custom VJP
    keeps the backward to one more band matmul plus elementwise.  On CPU
    the sliding form wins by the same argument in reverse (no matrix
    unit, ~19x more scalar FLOPs in the band form).  ``VLT_USE_PALLAS=1``
    selects the fused Pallas kernel (ops/pallas_kernels.lrn), which
    measured slower than the band-matmul XLA form on v5e because the
    pallas_call boundary blocks fusion with the neighboring conv (see
    its module docstring)."""
    from video_learning_tpu.ops import pallas_kernels
    if pallas_kernels.enabled():
        return pallas_kernels.lrn(x, depth_radius, bias, alpha, beta)
    if pallas_kernels.on_tpu():
        return _lrn_xla(x, depth_radius, bias, alpha, beta)
    return _lrn_slide(x, depth_radius, bias, alpha, beta)


# ------------------------------------------------------- int8 (serving PTQ)
def quantize_sym(x, axes):
    """Symmetric int8 quantization: q = clip(round(x / s), -127, 127) with
    s = amax/127 reduced over ``axes`` (None: per-tensor).  Activation
    quantization runs in-graph (XLA fuses it into the producer); WEIGHT
    quantization should run ONCE per restored checkpoint via
    alexnet.quantize_params — a jitted eval forward is retraced per call
    site, not per step, but each `forward(params, feed)` invocation would
    still re-execute an in-graph weight quantize every batch (there is no
    device loop for XLA to hoist it out of).
    Returns (q int8, scale f32 broadcastable against x)."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = a / 127.0 + 1e-12
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def quantize_static(x, scale):
    """int8 quantization against a CALIBRATED static scale: purely
    elementwise (no amax reduction), so XLA fuses it into the producing
    layer's epilogue — the dynamic path's reduction forces an extra HBM
    read pass over the activation before the contraction can start.
    Out-of-calibration-range activations saturate at +-127 (standard PTQ
    semantics)."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def conv_apply_int8(params, x, strides, padding, groups=1, relu=True,
                    out_dtype=jnp.bfloat16):
    """w8a8 post-training-quantized conv for the forward-only serving
    path: per-output-channel symmetric weight scales, dynamic per-tensor
    activation scale, int8xint8 -> int32 accumulation on the MXU (2x the
    bf16 peak on v5e), dequantize/bias/relu epilogue.  Numerics are NOT
    training-grade — gradients through the rounding are zero; callers
    gate this behind forward-only entry points.

    ``params`` holds either a raw {"w", "b"} entry (quantized here,
    in-graph — fine for one-shot tests/dryruns) or a pre-quantized
    {"wq", "ws", "b"} entry from alexnet.quantize_params (the serving
    path: weights quantized once per restored checkpoint, not once per
    batch).  A calibrated static activation scale ``xs`` (from
    alexnet.quantize_params(act_ranges=...)) replaces the dynamic
    per-batch amax — see quantize_static."""
    b = params["b"]
    if "wq" in params:
        wq, ws = params["wq"], params["ws"]       # (1, 1, 1, Cout)
    else:
        wq, ws = quantize_sym(params["w"], axes=(0, 1, 2))
    if "xs" in params:
        xq, xs = quantize_static(x, params["xs"])
    else:
        xq, xs = quantize_sym(x, axes=None)
    acc = jax.lax.conv_general_dilated(
        xq, wq, window_strides=tuple(strides), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (xs * ws)
    y = y + b.astype(jnp.float32)
    if relu:
        y = jax.nn.relu(y)
    return y.astype(out_dtype)


def fc_apply_int8(params, x):
    """w8a8 dense counterpart of fc_apply (per-output-column weight
    scales); returns float32 like fc_apply.  Accepts raw {"w", "b"} or
    pre-quantized {"wq", "ws", "b"} entries like conv_apply_int8, with
    the same optional calibrated static activation scale "xs"."""
    b = params["b"]
    if "wq" in params:
        wq, ws = params["wq"], params["ws"]       # (1, out_dim)
    else:
        wq, ws = quantize_sym(params["w"], axes=(0,))
    if "xs" in params:
        xq, xs = quantize_static(x, params["xs"])
    else:
        xq, xs = quantize_sym(x, axes=None)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (xs * ws) + b.astype(jnp.float32)


# ----------------------------------------------------------------- dropout
def dropout(rng, x, keep_prob):
    """TF-style dropout: scale kept units by 1/keep_prob
    (reference models/lstm/lstm.py:50-56 applies when keep_prob > 0)."""
    if keep_prob is None or keep_prob <= 0 or keep_prob >= 1:
        return x
    if rng is None:
        error("dropout requires an rng in training mode")
    mask = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)


# ------------------------------------------------------------------- misc
def vectorize(x, depth_dim):
    """Flatten trailing dims (reference tf_util.py:62-63)."""
    return jnp.reshape(x, (-1, depth_dim))


def flat_dim(shape):
    return int(np.prod([int(s) for s in shape]))
