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
    (reference alexnet.py:49-51).

    When a ``<weights_file>.sha256`` sidecar exists — written by
    ``tools/validate_pretrained.py``'s offline validation of the real
    pretrained asset — the file's digest is re-verified on every load, so
    a corrupted or silently swapped asset fails loudly instead of
    training on different features."""
    if not os.path.exists(weights_file):
        error("AlexNet weights file does not exist: %s" % weights_file)
    sidecar = weights_file + ".sha256"
    if os.path.exists(sidecar):
        import hashlib
        want = open(sidecar).read().split()[0].strip()
        h = hashlib.sha256()
        with open(weights_file, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        if h.hexdigest() != want:
            error("AlexNet weights file %s does not match its .sha256 "
                  "sidecar (%s != %s) — re-download or re-validate with "
                  "tools/validate_pretrained.py"
                  % (weights_file, h.hexdigest(), want))
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


def _conv1_space_to_depth(params, x, compute_dtype):
    """conv1 as a space-to-depth conv: numerically identical to the direct
    11x11-stride-4 SAME conv, restructured for the MXU.

    With C_in=3 the direct conv keeps at most 3 of the MXU's input lanes
    busy (the contraction is over 11*11*3=363 elements of which the
    hardware pads channels up); because conv1's stride (4) can serve as a
    space-to-depth block size, each output position reads whole 4x4 pixel
    blocks, so the input rearranges to (H/4, W/4, 48) and the kernel to a
    dense 3x3x48 (the 12th padded tap row/col is zero) with stride 1 —
    the standard TPU treatment of low-channel stem convs.  The weight
    transform runs inside the graph on the original (11,11,3,96) layout,
    so checkpoints, the bvlc npy import, and autodiff are unaffected.
    Measured on v5e: whole-workload parity with the direct conv (the XLA
    TPU backend already performs an equivalent restructuring), so this
    stays opt-in via VLT_CONV1_S2D=1.
    Valid for any input H,W (SAME pad keeps outputs block-aligned since
    output o always starts at padded row 4*o)."""
    w, b = params["w"], params["b"]  # (11, 11, 3, 96)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    n, h, wd, c = x.shape
    out_h, out_w = -(-h // 4), -(-wd // 4)      # ceil (SAME, stride 4)
    pad_h = max((out_h - 1) * 4 + 11 - h, 0)
    pad_w = max((out_w - 1) * 4 + 11 - wd, 0)
    plh, plw = pad_h // 2, pad_w // 2
    # extend hi padding so the padded extent is a whole number of blocks
    ph = plh + h + pad_h - pad_h // 2
    pw = plw + wd + pad_w - pad_w // 2
    eh, ew = (-ph) % 4, (-pw) % 4
    x = jnp.pad(x, ((0, 0), (plh, pad_h - plh + eh),
                    (plw, pad_w - plw + ew), (0, 0)))
    bh, bw = x.shape[1] // 4, x.shape[2] // 4
    x = x.reshape(n, bh, 4, bw, 4, c).transpose(0, 1, 3, 2, 4, 5) \
         .reshape(n, bh, bw, 16 * c)
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))   # 12x12 taps
    wp = wp.reshape(3, 4, 3, 4, c, w.shape[-1]) \
           .transpose(0, 2, 1, 3, 4, 5).reshape(3, 3, 16 * c, w.shape[-1])
    y = jax.lax.conv_general_dilated(
        x, wp, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y[:, :out_h, :out_w, :] + b.astype(y.dtype)
    return jax.nn.relu(y)


# Off by default: the whole-workload A/B measured parity (1043 vs 1046
# clips/s on v5e, BASELINE.md) — XLA:TPU already restructures low-channel
# stem convs internally, so the manual rearrange buys nothing here.  Kept
# as a tested, exactly-equivalent alternative lowering
# (tests/test_models.py::test_conv1_space_to_depth_matches_direct) for
# backends where the compiler does not.
_CONV1_S2D = os.environ.get("VLT_CONV1_S2D", "0") == "1"
# conv1 with a replacement weight-grad formulation (VLT_CONV1_DW_IMPL):
#   "shifted" — Pallas row-shifted-matmul kernel over position-flattened
#               s2d operands (ops/pallas_kernels.conv1_dw_shifted); reads
#               each operand once and runs the 9 tap-contractions as
#               static-slice MXU matmuls.  Measured 2.6x slower than
#               XLA's native lowering, which sits exactly at the MXU
#               pass-count bound for this contraction (BASELINE.md r3).
#   "im2col"  — chunked explicit-patch + MXU matmul (conv1_dw_xla).
#               Measured on v5e round 2: 980 clips/s whole-workload vs
#               1045 for XLA's native lowering (the patch matrix adds
#               ~9.7 GB HBM traffic per step).
# The legacy VLT_CONV1_FAST_DW=1 / VLT_CONV1_PALLAS_DW=1 flags select
# "im2col".  The freeze ablation (1457.7 c/s) bounds what a fully fused
# weight-grad can recover; BASELINE.md has the table.
_CONV1_DW_IMPL = os.environ.get("VLT_CONV1_DW_IMPL", "")
if not _CONV1_DW_IMPL and os.environ.get(
        "VLT_CONV1_FAST_DW", os.environ.get("VLT_CONV1_PALLAS_DW",
                                            "0")) == "1":
    _CONV1_DW_IMPL = "im2col"
if _CONV1_DW_IMPL not in ("", "im2col", "shifted"):
    # a typo must not silently A/B the default against itself
    raise ValueError("VLT_CONV1_DW_IMPL must be 'im2col' or 'shifted', "
                     "got %r" % _CONV1_DW_IMPL)
_CONV1_PALLAS_DW = _CONV1_DW_IMPL in ("im2col", "shifted")


@jax.custom_vjp
def _conv1_direct(w, b, x):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(4, 4), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + b.astype(y.dtype))


def _conv1_direct_fwd(w, b, x):
    out = _conv1_direct(w, b, x)
    return out, (w, b, x, out)


def _conv1_direct_bwd(res, g):
    """XLA forward; dL/dw via the selected replacement formulation
    (ops/pallas_kernels.conv1_dw_shifted / conv1_dw_xla — the skinny
    stem-conv weight contraction is the per-layer ablation's top cost
    under XLA's native conv-transpose lowering); exact XLA dL/dx
    (dead-code-eliminated in training, where the input is data)."""
    from video_learning_tpu.ops import pallas_kernels as pk
    w, b, x, out = res
    g = g * (out > 0).astype(g.dtype)          # relu
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(b.dtype)
    if _CONV1_DW_IMPL == "shifted":
        dw = pk.conv1_dw_shifted(x, g).astype(w.dtype)
    else:
        dw = pk.conv1_dw_xla(x, g).astype(w.dtype)
    # exact input-grad via the conv's own VJP; in training the input is
    # data, so XLA dead-code-eliminates this entirely
    _, in_vjp = jax.vjp(
        lambda xx: jax.lax.conv_general_dilated(
            xx, w, window_strides=(4, 4), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x)
    dx, = in_vjp(g)
    return dw, db, dx.astype(x.dtype)


_conv1_direct.defvjp(_conv1_direct_fwd, _conv1_direct_bwd)


def _conv1_pallas_dw(params, x, compute_dtype):
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    return _conv1_direct(w, b, x)


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

    conv1_params = params["conv1"]
    if os.environ.get("VLT_FREEZE_CONV1") == "1":
        # ablation-measurement knob (not a training feature — use two-tier
        # LR for real freeze-style fine-tuning): drops conv1's dL/dw from
        # the backward pass to quantify its share of the step
        conv1_params = jax.lax.stop_gradient(conv1_params)
    if _CONV1_S2D:
        x = _conv1_space_to_depth(conv1_params, x, compute_dtype)
    elif _CONV1_PALLAS_DW:
        x = _conv1_pallas_dw(conv1_params, x, compute_dtype)
    else:
        x = conv_apply(conv1_params, x, (4, 4), "SAME", groups=1,
                       relu=True, compute_dtype=compute_dtype)
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


def apply_int8(params, x, final_layer="prob", compute_dtype=None):
    """Forward pass with w8a8 post-training quantization for SERVING
    (forward-only; see layers.conv_apply_int8).  conv2..conv5 and the FC
    stack run int8 on the MXU (2x bf16 peak); conv1 stays in the compute
    dtype — its C_in=3 contraction is lane-bound, not FLOP-bound, so int8
    buys nothing there and the stem keeps full input fidelity.  LRN and
    pooling are unchanged (HBM-bound, activations stay bf16-resident).
    Same truncation semantics as apply()."""
    from video_learning_tpu.models.layers import (conv_apply_int8,
                                                  fc_apply_int8)
    if final_layer is None:
        final_layer = "prob"
    out_dtype = compute_dtype or jnp.bfloat16

    def conv_q(name, inp):
        _, _, _, _, stride, groups = _CONV_SPECS[name]
        return conv_apply_int8(params[name], inp, (stride, stride),
                               "SAME", groups=groups, relu=True,
                               out_dtype=out_dtype)

    x = conv_apply(params["conv1"], x, (4, 4), "SAME", groups=1,
                   relu=True, compute_dtype=compute_dtype)
    x = local_response_normalization(x)
    x = max_pool(x, (3, 3), (2, 2), "VALID")
    x = conv_q("conv2", x)
    x = local_response_normalization(x)
    x = max_pool(x, (3, 3), (2, 2), "VALID")
    x = conv_q("conv3", x)
    x = conv_q("conv4", x)
    x = conv_q("conv5", x)
    x = max_pool(x, (3, 3), (2, 2), "VALID")
    x = x.reshape(x.shape[0], flat_dim(x.shape[1:]))

    x = jax.nn.relu(fc_apply_int8(params["fc6"], x))
    if final_layer == "fc6":
        return x
    x = jax.nn.relu(fc_apply_int8(params["fc7"], x))
    if final_layer == "fc7":
        return x
    return fc_apply_int8(params["fc8"], x)


def apply_calib(params, x, final_layer="prob", compute_dtype=None):
    """Calibration forward for STATIC int8 activation scales: the plain
    float forward (same stages as apply(); the opt-in conv1 training
    variants are irrelevant on this serving-only path), additionally
    returning {layer: amax(|input|)} float32 scalars at every
    int8-eligible layer input — exactly the tensors apply_int8 would
    dynamically reduce per batch.  quantize_params(act_ranges=taps)
    converts these ranges into baked "xs" scales so the serving forward
    carries no activation reductions (layers.quantize_static).
    Returns (output_at_final_layer, taps)."""
    if final_layer is None:
        final_layer = "prob"
    taps = {}

    def tap(name, inp):
        taps[name] = jnp.max(jnp.abs(inp.astype(jnp.float32)))
        return inp

    def conv(name, inp):
        _, _, _, _, stride, groups = _CONV_SPECS[name]
        return conv_apply(params[name], tap(name, inp), (stride, stride),
                          "SAME", groups=groups, relu=True,
                          compute_dtype=compute_dtype)

    x = conv_apply(params["conv1"], x, (4, 4), "SAME", groups=1,
                   relu=True, compute_dtype=compute_dtype)
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

    x = jax.nn.relu(fc_apply(params["fc6"], tap("fc6", x), compute_dtype))
    if final_layer == "fc6":
        return x, taps
    x = jax.nn.relu(fc_apply(params["fc7"], tap("fc7", x), compute_dtype))
    if final_layer == "fc7":
        return x, taps
    return fc_apply(params["fc8"], tap("fc8", x), compute_dtype), taps


def quantize_params(params, act_ranges=None):
    """Pre-quantize the int8-eligible layers ONCE per restored checkpoint:
    conv2..conv5 / fc6..fc8 entries become {"wq", "ws", "b"}; conv1 (and
    any absent truncated layers) pass through untouched.  apply_int8
    consumes either form, but the serving loop should feed this one — an
    in-graph weight quantize would otherwise re-run on every batch of
    every eval (jit caches the trace, not loop-invariant work across
    calls).

    ``act_ranges`` ({layer: amax} from apply_calib over calibration
    batches) additionally bakes STATIC activation scales "xs" into each
    entry, removing the per-batch amax reductions from the serving
    forward (quantize: int8_static)."""
    from video_learning_tpu.models.layers import quantize_sym
    out = dict(params)

    def entry(name, wq, ws):
        e = {"wq": wq, "ws": ws, "b": out[name]["b"]}
        if act_ranges is not None:
            if name not in act_ranges:
                error("Calibration ranges missing layer [%s] — taps %s"
                      % (name, sorted(act_ranges)))
            amax = jnp.asarray(act_ranges[name], jnp.float32)
            e["xs"] = amax / 127.0 + 1e-12
        return e

    for name in ("conv2", "conv3", "conv4", "conv5"):
        if name in out:
            wq, ws = quantize_sym(out[name]["w"], axes=(0, 1, 2))
            out[name] = entry(name, wq, ws)
    for name in ("fc6", "fc7", "fc8"):
        if name in out:
            wq, ws = quantize_sym(out[name]["w"], axes=(0,))
            out[name] = entry(name, wq, ws)
    return out


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
