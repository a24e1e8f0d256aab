"""Model-layer tests: LSTM cell/scan parity vs a numpy step-by-step
reference, AlexNet geometry + LRN numerics, fusion ops, audionet, and the
pipeline DAG builder."""

import jax
import jax.numpy as jnp
import os
import numpy as np
import pytest

from video_learning_tpu.defs import defs
from video_learning_tpu.models import alexnet, audionet
from video_learning_tpu.models import lstm as lstm_mod
from video_learning_tpu.models.layers import (fc_apply, fc_init,
                                              local_response_normalization,
                                              max_pool)
from video_learning_tpu.ops import fusion


# -------------------------------------------------------------------- LSTM
def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_lstm_reference(params, x, lengths=None, init_state=None):
    """Step-by-step numpy BasicLSTMCell stack (TF semantics: gates i,j,f,o;
    forget_bias=1.0) to validate the scan implementation."""
    B, T, _ = x.shape
    num_layers = len(params["cells"])
    H = params["cells"][0]["b"].shape[0] // 4
    states = []
    for _ in range(num_layers):
        if init_state is not None:
            states.append([np.array(init_state), np.array(init_state)])
        else:
            states.append([np.zeros((B, H)), np.zeros((B, H))])
    seq = np.array(x)
    for l, layer in enumerate(params["cells"]):
        w = np.array(layer["w"])
        b = np.array(layer["b"])
        d = seq.shape[-1]
        outs = np.zeros((B, T, H))
        c, h = states[l]
        for t in range(T):
            gates = seq[:, t, :] @ w[:d] + h @ w[d:] + b
            i, j, f, o = np.split(gates, 4, axis=-1)
            new_c = c * _np_sigmoid(f + 1.0) + _np_sigmoid(i) * np.tanh(j)
            new_h = np.tanh(new_c) * _np_sigmoid(o)
            if lengths is not None:
                m = (t < lengths).astype(np.float64)[:, None]
                new_c = np.where(m > 0, new_c, c)
                new_h_keep = np.where(m > 0, new_h, h)
                outs[:, t, :] = new_h * m
                c, h = new_c, new_h_keep
            else:
                outs[:, t, :] = new_h
                c, h = new_c, new_h
        states[l] = [c, h]
        seq = outs
    return seq, states


def test_lstm_scan_matches_manual_loop():
    rng = jax.random.PRNGKey(0)
    B, T, D, H = 3, 5, 4, 6
    params = lstm_mod.init(rng, D, H, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (B * T, D))
    out, states = lstm_mod.evaluate_sequence(params, x, H, T)
    ref_out, ref_states = _np_lstm_reference(params,
                                             np.array(x).reshape(B, T, D))
    assert np.allclose(out, ref_out, atol=1e-5)
    assert np.allclose(states[-1][1], ref_states[-1][1], atol=1e-5)


def test_lstm_length_masking():
    rng = jax.random.PRNGKey(0)
    B, T, D, H = 3, 6, 4, 5
    params = lstm_mod.init(rng, D, H, 1)
    x = jax.random.normal(jax.random.PRNGKey(2), (B * T, D))
    lengths = jnp.array([6, 3, 1])
    out, states = lstm_mod.evaluate_sequence(params, x, H, T,
                                             lengths=lengths)
    ref_out, ref_states = _np_lstm_reference(
        params, np.array(x).reshape(B, T, D), lengths=np.array(lengths))
    assert np.allclose(out, ref_out, atol=1e-5)
    # outputs past length are zero (dynamic_rnn semantics)
    assert np.allclose(out[1, 3:, :], 0.0)
    assert np.allclose(states[-1][1], ref_states[-1][1], atol=1e-5)


def test_lstm_initial_state():
    rng = jax.random.PRNGKey(0)
    B, T, D, H = 2, 4, 3, 5
    params = lstm_mod.init(rng, D, H, 2)
    x = jax.random.normal(jax.random.PRNGKey(3), (B * T, D))
    s0 = jax.random.normal(jax.random.PRNGKey(4), (B, H))
    out, _ = lstm_mod.evaluate_sequence(params, x, H, T, init_state=s0)
    ref_out, _ = _np_lstm_reference(params, np.array(x).reshape(B, T, D),
                                    init_state=np.array(s0))
    assert np.allclose(out, ref_out, atol=1e-5)


def test_greedy_decode_shapes_and_feedback():
    rng = jax.random.PRNGKey(0)
    V, E, H, B, T = 11, 7, 8, 3, 5
    params = lstm_mod.init(rng, E, H, 1)
    out_fc = fc_init(jax.random.PRNGKey(1), H, V)
    emb = jax.random.normal(jax.random.PRNGKey(2), (V, E))
    visual = jax.random.normal(jax.random.PRNGKey(3), (B, H))
    idx = lstm_mod.greedy_decode(params, out_fc, visual, emb, 0, T, H,
                                 defs.rnn_visual_mode.state_bias)
    assert idx.shape == (B, T)
    assert idx.dtype in (jnp.int32, jnp.int64)
    assert np.all(np.array(idx) >= 0) and np.all(np.array(idx) < V)
    # different visuals should (generically) decode different captions
    visual2 = visual + 10.0
    idx2 = lstm_mod.greedy_decode(params, out_fc, visual2, emb, 0, T, H,
                                  defs.rnn_visual_mode.state_bias)
    assert not np.array_equal(np.array(idx), np.array(idx2))


# -------------------------------------------------------------------- LRN
def test_lrn_matches_manual():
    x = np.random.RandomState(0).randn(2, 3, 3, 8).astype(np.float32)
    out = np.array(local_response_normalization(jnp.asarray(x)))
    # manual per-position computation
    r, bias, alpha, beta = 2, 1.0, 2e-5, 0.75
    ref = np.zeros_like(x)
    C = x.shape[-1]
    for c in range(C):
        lo, hi = max(0, c - r), min(C, c + r + 1)
        s = np.sum(x[..., lo:hi] ** 2, axis=-1)
        ref[..., c] = x[..., c] / (bias + alpha * s) ** beta
    assert np.allclose(out, ref, atol=1e-5)


# ----------------------------------------------------------------- alexnet
def test_alexnet_geometry_227():
    params = alexnet.init(jax.random.PRNGKey(0), 10, "prob")
    x = jnp.zeros((2, 227, 227, 3))
    fc7 = alexnet.apply(params, x, "fc7")
    assert fc7.shape == (2, 4096)
    logits = alexnet.apply(params, x, "prob")
    assert logits.shape == (2, 10)
    assert alexnet.conv_output_flat_dim((227, 227, 3)) == 9216


def test_alexnet_param_groups():
    params = alexnet.init(jax.random.PRNGKey(0), 10, "prob")
    reg, mod = alexnet.param_groups(params)
    assert any("fc8" in m for m in mod)
    assert all("fc8" not in r for r in reg)
    assert any("conv1" in r for r in reg)


def test_alexnet_small_input():
    shape = (67, 67, 3)
    fc6_in = alexnet.conv_output_flat_dim(shape)
    params = alexnet.init(jax.random.PRNGKey(0), 5, "fc6", fc6_in=fc6_in)
    out = alexnet.apply(params, jnp.zeros((3,) + shape), "fc6")
    assert out.shape == (3, 4096)


def test_alexnet_int8_serving_close_to_f32():
    """apply_int8 (w8a8 PTQ serving forward) tracks the full-precision
    forward: small relative error on features and logits, identical
    truncation semantics.  Real image statistics via a mean-subtracted
    uint8-range input."""
    rng = np.random.RandomState(0)
    params = alexnet.init(jax.random.PRNGKey(0), 10, "prob")
    x = jnp.asarray(rng.randint(0, 256, (4, 67, 67, 3)) - 117.0,
                    jnp.float32)
    for layer in ("fc7", "prob"):
        fc6_in = alexnet.conv_output_flat_dim((67, 67, 3))
        p = alexnet.init(jax.random.PRNGKey(0), 10, layer, fc6_in=fc6_in)
        ref = np.asarray(alexnet.apply(p, x, layer))
        q = np.asarray(alexnet.apply_int8(p, x, layer))
        assert q.shape == ref.shape
        rel = np.linalg.norm(q - ref) / (np.linalg.norm(ref) + 1e-9)
        assert rel < 0.06, "int8 %s rel err %.4f" % (layer, rel)
    # top-1 agreement on the logits head
    ref = np.asarray(alexnet.apply(p, x, "prob"))
    q = np.asarray(alexnet.apply_int8(p, x, "prob"))
    assert (ref.argmax(-1) == q.argmax(-1)).mean() >= 0.75


def test_pipeline_quantize_int8_forward_and_train_guard():
    """Model.apply(quantize='int8') runs the DAG with the quantized frame
    encoder (DCNN -> LSTM) and is rejected in training mode (gradients
    through int8 rounding are zero)."""
    import pytest
    from video_learning_tpu.models.pipeline import Model
    from video_learning_tpu.utils import FrameworkError
    from tests.test_pipeline_model import StubDataset, _net, _settings

    ds = StubDataset("main", (67, 67, 3), 1, 2)
    enc = _net(input=["main"], representation=defs.representation.dcnn,
               frame_encoding_layer="fc6")
    clf = _net(input=["enc"], representation=defs.representation.nop,
               classifier=defs.classifier.lstm,
               lstm_params=[12, 1, defs.fusion_method.avg])
    s = _settings({"enc": enc, "clf": clf}, ["enc", "clf"], [ds],
                  num_classes=4)
    model = Model(s)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    feed = {"enc_main_input":
            (rng.randint(0, 256, (4, 67, 67, 3)) - 117.0).astype(
                np.float32)}
    ref = np.asarray(model.apply(params, feed, train=False))
    q = np.asarray(model.apply(params, feed, train=False,
                               quantize="int8"))
    assert q.shape == ref.shape == (2, 4)
    assert np.all(np.isfinite(q))
    rel = np.linalg.norm(q - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.1, "pipeline int8 rel err %.4f" % rel
    with pytest.raises(FrameworkError, match="serving"):
        model.apply(params, feed, train=True, quantize="int8",
                    dropout_rng=jax.random.PRNGKey(1))


def test_quantize_params_matches_in_graph_quantize():
    """alexnet.quantize_params (the once-per-checkpoint serving form) is
    numerically IDENTICAL to the in-graph weight quantize — same scales,
    same rounding — and Model.quantize_params wires it through the
    pipeline params tree (the val._maybe_quantize path)."""
    rng = np.random.RandomState(0)
    p = alexnet.init(jax.random.PRNGKey(0), 10, "prob")
    x = jnp.asarray(rng.randint(0, 256, (4, 67, 67, 3)) - 117.0,
                    jnp.float32)
    fc6_in = alexnet.conv_output_flat_dim((67, 67, 3))
    p = alexnet.init(jax.random.PRNGKey(0), 10, "prob", fc6_in=fc6_in)
    qp = alexnet.quantize_params(p)
    assert "wq" in qp["conv2"] and "w" not in qp["conv2"]
    assert "w" in qp["conv1"]          # stem stays full precision
    a = np.asarray(alexnet.apply_int8(p, x, "prob"))
    b = np.asarray(alexnet.apply_int8(qp, x, "prob"))
    np.testing.assert_array_equal(a, b)

    # pipeline-level: Model.quantize_params rewrites only the DCNN leaf
    from video_learning_tpu.models.pipeline import Model
    from tests.test_pipeline_model import StubDataset, _net, _settings
    ds = StubDataset("main", (67, 67, 3), 1, 2)
    enc = _net(input=["main"], representation=defs.representation.dcnn,
               frame_encoding_layer="fc6")
    clf = _net(input=["enc"], representation=defs.representation.nop,
               classifier=defs.classifier.lstm,
               lstm_params=[12, 1, defs.fusion_method.avg])
    s = _settings({"enc": enc, "clf": clf}, ["enc", "clf"], [ds],
                  num_classes=4)
    model = Model(s)
    params = model.init_params(jax.random.PRNGKey(0))
    feed = {"enc_main_input":
            (rng.randint(0, 256, (4, 67, 67, 3)) - 117.0).astype(
                np.float32)}
    qparams = model.quantize_params(params)
    assert "wq" in qparams["enc"]["dcnn"]["conv2"]
    out_raw = np.asarray(model.apply(params, feed, train=False,
                                     quantize="int8"))
    out_pre = np.asarray(model.apply(qparams, feed, train=False,
                                     quantize="int8"))
    np.testing.assert_array_equal(out_raw, out_pre)


def test_int8_static_calibrated_scales():
    """Static-scale int8: apply_calib taps every int8-eligible layer
    input without changing the float output; quantize_params(act_ranges)
    bakes "xs" scales; the static forward tracks f32 on the calibration
    batch AND on a fresh batch (out-of-range activations saturate, they
    don't explode)."""
    rng = np.random.RandomState(0)
    fc6_in = alexnet.conv_output_flat_dim((67, 67, 3))
    p = alexnet.init(jax.random.PRNGKey(0), 10, "prob", fc6_in=fc6_in)
    x = jnp.asarray(rng.randint(0, 256, (4, 67, 67, 3)) - 117.0,
                    jnp.float32)
    out, taps = alexnet.apply_calib(p, x, "prob")
    assert sorted(taps) == ["conv2", "conv3", "conv4", "conv5",
                            "fc6", "fc7", "fc8"]
    ref = np.asarray(alexnet.apply(p, x, "prob"))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                               atol=1e-4)
    qp = alexnet.quantize_params(p, act_ranges=jax.device_get(taps))
    assert "xs" in qp["conv2"] and "xs" in qp["fc8"]
    assert "xs" not in alexnet.quantize_params(p)["conv2"]
    stat = np.asarray(alexnet.apply_int8(qp, x, "prob"))
    rel = np.linalg.norm(stat - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.08, "static int8 rel err %.4f" % rel
    assert (ref.argmax(-1) == stat.argmax(-1)).mean() >= 0.75
    # fresh batch through the SAME baked scales
    x2 = jnp.asarray(rng.randint(0, 256, (4, 67, 67, 3)) - 117.0,
                     jnp.float32)
    ref2 = np.asarray(alexnet.apply(p, x2, "prob"))
    stat2 = np.asarray(alexnet.apply_int8(qp, x2, "prob"))
    assert np.all(np.isfinite(stat2))
    rel2 = np.linalg.norm(stat2 - ref2) / (np.linalg.norm(ref2) + 1e-9)
    assert rel2 < 0.15, "static int8 fresh-batch rel err %.4f" % rel2


def test_pipeline_int8_static_calibration():
    """Model.apply(calib_taps=...) collects {pipeline: {layer: amax}}
    through the DAG, Model.quantize_params(act_ranges=...) bakes the
    static scales into the DCNN leaf, and the int8_static forward tracks
    the float DAG.  Calibration combined with a quantized forward is
    rejected (it must see float activations)."""
    import pytest
    from video_learning_tpu.models.pipeline import Model
    from video_learning_tpu.utils import FrameworkError
    from tests.test_pipeline_model import StubDataset, _net, _settings

    ds = StubDataset("main", (67, 67, 3), 1, 2)
    enc = _net(input=["main"], representation=defs.representation.dcnn,
               frame_encoding_layer="fc6")
    clf = _net(input=["enc"], representation=defs.representation.nop,
               classifier=defs.classifier.lstm,
               lstm_params=[12, 1, defs.fusion_method.avg])
    s = _settings({"enc": enc, "clf": clf}, ["enc", "clf"], [ds],
                  num_classes=4)
    model = Model(s)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    feed = {"enc_main_input":
            (rng.randint(0, 256, (4, 67, 67, 3)) - 117.0).astype(
                np.float32)}
    taps = {}
    ref = np.asarray(model.apply(params, feed, train=False,
                                 calib_taps=taps))
    assert "enc" in taps and "conv2" in taps["enc"]
    # the calibration pass IS the float forward
    plain = np.asarray(model.apply(params, feed, train=False))
    np.testing.assert_allclose(ref, plain, rtol=1e-4, atol=1e-4)
    qparams = model.quantize_params(params,
                                    act_ranges=jax.device_get(taps))
    assert "xs" in qparams["enc"]["dcnn"]["conv2"]
    q = np.asarray(model.apply(qparams, feed, train=False,
                               quantize="int8_static"))
    rel = np.linalg.norm(q - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.1, "pipeline static int8 rel err %.4f" % rel
    with pytest.raises(FrameworkError, match="calibration"):
        model.apply(params, feed, train=False, quantize="int8",
                    calib_taps={})


def test_max_pool_valid():
    x = jnp.arange(2 * 7 * 7 * 1, dtype=jnp.float32).reshape(2, 7, 7, 1)
    y = max_pool(x, (3, 3), (2, 2), "VALID")
    assert y.shape == (2, 3, 3, 1)
    assert float(y[0, 0, 0, 0]) == float(jnp.max(x[0, :3, :3, 0]))


# ---------------------------------------------------------------- audionet
def test_audionet_shapes():
    params = audionet.init(jax.random.PRNGKey(0), (64, 48, 3), 7)
    out = audionet.apply(params, jnp.zeros((4, 64, 48, 3)))
    assert out.shape == (4, 7)
    reg, mod = audionet.param_groups(params)
    assert reg == [] and len(mod) == 4


# ------------------------------------------------------------------ fusion
def test_temporal_fusion_methods():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 3))
    last = fusion.apply_temporal_fusion(x, 3, 4, defs.fusion_method.last)
    assert np.allclose(last, x[:, -1, :])
    avg = fusion.apply_temporal_fusion(x, 3, 4, defs.fusion_method.avg)
    assert np.allclose(avg, np.mean(np.array(x), axis=1))
    rs = fusion.apply_temporal_fusion(x, 3, 4, defs.fusion_method.reshape)
    assert rs.shape == (8, 3)


def test_aggregate_clip_vectors():
    x = jnp.arange(24, dtype=jnp.float32).reshape(8, 3)  # 2 clips x 4 fpc
    out = fusion.aggregate_clip_vectors(x, 3, 4, defs.fusion_method.avg)
    assert out.shape == (2, 3)
    assert np.allclose(out[0], np.mean(np.arange(12).reshape(4, 3), axis=0))


def test_input_fusion_ibias():
    main = jnp.ones((2 * 4, 3))       # 2 clips, fpc 4, dim 3
    aux = jnp.zeros((2, 3))           # one aux vector per clip
    out, dim, fpc, cpv = fusion.apply_tensor_list_fusion(
        [main, aux], defs.fusion_method.ibias, [3, 3], [4, 1], [1, 1])
    assert out.shape == (2 * 5, 3)    # fpc 4 + 1 bias step
    assert fpc == 5
    out5 = np.array(out).reshape(2, 5, 3)
    assert np.allclose(out5[:, 0, :], 0.0)   # aux first
    assert np.allclose(out5[:, 1:, :], 1.0)


def test_input_fusion_avg_max_concat():
    a = jnp.ones((4, 3))
    b = jnp.full((4, 3), 3.0)
    avg, dim, _, _ = fusion.apply_tensor_list_fusion(
        [a, b], defs.fusion_method.avg, [3, 3], [1, 1], [1, 1])
    assert np.allclose(avg, 2.0)
    mx, _, _, _ = fusion.apply_tensor_list_fusion(
        [a, b], defs.fusion_method.maximum, [3, 3], [1, 1], [1, 1])
    assert np.allclose(mx, 3.0)
    cat, dim, _, _ = fusion.apply_tensor_list_fusion(
        [a, b], defs.fusion_method.concat, [3, 3], [1, 1], [1, 1])
    assert cat.shape == (4, 6) and dim == 6


def test_replicate_auxiliary():
    aux = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    out = fusion.replicate_auxiliary_tensor(aux, 2, 4, 2)
    assert out.shape == (4, 2)
    assert np.allclose(out[:2], aux) and np.allclose(out[2:], aux)


def test_conv1_space_to_depth_matches_direct():
    """The space-to-depth conv1 lowering must be numerically identical to
    the direct 11x11-stride-4 SAME conv (same params, fwd and grad), at
    the canonical 227 and at an odd non-227 size."""
    import jax
    import jax.numpy as jnp
    from video_learning_tpu.models import alexnet
    from video_learning_tpu.models.layers import conv_apply

    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(11, 11, 3, 96) * 0.05,
                               jnp.float32),
              "b": jnp.asarray(rng.randn(96) * 0.1, jnp.float32)}
    for hw in (227, 113):
        x = jnp.asarray(rng.randn(2, hw, hw, 3), jnp.float32)
        direct = conv_apply(params, x, (4, 4), "SAME", groups=1,
                            relu=True)
        s2d = alexnet._conv1_space_to_depth(params, x, None)
        assert s2d.shape == direct.shape, (s2d.shape, direct.shape)
        assert np.allclose(s2d, direct, atol=1e-4), \
            np.abs(np.asarray(s2d) - np.asarray(direct)).max()

        def loss_direct(p):
            return jnp.sum(conv_apply(p, x, (4, 4), "SAME", groups=1,
                                      relu=True) ** 2)

        def loss_s2d(p):
            return jnp.sum(alexnet._conv1_space_to_depth(p, x, None) ** 2)

        gd = jax.grad(loss_direct)(params)
        gs = jax.grad(loss_s2d)(params)
        assert np.allclose(gd["w"], gs["w"], atol=1e-2 * float(
            np.abs(gd["w"]).max()))
        assert np.allclose(gd["b"], gs["b"], atol=1e-2 * float(
            np.abs(gd["b"]).max()))


def test_conv1_pallas_dw_path_matches_direct():
    """The custom-VJP conv1 (XLA fwd + Pallas dL/dw) must match the plain
    conv_apply path in both output and parameter gradients."""
    import jax
    import jax.numpy as jnp
    from video_learning_tpu.models import alexnet
    from video_learning_tpu.models.layers import conv_apply

    rng = np.random.RandomState(1)
    params = {"w": jnp.asarray(rng.randn(11, 11, 3, 96) * 0.05,
                               jnp.float32),
              "b": jnp.asarray(rng.randn(96) * 0.1, jnp.float32)}
    x = jnp.asarray(rng.randn(2, 67, 67, 3), jnp.float32)

    direct = conv_apply(params, x, (4, 4), "SAME", groups=1, relu=True)
    fused = alexnet._conv1_pallas_dw(params, x, None)
    assert np.allclose(fused, direct, atol=1e-4)

    def loss_direct(p, xx):
        return jnp.sum(conv_apply(p, xx, (4, 4), "SAME", groups=1,
                                  relu=True) ** 2)

    def loss_fused(p, xx):
        return jnp.sum(alexnet._conv1_pallas_dw(p, xx, None) ** 2)

    gd = jax.grad(loss_direct)(params, x)
    gf = jax.grad(loss_fused)(params, x)
    for k in ("w", "b"):
        scale = float(np.abs(gd[k]).max())
        assert np.allclose(gd[k], gf[k], atol=1e-3 * scale), k
    # input grads too (the XLA-VJP branch of the custom rule)
    gxd = jax.grad(loss_direct, argnums=1)(params, x)
    gxf = jax.grad(loss_fused, argnums=1)(params, x)
    assert np.allclose(gxd, gxf, atol=1e-3 * float(np.abs(gxd).max()))


def test_alexnet_pretrained_npy_import(tmp_path):
    """Drive the bvlc .npy import end to end: matching layers load
    verbatim, a deliberately mismatched fc6 falls back to fresh init, and
    fc8 is always fresh at the configured class count (reference
    models/alexnet/alexnet.py:49-51,273-280)."""
    import jax
    import jax.numpy as jnp
    from video_learning_tpu.models import alexnet

    rng = np.random.RandomState(0)
    # shapes derived from the model's own spec table so the fixture can
    # never go stale against it
    specs = {name: spec[:4] for name, spec in alexnet._CONV_SPECS.items()}
    net_data = {name: [rng.randn(*shp).astype(np.float32) * 0.05,
                       rng.randn(shp[-1]).astype(np.float32) * 0.1]
                for name, shp in specs.items()}
    # bvlc assumes 227x227 (fc6 9216x4096); make it deliberately wrong so
    # the shape-mismatch fallback must trigger for the 67x67 input below
    net_data["fc6"] = [rng.randn(9216, 4096).astype(np.float32) * 0.01,
                       np.zeros(4096, np.float32)]
    net_data["fc7"] = [rng.randn(4096, 4096).astype(np.float32) * 0.01,
                      np.zeros(4096, np.float32)]
    wfile = tmp_path / "bvlc_alexnet.npy"
    np.save(wfile, np.asarray(net_data, dtype=object), allow_pickle=True)

    fc6_in = alexnet.conv_output_flat_dim((67, 67, 3))
    assert fc6_in != 9216
    params = alexnet.init(jax.random.PRNGKey(0), num_classes=5,
                          final_layer="prob", weights_file=str(wfile),
                          fc6_in=fc6_in)
    # conv + fc7 weights come from the npy verbatim
    for name in specs:
        assert np.array_equal(np.asarray(params[name]["w"]),
                              net_data[name][0]), name
        assert np.array_equal(np.asarray(params[name]["b"]),
                              net_data[name][1]), name
    assert np.array_equal(np.asarray(params["fc7"]["w"]),
                          net_data["fc7"][0])
    # mismatched fc6 was re-initialized at the required fan-in
    assert params["fc6"]["w"].shape == (fc6_in, 4096)
    assert not np.allclose(np.asarray(params["fc6"]["w"])[:10, :10],
                           net_data["fc6"][0][:10, :10])
    # fc8 fresh at the configured class count
    assert params["fc8"]["w"].shape == (4096, 5)

    # forward runs with the imported tree
    x = jnp.asarray(rng.randn(2, 67, 67, 3), jnp.float32)
    out = alexnet.apply(params, x, "prob")
    assert out.shape == (2, 5)
    # two-tier groups unchanged by the import path
    reg, mod = alexnet.param_groups(params)
    assert "fc8" in mod and "conv1" in reg and "fc6" in reg

    # missing file errors at the mechanism
    from video_learning_tpu.utils import FrameworkError
    with pytest.raises(FrameworkError):
        alexnet.init(jax.random.PRNGKey(0), 5,
                     weights_file=str(tmp_path / "nope.npy"))


def test_pipeline_dcnn_weights_file(tmp_path):
    """weights_file flows from the pipeline config into the DCNN
    vectorizer (reference model.py:84-90 load_str path)."""
    import jax
    from video_learning_tpu.models import alexnet, vectorizer

    rng = np.random.RandomState(1)
    net_data = {"conv1": [rng.randn(11, 11, 3, 96).astype(np.float32),
                          rng.randn(96).astype(np.float32)]}
    wfile = tmp_path / "w.npy"
    np.save(wfile, np.asarray(net_data, dtype=object), allow_pickle=True)
    vec = vectorizer.DCNN(num_classes=4, frame_encoding_layer="fc6",
                          weights_file=str(wfile))
    params = vec.init(jax.random.PRNGKey(0), (67, 67, 3))
    assert np.array_equal(np.asarray(params["conv1"]["w"]),
                          net_data["conv1"][0])


def _full_bvlc_npy(tmp_path, seed=0, name="bvlc_alexnet.npy"):
    """Synthesize a COMPLETE bvlc-schema npy (all 8 layers, exact shapes)
    for driving tools/validate_pretrained without the real asset."""
    from video_learning_tpu.tools.validate_pretrained import BVLC_SHAPES
    rng = np.random.RandomState(seed)
    net_data = {layer: [rng.randn(*w).astype(np.float32) * 0.01,
                        rng.randn(*b).astype(np.float32) * 0.1]
                for layer, (w, b) in BVLC_SHAPES.items()}
    wfile = tmp_path / name
    np.save(wfile, np.asarray(net_data, dtype=object), allow_pickle=True)
    return wfile


def test_bvlc_sidecar_checksum(tmp_path):
    """load_bvlc_weights verifies a .sha256 sidecar when present: correct
    digest loads, stale digest raises FrameworkError."""
    import hashlib

    from video_learning_tpu.models import alexnet
    from video_learning_tpu.utils import FrameworkError

    wfile = _full_bvlc_npy(tmp_path)
    digest = hashlib.sha256(wfile.read_bytes()).hexdigest()
    (tmp_path / "bvlc_alexnet.npy.sha256").write_text(digest + "\n")
    assert "conv1" in alexnet.load_bvlc_weights(str(wfile))
    # swap the asset under the sidecar -> loud failure
    _full_bvlc_npy(tmp_path, seed=1)
    with pytest.raises(FrameworkError, match="sha256"):
        alexnet.load_bvlc_weights(str(wfile))


def test_validate_pretrained_tool(tmp_path):
    """The offline validation CLI: schema pass, deterministic feature
    fingerprint, manifest trust-on-first-use then mismatch detection."""
    from video_learning_tpu.tools import validate_pretrained as vp

    wfile = _full_bvlc_npy(tmp_path)
    assert vp.main([str(wfile)]) == 0                  # records manifest
    assert (tmp_path / "bvlc_alexnet.npy.manifest.json").exists()
    assert (tmp_path / "bvlc_alexnet.npy.sha256").exists()
    assert vp.main([str(wfile)]) == 0                  # matches manifest
    # fingerprints are deterministic across runs
    fp1 = vp.feature_fingerprint(str(wfile))
    fp2 = vp.feature_fingerprint(str(wfile))
    assert fp1 == fp2
    # a different asset against the same manifest fails
    wfile2 = _full_bvlc_npy(tmp_path, seed=2, name="bvlc_other.npy")
    assert vp.main([str(wfile2), "--manifest",
                    str(tmp_path / "bvlc_alexnet.npy.manifest.json"),
                    "--no-sidecar"]) == 1
    # schema failure is reported
    bad = dict(np.load(wfile, allow_pickle=True).item())
    bad.pop("conv3")
    np.save(tmp_path / "bad.npy", np.asarray(bad, dtype=object),
            allow_pickle=True)
    assert vp.main([str(tmp_path / "bad.npy")]) == 1


@pytest.mark.skipif(not os.environ.get("VLT_BVLC_NPY"),
                    reason="set VLT_BVLC_NPY=/path/to/bvlc_alexnet.npy "
                           "to validate the real pretrained asset")
def test_real_bvlc_weights_validation():
    """Offline-only: runs the full validation (schema + fingerprint +
    manifest) against the REAL downloaded bvlc_alexnet.npy."""
    from video_learning_tpu.tools import validate_pretrained as vp

    path = os.environ["VLT_BVLC_NPY"]
    assert vp.main([path]) == 0
    assert vp.main([path]) == 0   # second run compares the manifest
