"""Interpret-mode correctness tests for the Pallas kernels vs the XLA
reference implementations (runs on CPU; compiled-mode validation happens on
real TPU via the bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_learning_tpu.models.layers import local_response_normalization
from video_learning_tpu.ops import pallas_kernels as pk


def _lrn_sliding_reference(x, r=2, bias=1.0, alpha=2e-5, beta=0.75):
    """The textbook sliding-window formulation (tf.nn.lrn semantics),
    kept here as the independent golden for both production paths."""
    sq = jnp.square(x)
    sq = jnp.pad(sq, [(0, 0)] * (x.ndim - 1) + [(r, r)])
    c = x.shape[-1]
    acc = sq[..., 0:c]
    for i in range(1, 2 * r + 1):
        acc = acc + sq[..., i:i + c]
    return x / jnp.power(bias + alpha * acc, beta)


def test_lrn_kernel_matches_reference():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 7, 7, 96),
                    jnp.float32)
    ref = _lrn_sliding_reference(x)
    out = pk.lrn(x, block_rows=64, interpret=True)
    assert np.allclose(out, ref, atol=1e-5)
    # the XLA band-matmul production path against the same golden
    assert np.allclose(local_response_normalization(x), ref, atol=1e-5)


def test_lrn_kernel_ragged_rows():
    # rows not divisible by the block: padding path
    x = jnp.asarray(np.random.RandomState(1).randn(3, 5, 5, 32),
                    jnp.float32)
    ref = _lrn_sliding_reference(x)
    out = pk.lrn(x, block_rows=64, interpret=True)
    assert np.allclose(out, ref, atol=1e-5)


def test_lrn_custom_vjp_matches_autodiff():
    """Both production LRN backward passes (the closed-form custom VJPs)
    against autodiff through the sliding-window formulation."""
    x = jnp.asarray(np.random.RandomState(2).randn(2, 5, 5, 96),
                    jnp.float32)
    g_ref = jax.grad(lambda y: jnp.sum(_lrn_sliding_reference(y)))(x)
    g_xla = jax.grad(lambda y: jnp.sum(local_response_normalization(y)))(x)
    g_pal = jax.grad(
        lambda y: jnp.sum(pk.lrn(y, block_rows=64, interpret=True)))(x)
    assert np.allclose(g_xla, g_ref, atol=1e-5)
    assert np.allclose(g_pal, g_ref, atol=1e-5)


def test_lstm_step_kernel_matches_cell():
    from video_learning_tpu.models.lstm import _cell_step
    rng = np.random.RandomState(0)
    B, H = 4, 16
    xproj = jnp.asarray(rng.randn(B, 4 * H), jnp.float32)
    h = jnp.asarray(rng.randn(B, H), jnp.float32)
    c = jnp.asarray(rng.randn(B, H), jnp.float32)
    wh = jnp.asarray(rng.randn(H, 4 * H), jnp.float32)
    b = jnp.asarray(rng.randn(4 * H), jnp.float32)
    ref_h, ref_c = _cell_step(wh, b, xproj, h, c)
    out_h, out_c = pk.lstm_step(xproj, h, c, wh, b, interpret=True)
    assert np.allclose(out_h, ref_h, atol=1e-5)
    assert np.allclose(out_c, ref_c, atol=1e-5)


def test_enable_flag_respects_platform():
    pk.set_enabled(True)
    try:
        # tests force the CPU platform; kernels must stay disabled there
        assert pk.enabled() is False
    finally:
        pk.set_enabled(False)


def test_conv1_dw_kernel_matches_autodiff():
    """The Pallas stem-conv weight-grad kernel against autodiff through
    the direct 11x11-stride-4 SAME conv."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 39, 43, 3), jnp.float32)
    w = jnp.asarray(rng.randn(11, 11, 3, 96) * 0.05, jnp.float32)
    gout_shape = (3, -(-39 // 4), -(-43 // 4), 96)
    gout = jnp.asarray(rng.randn(*gout_shape), jnp.float32)

    def conv(w):
        return jax.lax.conv_general_dilated(
            x, w, (4, 4), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ref = jax.grad(lambda w: jnp.sum(conv(w) * gout))(w)
    got = pk.conv1_dw(x, gout, block_images=2, interpret=True)
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=1e-3 * float(np.abs(ref).max())), \
        np.abs(np.asarray(got) - np.asarray(ref)).max()


@pytest.mark.parametrize("shape,block_rows", [
    ((3, 39, 43, 3), 64),     # multi-block + row padding path
    ((2, 45, 37, 3), 4096),   # single block (k < block_rows)
])
def test_conv1_dw_shifted_matches_autodiff(shape, block_rows):
    """The row-shifted-matmul Pallas weight-grad kernel against autodiff
    through the direct 11x11-stride-4 SAME conv."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    w = jnp.asarray(rng.randn(11, 11, 3, 96) * 0.05, jnp.float32)
    gout = jnp.asarray(
        rng.randn(shape[0], -(-shape[1] // 4), -(-shape[2] // 4), 96),
        jnp.float32)

    def conv(w):
        return jax.lax.conv_general_dilated(
            x, w, (4, 4), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ref = jax.grad(lambda w: jnp.sum(conv(w) * gout))(w)
    got = pk.conv1_dw_shifted(x, gout, block_rows=block_rows,
                              interpret=True)
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=1e-3 * float(np.abs(ref).max())), \
        np.abs(np.asarray(got) - np.asarray(ref)).max()


def test_conv1_dw_xla_matches_autodiff():
    """The im2col+matmul XLA formulation of the stem-conv weight grad
    (the production path on TPU) against autodiff."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(3, 45, 37, 3), jnp.float32)
    w = jnp.asarray(rng.randn(11, 11, 3, 96) * 0.05, jnp.float32)
    gout = jnp.asarray(rng.randn(3, -(-45 // 4), -(-37 // 4), 96),
                       jnp.float32)

    def conv(w):
        return jax.lax.conv_general_dilated(
            x, w, (4, 4), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ref = jax.grad(lambda w: jnp.sum(conv(w) * gout))(w)
    got = pk.conv1_dw_xla(x, gout, chunk=2)  # chunk < n: loop + pad path
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=1e-3 * float(np.abs(ref).max())), \
        np.abs(np.asarray(got) - np.asarray(ref)).max()
