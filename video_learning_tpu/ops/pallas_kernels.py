"""Pallas TPU kernels for the hot ops.

Kernels backing the compute path's innermost loops:

* ``lrn``        — AlexNet local response normalization as one VMEM pass
  per tile with the channel-window sum-of-squares expressed as a
  banded-matrix matmul on the MXU (band is the CxC 0/1 matrix with ones
  where ``|i-j| <= r``), the ``d**-beta`` epilogue via rsqrt/sqrt
  hardware ops, and a custom-VJP backward kernel that RECOMPUTES the
  denominator in-VMEM instead of saving it:
  ``dx = g*p - 2*alpha*beta * x * ((g*x*p/d) @ band)`` (band is
  symmetric).  Measured on v5e this kernel does NOT beat the same
  formulation written as plain XLA ops (models/layers._lrn_xla): the
  AlexNet channel counts (96/256) are below the 128-lane width, so the
  pre-kernel reshape to (rows, C) forces an HBM relayout XLA absorbs
  into its fusions but a pallas_call boundary cannot (measured at the
  conv1 site, 2048 bf16 55x55x96 frames on v5e: 17.8 vs 11.6 ms fwd,
  22.8 vs 17.8 ms fwd+bwd), and a pallas_call also blocks XLA from
  fusing the square into the preceding conv epilogue.
  Kept as a tested experimental path (the win vs the OLD sliding-slice
  XLA formulation was real; the band-matmul XLA rewrite captured it
  without the kernel boundary — BASELINE.md has the ladder).

* ``lstm_step``  — one fused LSTM cell step: gates = xproj + h @ Wh + b on
  the MXU, then the i/j/f/o nonlinearities and state update on the VPU
  without HBM round-trips between them.  NOT wired into models/lstm.py:
  XLA's fused scan body measured faster on v5e, so this kernel is kept as
  a tested building block for custom integrations only.

Enablement (LRN): opt-in via ``VLT_USE_PALLAS=1`` (the XLA band-matmul
formulation measured faster and is the default).  On non-TPU backends
the kernels run in interpret mode only under tests — production CPU
falls back to the XLA implementations.  See
/opt/skills/guides/pallas_guide.md for the kernel language rules
followed here (grid/BlockSpec tiling, VMEM residency, no 1-D iota, f32
MXU accumulation).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ENABLED = os.environ.get("VLT_USE_PALLAS", "0") == "1"


def set_enabled(value):
    global _ENABLED
    _ENABLED = bool(value)


def enabled():
    if not _ENABLED:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------- LRN
def band_matrix(channels, radius, dtype=jnp.float32):
    """The CxC banded 0/1 matrix that turns the LRN channel-window sum
    into a matmul: (sq @ band)[..., c] = sum_{|k-c|<=r} sq[..., k].

    Returned as HOST numpy, never a device array: a device array created
    at trace time is embedded in the lowered module via a device->host
    readback, which (a) is wasted work everywhere and (b) stalls
    indefinitely over this image's tunnelled-TPU transport.  A numpy
    constant lowers from host memory directly."""
    idx = np.arange(channels)
    m = (np.abs(idx[:, None] - idx[None, :]) <= radius)
    return m.astype(jnp.dtype(dtype))  # ml_dtypes handles bf16 in numpy


def _pow_neg_beta(d, beta):
    """d**-beta on the VPU.  beta=0.75 (the AlexNet/TF default) uses the
    rsqrt/sqrt hardware ops (d**-0.75 == rsqrt(d) * sqrt(rsqrt(d)));
    generic beta falls back to the transcendental pow."""
    if beta == 0.75:
        r = jax.lax.rsqrt(d)
        return r * jnp.sqrt(r)
    if beta == 0.5:
        return jax.lax.rsqrt(d)
    return jnp.power(d, -beta)


def _lrn_fwd_kernel(x_ref, band_ref, o_ref, *, bias, alpha, beta):
    x = x_ref[:]
    sq = (x * x).astype(band_ref.dtype)
    acc = jnp.dot(sq, band_ref[:], preferred_element_type=jnp.float32)
    p = _pow_neg_beta(bias + alpha * acc, beta)
    o_ref[:] = x * p.astype(x.dtype)


def _lrn_bwd_kernel(x_ref, g_ref, band_ref, dx_ref, *, bias, alpha, beta):
    x = x_ref[:]
    g = g_ref[:]
    sq = (x * x).astype(band_ref.dtype)
    d = bias + alpha * jnp.dot(sq, band_ref[:],
                               preferred_element_type=jnp.float32)
    p = _pow_neg_beta(d, beta)
    gf = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    inner = (gf * xf * (p / d)).astype(band_ref.dtype)
    s = jnp.dot(inner, band_ref[:], preferred_element_type=jnp.float32)
    dx = gf * p - (2.0 * alpha * beta) * xf * s
    dx_ref[:] = dx.astype(x.dtype)


def _tile_call(kernel, arrays, channels, out_dtype, block_rows, interpret):
    """Run a row-blocked (R, C) kernel over flattened pixel rows; the band
    matrix rides along as a block-invariant VMEM operand."""
    flat = [a.reshape(-1, channels) for a in arrays[:-1]]
    band = arrays[-1]
    rows = flat[0].shape[0]
    pad_rows = (-rows) % block_rows
    if pad_rows:
        flat = [jnp.pad(a, ((0, pad_rows), (0, 0))) for a in flat]
    grid = flat[0].shape[0] // block_rows
    in_specs = [pl.BlockSpec((block_rows, channels), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)] * len(flat)
    in_specs.append(pl.BlockSpec((channels, channels), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, channels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat[0].shape, out_dtype),
        interpret=interpret,
    )(*flat, band)
    if pad_rows:
        out = out[:rows]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def lrn(x, depth_radius=2, bias=1.0, alpha=2e-5, beta=0.75,
        block_rows=1024, interpret=False):
    """Fused LRN over the trailing channel axis of an NHWC tensor,
    matching tf.nn.local_response_normalization semantics
    (reference models/alexnet/alexnet.py:85-89)."""
    channels = x.shape[-1]
    band = band_matrix(channels, depth_radius, x.dtype)
    kernel = functools.partial(_lrn_fwd_kernel, bias=bias, alpha=alpha,
                               beta=beta)
    out = _tile_call(kernel, [x, band], channels, x.dtype, block_rows,
                     interpret)
    return out.reshape(x.shape)


def _lrn_vjp_fwd(x, depth_radius, bias, alpha, beta, block_rows, interpret):
    out = lrn(x, depth_radius, bias, alpha, beta, block_rows, interpret)
    return out, x


def _lrn_vjp_bwd(depth_radius, bias, alpha, beta, block_rows, interpret,
                 x, g):
    channels = x.shape[-1]
    band = band_matrix(channels, depth_radius, x.dtype)
    kernel = functools.partial(_lrn_bwd_kernel, bias=bias, alpha=alpha,
                               beta=beta)
    dx = _tile_call(kernel, [x, g, band], channels, x.dtype, block_rows,
                    interpret)
    return (dx.reshape(x.shape),)


lrn.defvjp(_lrn_vjp_fwd, _lrn_vjp_bwd)


# ---------------------------------------------------------------- LSTM step
def _lstm_step_kernel(xproj_ref, h_ref, c_ref, wh_ref, b_ref,
                      h_out_ref, c_out_ref, *, hidden):
    xproj = xproj_ref[:]
    h = h_ref[:]
    c = c_ref[:]
    gates = xproj + jnp.dot(h, wh_ref[:],
                            preferred_element_type=jnp.float32) + b_ref[:]
    i = gates[:, 0 * hidden:1 * hidden]
    j = gates[:, 1 * hidden:2 * hidden]
    f = gates[:, 2 * hidden:3 * hidden]
    o = gates[:, 3 * hidden:4 * hidden]
    new_c = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    c_out_ref[:] = new_c
    h_out_ref[:] = new_h


def lstm_step(xproj, h, c, wh, b, interpret=False):
    """One fused BasicLSTMCell step.

    xproj: (B, 4H) precomputed input projection; h/c: (B, H); wh: (H, 4H);
    b: (4H,).  Returns (new_h, new_c)."""
    B, four_h = xproj.shape
    hidden = four_h // 4
    kernel = functools.partial(_lstm_step_kernel, hidden=hidden)
    h_out, c_out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((B, hidden), jnp.float32)),
        interpret=interpret,
    )(xproj.astype(jnp.float32), h.astype(jnp.float32),
      c.astype(jnp.float32), wh.astype(jnp.float32),
      b.reshape(1, -1).astype(jnp.float32))
    return h_out, c_out
