"""Pallas TPU kernels for the hot ops.

Two kernels back the compute path's innermost loops:

* ``lrn``        — AlexNet local response normalization fused into a single
  VMEM pass (square -> sliding channel-window sum -> pow -> divide), vs the
  XLA fallback's pad + (2r+1) adds (models/layers.py).  One grid row per
  block of flattened pixels; the channel axis lives on the VPU lanes.

* ``lstm_step``  — one fused LSTM cell step: gates = xproj + h @ Wh + b on
  the MXU, then the i/j/f/o nonlinearities and state update on the VPU
  without HBM round-trips between them.  NOT wired into models/lstm.py:
  XLA's fused scan body measured faster on v5e, so this kernel is kept as
  a tested building block for custom integrations only.

Enablement (LRN only): ``VLT_USE_PALLAS=1`` in the environment or calling
``set_enabled(True)``; note the XLA LRN also measured slightly faster on
v5e (BASELINE.md), so the flag exists for experimentation; on non-TPU backends the kernels run in interpret
mode only under tests — production CPU falls back to the XLA
implementations.  See /opt/skills/guides/pallas_guide.md for the kernel
language rules followed here (grid/BlockSpec tiling, VMEM residency,
no 1-D iota, f32 MXU accumulation).
"""

import functools
import os

import jax
import jax.numpy as jnp
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
def _lrn_kernel(x_ref, o_ref, *, radius, bias, alpha, beta, channels):
    x = x_ref[:]
    sq = x * x
    acc = sq
    # sliding window over channels via lane shifts; channels is static so
    # this unrolls into 2*radius adds on VMEM-resident data
    for off in range(1, radius + 1):
        right = jnp.pad(sq[:, off:], ((0, 0), (0, off)))
        left = jnp.pad(sq[:, :channels - off], ((0, 0), (off, 0)))
        acc = acc + right + left
    o_ref[:] = x / jnp.power(bias + alpha * acc, beta)


def lrn(x, depth_radius=2, bias=1.0, alpha=2e-5, beta=0.75,
        block_rows=512, interpret=False):
    """Fused LRN over the trailing channel axis of an NHWC tensor."""
    orig_shape = x.shape
    channels = orig_shape[-1]
    flat = x.reshape(-1, channels)
    rows = flat.shape[0]
    pad_rows = (-rows) % block_rows
    if pad_rows:
        flat = jnp.pad(flat, ((0, pad_rows), (0, 0)))
    grid = flat.shape[0] // block_rows
    kernel = functools.partial(_lrn_kernel, radius=depth_radius, bias=bias,
                               alpha=alpha, beta=beta, channels=channels)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((block_rows, channels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, channels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
        interpret=interpret,
    )(flat)
    if pad_rows:
        out = out[:rows]
    return out.reshape(orig_shape)


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
