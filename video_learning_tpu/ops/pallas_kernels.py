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


def on_tpu():
    """True when the default backend compiles for TPU hardware (the
    tunnelled 'axon' platform in this image is TPU-backed)."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def enabled():
    if not _ENABLED:
        return False
    return on_tpu()


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


# ------------------------------------------------------ conv1 weight grad
# The AlexNet stem conv's dL/dw is the per-layer ablation's single
# largest cost (BASELINE.md: conv1 fwd+dL/dw 49.6 ms of the 140 ms stack
# at 2048 frames): as XLA lowers it, the (11*11*3, positions) x
# (positions, 96) contraction is skinny on both non-contracted dims and
# runs far below the MXU's matmul bound.  This kernel computes the same
# gradient in the space-to-depth domain (block 4 = the stride, so the
# kernel becomes 3x3 taps over 48 channels — see
# models/alexnet._conv1_space_to_depth): per grid step it holds a block
# of images' rearranged pixels and output-grads in VMEM and accumulates
# nine (48, K) x (K, 96) tap-contractions into a resident (432, 96) f32
# accumulator, reading each operand from HBM exactly once.

_C1_TAPS = 3          # ceil(11 / 4) s2d taps per axis
_C1_BLK = 4           # s2d block = conv stride


def _conv1_dw_kernel(xp_ref, g_ref, out_ref, *, out_hw, cin_s2d, cout):
    oh, ow = out_hw
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xp = xp_ref[:]          # (B, oh + 2, ow + 2, 48)
    g = g_ref[:]            # (B, oh, ow, 96)
    b = g.shape[0]
    gmat = g.reshape(b * oh * ow, cout)
    for ky in range(_C1_TAPS):
        for kx in range(_C1_TAPS):
            patch = xp[:, ky:ky + oh, kx:kx + ow, :] \
                .reshape(b * oh * ow, cin_s2d)
            acc = jax.lax.dot_general(
                patch, gmat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (48, 96)
            row = (ky * _C1_TAPS + kx) * cin_s2d
            out_ref[row:row + cin_s2d, :] += acc


def conv1_dw(x, gout, block_images=8, interpret=False):
    """dL/dw for the 11x11-stride-4 SAME stem conv, via Pallas.

    x: (N, H, W, 3) input frames (any dtype; contraction runs in the
    input dtype with f32 accumulation); gout: (N, OH, OW, 96) the
    gradient w.r.t. the conv output (pre-bias).  Returns (11, 11, 3, 96)
    float32 — identical to the autodiff gradient of the direct conv
    (tests/test_pallas_kernels.py)."""
    n, h, w, c = x.shape
    oh, ow = gout.shape[1], gout.shape[2]
    cout = gout.shape[-1]
    cin_s2d = _C1_BLK * _C1_BLK * c
    xp = _conv1_s2d_geometry(x, oh, ow)

    pad_n = (-n) % block_images
    if pad_n:
        # zero images contribute zero gradient
        xp = jnp.pad(xp, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
        gout = jnp.pad(gout, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
    grid = xp.shape[0] // block_images

    kernel = functools.partial(_conv1_dw_kernel, out_hw=(oh, ow),
                               cin_s2d=cin_s2d, cout=cout)
    dw_s2d = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_images, oh + _C1_TAPS - 1,
                          ow + _C1_TAPS - 1, cin_s2d),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_images, oh, ow, cout),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_C1_TAPS * _C1_TAPS * cin_s2d, cout),
                               lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (_C1_TAPS * _C1_TAPS * cin_s2d, cout), jnp.float32),
        interpret=interpret,
    )(xp, gout.astype(xp.dtype))
    return _conv1_dw_s2d_to_hwio(dw_s2d, c, cout)


def _conv1_s2d_geometry(x, oh, ow):
    """Space-to-depth rearrange of stem-conv input frames for the
    weight-grad kernels: (N, H, W, C) -> (N, oh+2, ow+2, 16*C) with the
    SAME-pad geometry of the 11x11-stride-4 conv (block 4 = stride, 3
    taps per axis; see models/alexnet._conv1_space_to_depth)."""
    n, h, w, c = x.shape
    pad_h = max((oh - 1) * _C1_BLK + 11 - h, 0)
    pad_w = max((ow - 1) * _C1_BLK + 11 - w, 0)
    plh, plw = pad_h // 2, pad_w // 2
    eh = (-(h + pad_h)) % _C1_BLK
    ew = (-(w + pad_w)) % _C1_BLK
    xp = jnp.pad(x, ((0, 0), (plh, pad_h - plh + eh),
                     (plw, pad_w - plw + ew), (0, 0)))
    bh, bw = xp.shape[1] // _C1_BLK, xp.shape[2] // _C1_BLK
    cin_s2d = _C1_BLK * _C1_BLK * c
    xp = xp.reshape(n, bh, _C1_BLK, bw, _C1_BLK, c) \
           .transpose(0, 1, 3, 2, 4, 5).reshape(n, bh, bw, cin_s2d)
    # the taps only read blocks [0, oh + 2); drop any extra-pad block row
    return xp[:, :oh + _C1_TAPS - 1, :ow + _C1_TAPS - 1, :]


def _conv1_dw_s2d_to_hwio(dw_s2d, c, cout):
    """Map the (taps*16C, cout) s2d weight grad back to (11, 11, C, cout):
    row index is (ky*3 + kx)*16C + (di*4 + dj)*C + cin; tap row/col 11
    (the zero pad) drops."""
    dw = dw_s2d.reshape(_C1_TAPS, _C1_TAPS, _C1_BLK, _C1_BLK, c, cout)
    dw = dw.transpose(0, 2, 1, 3, 4, 5).reshape(
        _C1_TAPS * _C1_BLK, _C1_TAPS * _C1_BLK, c, cout)
    return dw[:11, :11]


def _conv1_dw_shift_kernel(xm_ref, xh_ref, g_ref, out_ref, *, offs,
                           cin_s2d, rows):
    """Per grid step: 9 tap-contractions as row-shifted matmuls.

    Every operand stays 2-D end to end (the flatten to (positions,
    channels) happened outside the kernel in XLA) and every slice below
    has static offsets, so no Mosaic shape cast is ever needed — this is
    the restructuring that un-blocks the compiler rejection recorded for
    conv1_dw (BASELINE.md round-2 table).  For tap offset ``off`` the
    contraction pairs X rows [i*R + off, (i+1)*R + off) with G rows
    [i*R, (i+1)*R); the first R - off rows come from this block's X
    (``xm``), the last ``off`` rows from the next block's head (``xh``,
    a small pre-gathered side array)."""
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xm = xm_ref[:]          # (R, cin_s2d)
    xh = xh_ref[:]          # (HEAD >= max(offs), cin_s2d)
    g = g_ref[:]            # (R, cout)
    for t, off in enumerate(offs):
        if off == 0:
            acc = jax.lax.dot_general(
                xm, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc = jax.lax.dot_general(
                xm[off:, :], g[:rows - off, :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc + jax.lax.dot_general(
                xh[:off, :], g[rows - off:, :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[t * cin_s2d:(t + 1) * cin_s2d, :] += acc


def conv1_dw_shifted(x, gout, block_rows=4096, interpret=False):
    """dL/dw for the 11x11-stride-4 SAME stem conv as nine row-shifted
    MXU matmuls over position-flattened s2d operands.

    The key identity: in the space-to-depth domain the conv has stride 1,
    so output position (p, q) of image i pairs with input position
    (p + ky, q + kx) — and once BOTH operands are flattened per-image to
    (rows = S, channels) with the SAME spatial extent S = (oh+2)*(ow+2)
    (the grad zero-padded from (oh, ow) up to it), that pairing is a pure
    row shift by off = ky*(ow+2) + kx, globally across the whole batch:
    valid grad rows never shift past their own image because the pad rows
    at the image tail are zero in G.  Each tap is then
    X[off : off + K]^T @ G — a (16C, K) x (K, cout) contraction with
    K = N*S, reading each operand from HBM exactly once (vs the ~9.7 GB
    patch materialization of conv1_dw_xla).

    Measured on v5e (BASELINE.md round-3 table): 9.98 ms at N=256 /
    block_rows=8192 vs 3.79 ms for XLA's native lowering — the 17
    dot launches per grid step dominate, and the native lowering is
    already at the hardware pass-count bound for this contraction's
    432x96 output (4 MXU m-tiles x K/128 k-steps x 136 ns == the
    measured native time), so no schedule can beat it.  Kept as a
    tested opt-in (VLT_CONV1_DW_IMPL=shifted) demonstrating the
    shape-cast-free kernel structure.

    x: (N, H, W, C); gout: (N, OH, OW, cout) grad w.r.t. the conv output
    (pre-bias).  Returns (11, 11, C, cout) float32, identical to the
    autodiff gradient of the direct conv (tests/test_pallas_kernels.py)."""
    n, h, w, c = x.shape
    oh, ow = gout.shape[1], gout.shape[2]
    cout = gout.shape[-1]
    cin_s2d = _C1_BLK * _C1_BLK * c
    xp = _conv1_s2d_geometry(x, oh, ow)          # (n, oh+2, ow+2, cin)
    srows = (oh + _C1_TAPS - 1) * (ow + _C1_TAPS - 1)
    offs = tuple(ky * (ow + _C1_TAPS - 1) + kx
                 for ky in range(_C1_TAPS) for kx in range(_C1_TAPS))
    head = -(-max(offs) // 16) * 16      # sublane-aligned head size
    block_rows = max(block_rows, head)   # a tap never spans >1 block
    k = n * srows
    nblk = -(-k // block_rows)
    kp = nblk * block_rows
    # contiguous flattens: (n, S, cin) -> (n*S, cin); then pad the row dim
    # out to kp (+ one extra block so every head gather is in range)
    xflat = jnp.pad(xp.reshape(k, cin_s2d),
                    ((0, kp + block_rows - k), (0, 0)))
    gflat = jnp.pad(gout, ((0, 0), (0, _C1_TAPS - 1), (0, _C1_TAPS - 1),
                           (0, 0))).astype(xflat.dtype)
    gflat = jnp.pad(gflat.reshape(k, cout), ((0, kp - k), (0, 0)))
    # block i's "head": the first ``head`` rows of block i+1, gathered as
    # a small side array so the kernel's per-tap tail contraction needs no
    # out-of-block reads (nblk * head * cin entries, ~20 MB at bench size)
    heads = xflat[block_rows:kp + block_rows] \
        .reshape(nblk, block_rows, cin_s2d)[:, :head] \
        .reshape(nblk * head, cin_s2d)

    kernel = functools.partial(_conv1_dw_shift_kernel, offs=offs,
                               cin_s2d=cin_s2d, rows=block_rows)
    dw_s2d = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((block_rows, cin_s2d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((head, cin_s2d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_C1_TAPS * _C1_TAPS * cin_s2d, cout),
                               lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (_C1_TAPS * _C1_TAPS * cin_s2d, cout), jnp.float32),
        interpret=interpret,
    )(xflat[:kp], heads, gflat)
    return _conv1_dw_s2d_to_hwio(dw_s2d, c, cout)


def conv1_dw_xla(x, gout, chunk=256):
    """dL/dw for the stem conv as explicit im2col + MXU matmuls (pure
    XLA).  The Mosaic kernel above (conv1_dw) is rejected by the TPU
    compiler ("unsupported shape cast" on the 4D->2D flatten), and XLA's
    native conv-transpose lowering of this gradient measured 36.5 ms
    in-step (1045 -> 1457.7 clips/s with it removed; BASELINE.md); here
    the (positions, taps) patch matrix becomes a (363, K) x (K, 96)
    contraction with K = N*OH*OW.  The batch is processed in ``chunk``
    image slices inside a fori_loop so the materialized patch buffer
    stays bounded (~chunk * OH*OW * 363 * 2B; the whole-batch buffer is
    ~4.8 GB at the bench shapes and risks HBM exhaustion next to the
    step's live activations).

    Measured whole-workload on v5e: 980 vs 1045 clips/s — the patch
    materialization's ~9.7 GB/step extra HBM traffic outweighs the
    matmul-efficiency gain, so XLA's native lowering stays the default
    (BASELINE.md has the full table incl. the 1457.7 c/s freeze bound).

    Returns (11, 11, C, cout) float32."""
    n, h, w, c = x.shape
    cout = gout.shape[-1]
    chunk = min(chunk, n)
    pad_n = (-n) % chunk
    if pad_n:
        # zero images contribute zero gradient
        x = jnp.pad(x, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
        gout = jnp.pad(gout, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
    k = c * 11 * 11

    def body(i, acc):
        xs = jax.lax.dynamic_slice_in_dim(x, i * chunk, chunk, 0)
        gs = jax.lax.dynamic_slice_in_dim(gout, i * chunk, chunk, 0)
        patches = jax.lax.conv_general_dilated_patches(
            xs, (11, 11), (4, 4), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (chunk,OH,OW,k)
        return acc + jax.lax.dot_general(
            patches.reshape(-1, k),
            gs.astype(patches.dtype).reshape(-1, cout),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (k, cout)

    dw = jax.lax.fori_loop(0, x.shape[0] // chunk, body,
                           jnp.zeros((k, cout), jnp.float32))
    # patches order the feature dim as (C, KH, KW) (depthwise-style);
    # transpose back to the (KH, KW, C, cout) kernel layout
    return dw.reshape(c, 11, 11, cout).transpose(1, 2, 0, 3)
