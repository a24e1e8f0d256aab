"""Step-time decomposition for the flagship (north-star) workload.

Times each stage of the benchmark training step in isolation at the
benchmark shapes, so optimization effort goes where the time is.  The
reference has no profiling story beyond wall-clock logs (SURVEY.md §5);
this is TPU-native tooling.  Tunnel-safe methodology (see BASELINE.md):
every measurement is a jitted scan of ``--inner`` iterations, median of
``--reps`` timed calls, synced by pulling one scalar to the host.

Usage: python -m video_learning_tpu.tools.profile_ablation
           [--batch-clips 128] [--fpc 16] [--inner 10] [--reps 3]
"""

import argparse
import sys
import time

import numpy as np


def _timed(fn, *args, inner=10, reps=3):
    """Median seconds per single application of fn.

    The timing loop is one compiled scan of ``inner`` iterations
    (tunnel-safe: one dispatch per sample).  The LAST positional arg must
    be an array: each iteration perturbs it with a carry-dependent zero,
    otherwise XLA hoists the loop-invariant body out of the scan and the
    measurement collapses to a single execution."""
    import jax
    import jax.numpy as jnp

    def many(*a):
        def body(acc, _):
            x = a[-1]
            # acc * 0.0 is runtime-zero but NOT foldable (float mul by 0
            # must preserve NaN/Inf), so x depends on the loop carry and
            # the body cannot be hoisted.  An int expression like step%1
            # IS folded to 0 by XLA:TPU — it silently re-hoisted the loop
            # in the first version of this tool.
            bump = (acc * 0.0).astype(x.dtype)
            x = x.at[(0,) * x.ndim].add(bump)
            out = fn(*a[:-1], x)
            # fold the output into a scalar so the loop can't be DCE'd
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
                    if hasattr(l, "dtype"))
            return acc + s, ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return acc

    jitted = jax.jit(many)
    out = jitted(*args)
    _ = float(out)  # compile + sync
    times = []
    for _r in range(reps):
        tic = time.time()
        out = jitted(*args)
        _ = float(out)
        times.append(time.time() - tic)
    return float(np.median(times)) / inner


def per_layer(args):
    """Cumulative fwd+bwd cost of each AlexNet stage at the bench
    shapes; successive deltas attribute step time to single layers (the
    BASELINE.md round-2 decomposition that motivated the LRN band-matmul
    rewrite and the conv1_dw Pallas kernel)."""
    import time as _time

    import jax
    import jax.numpy as jnp
    from video_learning_tpu.models import alexnet
    from video_learning_tpu.models.layers import (conv_apply, fc_apply,
        flat_dim, local_response_normalization, max_pool)

    N = args.batch_clips * args.fpc
    dt = jnp.float32 if args.cpu else jnp.bfloat16
    rng = np.random.RandomState(0)
    params = alexnet.init(jax.random.PRNGKey(0), 101, "fc7")
    x0 = jnp.asarray(rng.randn(N, 227, 227, 3), jnp.float32)
    NAMES = ["conv1", "lrn1", "pool1", "conv2", "lrn2", "pool2",
             "conv3", "conv4", "conv5", "fc6", "fc7"]

    def stack(upto):
        def f(p, x):
            def conv(name, inp):
                _, _, _, _, st, g = alexnet._CONV_SPECS[name]
                return conv_apply(p[name], inp, (st, st), "SAME",
                                  groups=g, relu=True, compute_dtype=dt)
            n = 0
            for stage in NAMES:
                if stage.startswith("conv"):
                    x = conv(stage, x)
                elif stage.startswith("lrn"):
                    x = local_response_normalization(x)
                elif stage.startswith("pool"):
                    x = max_pool(x, (3, 3), (2, 2), "VALID")
                else:  # fc
                    if stage == "fc6":
                        x = max_pool(x, (3, 3), (2, 2), "VALID")
                        x = x.reshape(x.shape[0], flat_dim(x.shape[1:]))
                    x = jax.nn.relu(fc_apply(p[stage], x, dt))
                n += 1
                if n == upto:
                    return x
            return x
        return f

    prev = 0.0
    for i, nm in enumerate(NAMES, start=1):
        f = stack(i)

        def loss(p, x):
            return jnp.sum(f(p, x).astype(jnp.float32)) / N

        g = jax.jit(jax.grad(loss, argnums=0))

        def run():
            out = g(params, x0)
            return float(jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l.astype(jnp.float32)), out,
                jnp.float32(0)))

        run()
        ts = []
        for _ in range(args.reps):
            t0 = _time.perf_counter()
            run()
            ts.append(_time.perf_counter() - t0)
        t = min(ts)
        print("%-6s cum %7.1f ms  delta %7.1f ms"
              % (nm, t * 1e3, (t - prev) * 1e3), flush=True)
        prev = t


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-clips", type=int, default=128)
    ap.add_argument("--fpc", type=int, default=16)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--per-layer", action="store_true",
                    help="cumulative per-layer fwd+bwd deltas instead of "
                         "the stage decomposition")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from video_learning_tpu.parallel.mesh import init_platform
    init_platform()
    if args.per_layer:
        return per_layer(args)

    import jax.numpy as jnp
    from video_learning_tpu.models import alexnet, lstm as lstm_mod
    from video_learning_tpu.ops.preprocess import make_preprocessor
    from video_learning_tpu.data.imgproc import ImageProcessor
    from video_learning_tpu.defs import defs

    B, F = args.batch_clips, args.fpc
    N = B * F
    raw_hw, crop = (240, 320), 227
    dt = jnp.bfloat16 if not args.cpu else jnp.float32
    rng = np.random.RandomState(0)
    rows = []

    def report(name, sec, note=""):
        rows.append((name, sec))
        print("%-28s %8.2f ms   %s" % (name, sec * 1e3, note), flush=True)

    # ---- device preprocessing: crop + mean + mirror on raw uint8
    proc = ImageProcessor(
        [defs.imgproc.rand_crop, defs.imgproc.sub_mean,
         defs.imgproc.rand_mirror],
        raw_hw + (3,), (crop, crop, 3), [104.0, 117.0, 123.0])
    pre = make_preprocessor(proc)
    # inputs are generated ON device: the tunnelled TPU in this image
    # moves ~0.03 GB/s host->device, so staging GB-sized host arrays
    # would dominate the session
    key = jax.random.PRNGKey(0)
    raw = jax.random.randint(key, (N,) + raw_hw + (3,), 0, 256,
                             jnp.int32).astype(jnp.uint8)
    params_pp = np.zeros((N, 3), np.int32)
    params_pp[:, 0] = rng.randint(0, raw_hw[0] - crop + 1, N)
    params_pp[:, 1] = rng.randint(0, raw_hw[1] - crop + 1, N)
    params_pp[:, 2] = rng.randint(0, 2, N)
    params_pp = jnp.asarray(params_pp)
    report("preprocess (crop+mean+mir)",
           _timed(lambda r, p: pre(r, p), raw, params_pp,
                  inner=args.inner, reps=args.reps),
           "uint8 (%d,240,320,3) -> f32 227" % N)

    # ---- AlexNet forward at fc7
    ax_params = alexnet.init(jax.random.PRNGKey(0), 101, "fc7")
    frames = jax.random.normal(key, (N, crop, crop, 3), jnp.float32)

    def ax_fwd(p, x):
        return alexnet.apply(p, x, "fc7", compute_dtype=dt)

    report("alexnet fwd (fc7)",
           _timed(ax_fwd, ax_params, frames,
                  inner=args.inner, reps=args.reps))

    # ---- AlexNet fwd+bwd
    def ax_loss(p, x):
        return jnp.sum(ax_fwd(p, x).astype(jnp.float32)) / N

    ax_grad = jax.grad(ax_loss)
    report("alexnet fwd+bwd",
           _timed(ax_grad, ax_params, frames,
                  inner=args.inner, reps=args.reps))

    # ---- AlexNet fwd+bwd without LRN
    orig_lrn = alexnet.local_response_normalization
    alexnet.local_response_normalization = lambda x, *a, **k: x
    try:
        report("alexnet fwd+bwd, LRN=id",
               _timed(jax.grad(ax_loss), ax_params, frames,
                      inner=args.inner, reps=args.reps),
               "LRN cost = delta vs previous row")
    finally:
        alexnet.local_response_normalization = orig_lrn

    # ---- LRN alone at its two sites (conv1/conv2 outputs)
    from video_learning_tpu.models.layers import \
        local_response_normalization as lrn
    for shape in ((N, 57, 57, 96), (N, 28, 28, 256)):
        act = jax.random.normal(key, shape, jnp.float32).astype(dt)
        report("lrn %s" % (shape,),
               _timed(lambda a: lrn(a), act,
                      inner=args.inner, reps=args.reps))

    # ---- LSTM classifier fwd+bwd on (B*F, 4096) frames-first
    l_params = lstm_mod.init(jax.random.PRNGKey(1), 4096, 256, 2)
    seq = jax.random.normal(key, (N, 4096), jnp.float32)
    lens = jnp.full((B,), F, jnp.int32)

    def lstm_loss(p, s):
        outs, _ = lstm_mod.evaluate_sequence(p, s, 256, F, lengths=lens,
                                             compute_dtype=dt)
        return jnp.sum(outs.astype(jnp.float32)) / B

    report("lstm 2x256 fwd+bwd",
           _timed(jax.grad(lstm_loss), l_params, seq,
                  inner=args.inner, reps=args.reps))

    print("-" * 64)
    step_ms = (rows[0][1] + rows[2][1] + rows[-1][1]) * 1e3
    print("approx step (pre + alexnet-grad + lstm-grad): "
          "%.2f ms -> %.1f clips/s (bench.py measures the real step)"
          % (step_ms, B / (step_ms / 1e3)))
    return rows


if __name__ == "__main__":
    main()
