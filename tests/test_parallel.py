"""SPMD correctness on the virtual 8-device CPU mesh: dp x tp sharded
training steps must reproduce single-device numerics, and the sharding
rules must actually shard the wide kernels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_learning_tpu.parallel import mesh as mesh_mod
from video_learning_tpu.parallel.sharding import (param_shardings,
                                                  shard_params)


def _toy_model():
    """A wide-FC toy model big enough to trigger the tp sharding rule."""
    from video_learning_tpu.models.layers import fc_apply, fc_init
    k = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(k)
    params = {"fc1": fc_init(k1, 256, 512), "fc2": fc_init(k2, 512, 8)}

    def apply(params, x):
        h = jax.nn.relu(fc_apply(params["fc1"], x))
        return fc_apply(params["fc2"], h)

    return params, apply


def test_sharding_rules_pick_wide_kernels():
    mesh = mesh_mod.make_mesh({"data": 4, "model": 2})
    params, _ = _toy_model()
    sh = param_shardings(params, mesh)
    assert "model" in str(sh["fc1"]["w"].spec)   # 256x512 -> sharded
    assert "model" not in str(sh["fc2"]["b"].spec)
    # 1-way model axis -> everything replicated
    mesh1 = mesh_mod.make_mesh({"data": 8, "model": 1})
    sh1 = param_shardings(params, mesh1)
    assert all("model" not in str(s.spec)
               for s in jax.tree_util.tree_leaves(sh1))


def test_tp_matches_single_device_numerics():
    params, apply = _toy_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 256))
    y = jax.random.normal(jax.random.PRNGKey(2), (8, 8))

    def loss_fn(p, x, y):
        return jnp.mean((apply(p, x) - y) ** 2)

    grad_fn = jax.jit(jax.grad(loss_fn))
    g_single = grad_fn(params, x, y)

    mesh = mesh_mod.make_mesh({"data": 4, "model": 2})
    p_sharded = shard_params(params, mesh)
    x_sh = jax.device_put(x, mesh_mod.data_sharding(mesh))
    y_sh = jax.device_put(y, mesh_mod.data_sharding(mesh))
    g_sharded = grad_fn(p_sharded, x_sh, y_sh)

    for path in ("fc1", "fc2"):
        for leaf in ("w", "b"):
            assert np.allclose(np.asarray(g_single[path][leaf]),
                               np.asarray(g_sharded[path][leaf]),
                               atol=1e-5), (path, leaf)


def test_full_train_step_dp_tp_matches_single():
    """The real Train engine: one step on a dp=2 x tp=2 mesh must match
    one step on a 1-device mesh bit-for-bit (same init, same batch)."""
    import __graft_entry__ as graft
    from video_learning_tpu.train import Train

    def run(mesh_shape):
        settings, model = graft._flagship()
        settings.compute_dtype = "float32"
        settings.mesh_shape = mesh_shape
        settings.train.batch_size = 4
        engine = Train(settings, settings.feeder, model, seed=0)
        engine.place_params()
        n = 4 * 4  # batch_clips * fpc
        rng = np.random.RandomState(0)
        feed = {"frames_main_input":
                rng.randn(n, 67, 67, 3).astype(np.float32),
                "labels": np.eye(16, dtype=np.int32)[
                    np.arange(4) % 16]}
        metrics = engine.run_step(feed)
        return metrics, jax.tree_util.tree_map(np.asarray, engine.params)

    m1, p1 = run({"data": 1, "model": 1})
    m2, p2 = run({"data": 2, "model": 2})
    # float32 reduction order differs across shardings; agreement within
    # ~1e-3 relative is the expected envelope for sharded-vs-single runs
    assert m1["loss"] == pytest.approx(m2["loss"], rel=1e-3)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        assert np.allclose(a, b, atol=5e-3), np.abs(a - b).max()


def test_dryrun_multichip_entry():
    """The graft dryrun contract on the virtual mesh."""
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)


def test_validation_forward_dp_tp_matches_single():
    """The Validation engine's forward must produce identical logits on a
    dp=4 x tp=2 mesh and on a 1-device mesh (eval scales over the same
    mesh as training; parallel/mesh.shard_feed + shard_params)."""
    import __graft_entry__ as graft
    from video_learning_tpu.val import Validation

    def run(mesh_shape):
        from video_learning_tpu.config import ValOpts
        settings, model = graft._flagship()
        settings.compute_dtype = "float32"
        settings.mesh_shape = mesh_shape
        settings.val = ValOpts()
        val = Validation(settings, model)
        params = model.init_params(jax.random.PRNGKey(0))
        n = 8 * 4  # 8 clips x 4 fpc -> divisible by the 4-wide data axis
        rng = np.random.RandomState(0)
        feed = {"frames_main_input":
                rng.randn(n, 67, 67, 3).astype(np.float32),
                "labels": np.eye(16, dtype=np.int32)[np.arange(8) % 16]}
        return val.run_forward(params, feed)

    single = run({"data": 1, "model": 1})
    sharded = run({"data": 4, "model": 2})
    assert single.shape == sharded.shape
    assert np.allclose(single, sharded, atol=2e-4), \
        np.abs(single - sharded).max()


def test_accum_steps_dp_tp_matches_unaccumulated():
    """Gradient accumulation under dp x tp sharding: accum_steps=2 on a
    {data:2, model:2} mesh reproduces the unaccumulated step's loss and
    parameters (the scan over micro-batches must compose with GSPMD)."""
    import __graft_entry__ as graft
    from video_learning_tpu.train import Train

    def run(accum):
        settings, model = graft._flagship()
        settings.compute_dtype = "float32"
        settings.mesh_shape = {"data": 2, "model": 2}
        settings.train.batch_size = 4
        settings.train.accum_steps = accum
        # accumulation folds a distinct dropout rng per micro-batch;
        # disable dropout so the comparison is exact
        settings.train.dropout_keep_prob = 1.0
        engine = Train(settings, settings.feeder, model, seed=0)
        engine.place_params()
        n = 4 * 4
        rng = np.random.RandomState(0)
        feed = {"frames_main_input":
                rng.randn(n, 67, 67, 3).astype(np.float32),
                "labels": np.eye(16, dtype=np.int32)[np.arange(4) % 16]}
        metrics = engine.run_step(feed)
        return metrics, jax.tree_util.tree_map(np.asarray, engine.params)

    m1, p1 = run(1)
    m2, p2 = run(2)
    assert m1["loss"] == pytest.approx(m2["loss"], rel=1e-4)
    assert m1["accuracy"] == m2["accuracy"]
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert np.allclose(a, b, atol=5e-4), np.abs(a - b).max()


def test_default_step_differentiates_masked_mean():
    """The accum_steps=1 (default) step is the value_and_grad of
    softmax_cross_entropy — the masked MEAN (reference train.py:117-124).
    Pinned at 1e-5 on a PARTIAL batch (the padding mask is live), which
    catches any wrong-normalization rewrite (sum, divide-by-rows,
    unmasked mean: all off by >=25% here).  Bit-exactness across two
    separately-jitted programs is not achievable (fusion differences
    round differently at ~1e-5); the trajectory-level guard for fp
    reassociation in the default step is the deterministic captioning
    example anchor (BASELINE.md round-3 forensics)."""
    import optax
    import __graft_entry__ as graft
    from video_learning_tpu.train import Train, softmax_cross_entropy

    settings, model = graft._flagship()
    settings.compute_dtype = "float32"
    settings.train.batch_size = 4
    engine = Train(settings, settings.feeder, model, seed=0)
    n_items, fpc = 3, 4                 # 3 of 4 batch slots -> mask live
    rng = np.random.RandomState(1)
    feed = {"frames_main_input":
            rng.randn(n_items * fpc, 67, 67, 3).astype(np.float32),
            "labels": np.eye(16, dtype=np.int32)[np.arange(n_items) % 16]}

    # reference: direct value_and_grad of the masked-mean loss with the
    # exact padded feed + rng the engine will use for step 0
    padded = engine._pad_feed(dict(feed))
    assert "label_mask" in padded and padded["label_mask"].sum() == n_items
    key = jax.random.fold_in(engine.base_rng, 0)
    params0 = jax.tree_util.tree_map(np.asarray, engine.params)

    def loss_fn(p):
        logits = model.apply(p, padded, train=True, dropout_rng=key)
        return softmax_cross_entropy(logits, padded["labels"],
                                     padded["label_mask"])

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(params0)
    ref_norm = float(optax.global_norm(ref_grads))

    metrics = engine.run_step(dict(feed))
    assert metrics["loss"] == pytest.approx(float(ref_loss), rel=1e-5)
    assert metrics["grad_norm"] == pytest.approx(ref_norm, rel=1e-4)
