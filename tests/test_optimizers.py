"""Optimizer factory (train.make_optimizer): AdamW decoupled weight
decay semantics (TPU-native addition — the reference enumerates only
sgd/rmsprop/adam, reference train.py:166-171), the ndim>1 decay mask,
config validation, and an end-to-end adamw training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _settings(optimizer="adamw", weight_decay=0.0, lr_mult=None):
    from video_learning_tpu.config import Settings, TrainOpts
    from video_learning_tpu.defs import defs

    s = Settings()
    s.train = TrainOpts()
    s.train.optimizer = getattr(defs.optim, optimizer)
    s.train.weight_decay = weight_decay
    s.train.lr_mult = lr_mult
    s.train.clip_norm = None
    return s


def test_adamw_decays_matrices_not_biases():
    """With ZERO gradients the adamw update is exactly -lr*wd*w on
    matrix leaves and 0 on vector leaves (decoupled decay, masked)."""
    from video_learning_tpu.train import make_optimizer

    lr, wd = 0.1, 0.01
    s = _settings(weight_decay=wd)
    tx = make_optimizer(s, np.array([lr], np.float32))
    params = {"fc": {"w": jnp.ones((4, 3)), "b": jnp.ones((3,))}}
    state = tx.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, state, params)
    np.testing.assert_allclose(np.asarray(updates["fc"]["w"]),
                               -lr * wd * np.ones((4, 3)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["fc"]["b"]),
                               np.zeros((3,)), atol=1e-12)


def test_adamw_zero_decay_matches_adam():
    """adamw with weight_decay 0 takes the same step as adam."""
    from video_learning_tpu.train import make_optimizer

    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(5, 2), jnp.float32),
              "b": jnp.asarray(rng.randn(2), jnp.float32)}
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)
    outs = {}
    for name in ("adam", "adamw"):
        tx = make_optimizer(_settings(name), np.array([0.05], np.float32))
        u, _ = tx.update(grads, tx.init(params), params)
        outs[name] = u
    for a, b in zip(jax.tree_util.tree_leaves(outs["adam"]),
                    jax.tree_util.tree_leaves(outs["adamw"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6)


def test_adamw_two_tier_decays_both_groups():
    """Under lr_mult (two-tier multi_transform) both tiers decay."""
    from video_learning_tpu.train import make_optimizer

    lr, wd, mult = 0.1, 0.01, 3.0
    s = _settings(weight_decay=wd, lr_mult=mult)
    params = {"enc": {"w": jnp.ones((4, 3))},
              "head": {"w": jnp.ones((2, 2))}}
    label_tree = {"enc": {"w": "regular"}, "head": {"w": "modified"}}
    tx = make_optimizer(s, np.array([lr], np.float32), label_tree)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["enc"]["w"]),
                               -lr * wd * np.ones((4, 3)), rtol=1e-6)
    # the modified tier decays at its own (multiplied) learning rate
    np.testing.assert_allclose(np.asarray(updates["head"]["w"]),
                               -lr * mult * wd * np.ones((2, 2)),
                               rtol=1e-6)


def test_adamw_trains_flagship_step():
    """A full jitted train step with adamw runs and reduces the loss."""
    import __graft_entry__ as graft
    from video_learning_tpu.train import Train

    settings, model = graft._flagship(optimizer="adamw", base_lr=0.01)
    settings.compute_dtype = "float32"
    settings.train.batch_size = 4
    settings.train.weight_decay = 1e-4
    engine = Train(settings, settings.feeder, model, seed=0)
    engine.place_params()
    rng = np.random.RandomState(0)
    feed = {"frames_main_input":
            rng.randn(16, 67, 67, 3).astype(np.float32),
            "labels": np.eye(16, dtype=np.int32)[np.arange(4) % 16]}
    losses = [engine.run_step(feed)["loss"] for _ in range(6)]
    assert losses[-1] < losses[0]


def test_weight_decay_config_validation(tmp_path):
    """The YAML parser accepts weight_decay with adamw, rejects it with
    other optimizers and rejects negatives."""
    from tests.test_defs_config import _write_config
    from video_learning_tpu.config import Settings
    from video_learning_tpu.utils import FrameworkError

    cfg = _write_config(tmp_path, tmp_path / "data.train")
    base = cfg.read_text()

    good = base.replace("optimizer: defs.optim.sgd",
                        "optimizer: defs.optim.adamw\n"
                        "    weight_decay: 0.01")
    cfg.write_text(good)
    s = Settings()
    s.initialize_from_file(str(cfg))
    assert s.train.optimizer == "adamw"
    assert s.train.weight_decay == 0.01

    bad = base.replace("optimizer: defs.optim.sgd",
                       "optimizer: defs.optim.sgd\n"
                       "    weight_decay: 0.01")
    cfg.write_text(bad)
    with pytest.raises(FrameworkError, match="adamw"):
        Settings().initialize_from_file(str(cfg))

    neg = good.replace("weight_decay: 0.01", "weight_decay: -0.1")
    cfg.write_text(neg)
    with pytest.raises(FrameworkError, match=">= 0"):
        Settings().initialize_from_file(str(cfg))
