"""Weight EMA (train: ema_decay) — shadow params ride inside opt_state:
per-step blend math, checkpoint round-trip via "ema_params", EMA seeding
when resuming from an EMA-less checkpoint, eval_params() selection, and
dp x tp mesh compatibility (TPU-native addition; the reference has no
EMA concept)."""

import os

import numpy as np
import pytest

import jax

DECAY = 0.5


def _engine(mesh_shape=None, decay=DECAY):
    import __graft_entry__ as graft
    from video_learning_tpu.train import Train
    settings, model = graft._flagship()
    settings.compute_dtype = "float32"
    if mesh_shape:
        settings.mesh_shape = mesh_shape
    settings.train.batch_size = 4
    settings.train.ema_decay = decay
    engine = Train(settings, settings.feeder, model, seed=0)
    engine.place_params()
    return engine


def _feed(seed=0):
    rng = np.random.RandomState(seed)
    n = 4 * 4  # batch_clips * fpc
    return {"frames_main_input": rng.randn(n, 67, 67, 3).astype(np.float32),
            "labels": np.eye(16, dtype=np.int32)[np.arange(4) % 16]}


def _np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _allclose(a, b, atol=1e-6):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        assert np.allclose(x, y, atol=atol), np.abs(x - y).max()


def test_ema_blend_math():
    """After k steps the shadow params are exactly the recursive blend
    d*ema + (1-d)*params_new of the post-update params."""
    engine = _engine()
    ema = _np(engine.params)  # EMA starts at the init params
    for s in range(2):
        engine.run_step(_feed(s))
        p = _np(engine.params)
        ema = jax.tree_util.tree_map(
            lambda e, q: DECAY * e + (1 - DECAY) * q, ema, p)
    _allclose(engine.opt_state["ema"], ema, atol=1e-5)
    # the shadow differs from the live params (it lags the trajectory)
    diffs = [np.abs(a - b).max() for a, b in
             zip(jax.tree_util.tree_leaves(_np(engine.opt_state["ema"])),
                 jax.tree_util.tree_leaves(_np(engine.params)))]
    assert max(diffs) > 0


def test_ema_state_dict_roundtrip(tmp_path):
    from video_learning_tpu import checkpoint as ck
    engine = _engine()
    engine.run_step(_feed())
    state = engine.state_dict()
    assert "ema_params" in state
    path = str(tmp_path / "ema.ckpt")
    ck.save_checkpoint(path, state)

    # restore by NAME into a fresh engine's state tree (the production
    # resume path shape), with loaded_out bookkeeping
    engine2 = _engine()
    target = engine2.state_dict()
    loaded = []
    ck.restore_checkpoint(path, target, loaded_out=loaded)
    assert any(n.startswith("ema_params") for n in loaded)
    engine2.load_state_dict(target, restored_names=loaded)
    _allclose(engine2.opt_state["ema"], engine.opt_state["ema"])
    _allclose(engine2.params, engine.params)
    assert engine2.global_step == engine.global_step


def test_ema_seeded_at_params_for_emaless_checkpoint():
    """Resuming an ema_decay run from a checkpoint WITHOUT ema_params
    (e.g. one written before EMA was enabled) seeds the shadow at the
    restored params, not at the fresh-init values."""
    engine = _engine()
    engine.run_step(_feed())
    state = engine.state_dict()
    del state["ema_params"]

    engine2 = _engine()
    # restored_names says params came from a file but no ema did
    engine2.load_state_dict(
        state, restored_names=["params/anything"])
    _allclose(engine2.opt_state["ema"], engine.params)


def test_eval_params_selection():
    engine = _engine()
    engine.run_step(_feed())

    class _V:
        use_ema = True

    engine.settings.val = _V()
    _allclose(engine.eval_params(), engine.opt_state["ema"])
    _V.use_ema = False
    _allclose(engine.eval_params(), engine.params)
    engine.settings.val = None
    _allclose(engine.eval_params(), engine.params)


def test_ema_dp_tp_matches_single_device():
    """The EMA blend is elementwise, so the shadow params after a dp x tp
    sharded step must match the single-device step's within the usual
    sharded-reduction envelope."""
    e1 = _engine({"data": 1, "model": 1})
    e2 = _engine({"data": 2, "model": 2})
    e1.run_step(_feed())
    e2.run_step(_feed())
    fa = jax.tree_util.tree_leaves(_np(e1.opt_state["ema"]))
    fb = jax.tree_util.tree_leaves(_np(e2.opt_state["ema"]))
    for a, b in zip(fa, fb):
        assert np.allclose(a, b, atol=5e-3), np.abs(a - b).max()


def test_ema_off_keeps_plain_opt_state():
    engine = _engine(decay=0.0)
    assert not isinstance(engine.opt_state, dict) or \
        "ema" not in engine.opt_state
    engine.run_step(_feed())  # step works, no EMA bookkeeping
    state = engine.state_dict()
    assert "ema_params" not in state


@pytest.fixture(scope="module")
def ema_trained_run(tmp_path_factory):
    """Pack a tiny video tree and train 2 epochs WITH ema_decay through
    the production CLI; returns (config path, run folder, media dirs)."""
    import yaml
    from PIL import Image

    from tests.conftest import make_image
    from tests.test_train_e2e import _pack, _run_config
    from video_learning_tpu import run_task

    tmp_path = tmp_path_factory.mktemp("emarun")
    vids = []
    for v in range(3):
        vdir = tmp_path / ("vid%d" % v)
        vdir.mkdir()
        for i in range(12):
            Image.fromarray(make_image(112, 112, seed=v * 50 + i)).save(
                vdir / ("f_%04d.jpg" % i), quality=95)
        vids.append(str(vdir))
    tree = tmp_path / "videos.train"
    tree.write_text("\n".join("%s %d" % (v, i)
                              for i, v in enumerate(vids)) + "\n")
    _pack(tmp_path, tree)
    cfg, run_folder = _run_config(tmp_path, tree, "train", epochs=2)
    doc = yaml.safe_load(cfg.read_text())
    doc["run"]["train"]["ema_decay"] = 0.5
    cfg.write_text(yaml.safe_dump(doc))
    run_task.main(str(cfg))
    return tmp_path, cfg, run_folder, vids


def test_infer_ema_vs_live(ema_trained_run, tmp_path):
    """tools/infer --ema serves the shadow weights: the probabilities
    differ from the live-weight serve of the same checkpoint, and the
    shadow params build_serving_context picks are exactly the
    checkpoint's ema_params tree (the path export_serving --ema shares)."""
    from video_learning_tpu import checkpoint as ck
    from video_learning_tpu.tools import infer as infer_mod

    fix_path, cfg, run_folder, vids = ema_trained_run
    live = infer_mod.main([str(cfg), "--media", *vids,
                           "--checkpoint", "latest", "--topk", "3",
                           "--workdir", str(tmp_path / "w1")])
    ema = infer_mod.main([str(cfg), "--media", *vids,
                          "--checkpoint", "latest", "--topk", "3",
                          "--ema", "--workdir", str(tmp_path / "w2")])
    assert len(live) == len(ema) == 3
    live_probs = [p for r in live for _, p in r["topk"]]
    ema_probs = [p for r in ema for _, p in r["topk"]]
    # decay 0.5 over 2 epochs leaves the shadow measurably off the live
    # trajectory — identical probs would mean --ema was ignored
    assert np.abs(np.array(live_probs) - np.array(ema_probs)).max() > 1e-6

    # the params the serving stack selects ARE the checkpointed shadow
    (tmp_path / "w3").mkdir(exist_ok=True)
    settings, feeder, model, params, val, kind = \
        infer_mod.build_serving_context(
            str(cfg), vids, "latest", workdir=str(tmp_path / "w3"),
            use_ema=True)
    ckpts = sorted(f for f in os.listdir(run_folder / "checkpoints")
                   if f.endswith(".ckpt"))
    flat = ck.load_flat(str(run_folder / "checkpoints" / ckpts[-1]))
    saved_ema = {k: v for k, v in flat.items()
                 if k.startswith("ema_params/")}
    assert saved_ema
    got = ck.flatten_tree({"ema_params": params})
    assert set(got) == set(saved_ema)
    for name, value in saved_ema.items():
        assert np.allclose(np.asarray(got[name]), value, atol=1e-7), name


def test_infer_ema_fallback_to_live_weights(tmp_path):
    """--ema against a checkpoint WITHOUT ema_params warns and serves the
    live weights — results identical to the plain serve."""
    import yaml
    from PIL import Image

    from tests.conftest import make_image
    from tests.test_train_e2e import _pack, _run_config
    from video_learning_tpu import run_task
    from video_learning_tpu.tools import infer as infer_mod

    vids = []
    for v in range(2):
        vdir = tmp_path / ("vid%d" % v)
        vdir.mkdir()
        for i in range(10):
            Image.fromarray(make_image(112, 112, seed=v * 9 + i)).save(
                vdir / ("f_%04d.jpg" % i), quality=95)
        vids.append(str(vdir))
    tree = tmp_path / "videos.train"
    tree.write_text("\n".join("%s %d" % (v, i)
                              for i, v in enumerate(vids)) + "\n")
    _pack(tmp_path, tree)
    cfg, run_folder = _run_config(tmp_path, tree, "train", epochs=1)
    run_task.main(str(cfg))  # no ema_decay: checkpoint has no shadow

    live = infer_mod.main([str(cfg), "--media", *vids,
                           "--checkpoint", "latest", "--topk", "2",
                           "--workdir", str(tmp_path / "w1")])
    ema = infer_mod.main([str(cfg), "--media", *vids,
                          "--checkpoint", "latest", "--topk", "2",
                          "--ema", "--workdir", str(tmp_path / "w2")])
    assert [r["topk"] for r in live] == [r["topk"] for r in ema]


def test_select_eval_params_partial_restore_seeds_from_live():
    """A checkpoint whose ema_params tree is only partially restorable
    (shape drift skipped leaves) must complete the shadow from the
    RESTORED live params, never serve fresh-init slot values."""
    from video_learning_tpu import checkpoint as ck

    fresh = {"a": np.zeros(2), "b": np.zeros(3)}
    state, ig = ck.prepare_eval_state(dict(fresh), [], use_ema=True)
    # simulate a restore that loaded params fully but only ema b
    state["params"] = {"a": np.ones(2), "b": np.full(3, 2.0)}
    state["ema_params"]["b"] = np.full(3, 5.0)
    loaded = ["params/a", "params/b", "ema_params/b"]
    params, used = ck.select_eval_params(state, loaded, True, True, "t")
    assert used
    assert np.allclose(params["b"], 5.0)          # restored shadow leaf
    assert np.allclose(params["a"], 1.0)          # seeded from live, not 0


def test_select_eval_params_no_ema_in_checkpoint():
    from video_learning_tpu import checkpoint as ck
    fresh = {"a": np.ones(2)}
    state, _ = ck.prepare_eval_state(dict(fresh), [], use_ema=True)
    params, used = ck.select_eval_params(
        state, ["params/a"], True, True, "t")
    assert not used and params is state["params"]
    # not resuming at all: live params, ema not used
    params, used = ck.select_eval_params(state, [], True, False, "t")
    assert not used


def test_inline_eval_use_ema_requires_ema_decay(tmp_path):
    """train: eval_every_epochs + val: use_ema without train: ema_decay
    is rejected at parse time (the inline evals would silently judge
    early stopping / best.ckpt on the live weights)."""
    import yaml

    from tests.test_train_e2e import _run_config
    from video_learning_tpu.config import Settings
    from video_learning_tpu.utils import FrameworkError

    cfg, _ = _run_config(tmp_path, tmp_path / "nodata.train", "train")
    doc = yaml.safe_load(cfg.read_text())
    doc["run"]["train"]["eval_every_epochs"] = 1
    doc["run"]["val"]["use_ema"] = True
    cfg.write_text(yaml.safe_dump(doc))
    with pytest.raises(FrameworkError, match="use_ema needs"):
        Settings().initialize_from_file(str(cfg))
    # with ema_decay it parses (dataset init will fail later on the
    # missing file, which is not what this test pins)
    doc["run"]["train"]["ema_decay"] = 0.99
    cfg.write_text(yaml.safe_dump(doc))
    try:
        Settings().initialize_from_file(str(cfg))
    except FrameworkError as e:
        assert "use_ema" not in str(e)


def test_ema_config_parse_and_validation(tmp_path):
    """The real YAML parser accepts ema_decay/use_ema and rejects an
    out-of-range decay."""
    from tests.test_defs_config import _write_config
    from video_learning_tpu.config import Settings
    from video_learning_tpu.utils import FrameworkError

    cfg = _write_config(tmp_path, tmp_path / "data.train")
    text = cfg.read_text().replace("base_lr: 0.05",
                                   "base_lr: 0.05\n    ema_decay: 0.999")
    cfg.write_text(text)
    s = Settings()
    s.initialize_from_file(str(cfg))
    assert s.train.ema_decay == 0.999

    cfg.write_text(text.replace("ema_decay: 0.999", "ema_decay: 1.5"))
    with pytest.raises(FrameworkError):
        Settings().initialize_from_file(str(cfg))
