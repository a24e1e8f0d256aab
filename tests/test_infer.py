"""End-to-end tests for the serving CLI (tools/infer.py): raw media in,
top-k classes / captions out, through the production pack -> feed ->
restore -> forward chain."""

import json
import os

import numpy as np
import pytest
import yaml

from video_learning_tpu import run_task
from video_learning_tpu.tools import infer as infer_mod


@pytest.fixture(scope="module")
def trained_video_run(tmp_path_factory):
    """Pack the tiny video tree, train 2 epochs, return (config, media)."""
    from PIL import Image

    from tests.conftest import make_image
    from tests.test_train_e2e import _pack, _run_config

    tmp_path = tmp_path_factory.mktemp("inferfix")
    vids = []
    for v, nframes in enumerate([10, 12, 20]):
        vdir = tmp_path / ("vid%d" % v)
        vdir.mkdir()
        for i in range(nframes):
            Image.fromarray(make_image(48, 64, seed=v * 100 + i)).save(
                vdir / ("f_%04d.jpg" % i), quality=95)
        vids.append(str(vdir))
    tree = tmp_path / "videos.train"
    tree.write_text("\n".join("%s %d" % (v, i)
                              for i, v in enumerate(vids)) + "\n")
    _pack(tmp_path, tree)
    cfg, run_folder = _run_config(tmp_path, tree, "train", epochs=2)
    run_task.main(str(cfg))
    assert (run_folder / "checkpoints").exists()
    return tmp_path, cfg, vids


def test_infer_video_folders(trained_video_run):
    tmp_path, cfg, vids = trained_video_run
    out = tmp_path / "results.json"
    classes = tmp_path / "classes.txt"
    classes.write_text("alpha 0\nbeta 1\ngamma 2\n")
    results = infer_mod.main([
        str(cfg), "--media", *vids, "--checkpoint", "latest",
        "--topk", "2", "--classes", str(classes), "--out", str(out),
        "--workdir", str(tmp_path / "iw")])
    assert len(results) == 3
    for r, v in zip(results, vids):
        assert r["media"] == v
        assert len(r["topk"]) == 2
        names = [c for c, _ in r["topk"]]
        assert set(names) <= {"alpha", "beta", "gamma"}
        probs = [p for _, p in r["topk"]]
        assert all(0.0 <= p <= 1.0 for p in probs)
        assert probs == sorted(probs, reverse=True)
    # JSON artifact mirrors the return value
    assert json.load(open(out)) == results
    # the temp packing stayed in --workdir
    assert os.path.exists(tmp_path / "iw" / "media.infer.tfrecord")


def _image_media(tmp_path):
    from PIL import Image

    from tests.conftest import make_image
    media = []
    for i in range(3):
        p = tmp_path / ("im%d.jpg" % i)
        Image.fromarray(make_image(112, 112, seed=i)).save(p, quality=95)
        media.append(str(p))
    paths = tmp_path / "imgs.train"
    paths.write_text("".join("%s %d\n" % (m, i)
                             for i, m in enumerate(media)))
    return media, paths


def _image_cfg(tmp_path, paths, run_folder):
    return {"run": {
        "resume_file": None,
        "run_folder": str(run_folder),
        "run_id": "imginfer",
        "seed": 0,
        "mesh_shape": {"data": 1},
        "compute_dtype": "float32",
        "phase": "defs.phase.val",
        "data": {"imgs": {
            "data_path": str(paths),
            "raw_image_shape": "(112, 112, 3)",
            "image_shape": "(96, 96, 3)",
            "mean_image": [99.0, 99.0, 99.0],
            "data_format": "defs.data_format.tfrecord",
            "frame_format": "jpg",
            "imgproc": ["defs.imgproc.rand_crop",
                        "defs.imgproc.rand_mirror",
                        "defs.imgproc.sub_mean"],
            "batch_item": "defs.batch_item.default",
            "phase": "defs.phase.val",
            "tag": "defs.dataset_tag.main"}},
        "network": {
            "num_classes": 4,
            "pipelines": [
                {"frames": {
                    "input": "defs.dataset_tag.main",
                    "representation": "defs.representation.dcnn",
                    "frame_encoding_layer": "fc6"}},
                {"clf": {
                    "input": "frames",
                    "representation": "defs.representation.fc",
                    "fc_output_dim": 8,
                    "classifier": "defs.classifier.fc"}}]},
        "train": {"batch_size": 2, "epochs": 1,
                  "optimizer": "defs.optim.sgd", "base_lr": 0.01,
                  "lr_mult": None, "lr_decay": None, "clip_norm": None,
                  "dropout_keep_prob": 1.0},
        "val": {"batch_size": 2, "logits_save_interval": -1,
                "clip_fusion": "[defs.fusion_type.late, "
                               "defs.fusion_method.avg]"},
        "logging": {"save_freq_per_epoch": 1, "level": "logging.INFO",
                    "print_tensors": False, "tensorboard_folder": "tb",
                    "email_notify": None},
    }}


def test_infer_image_files_fresh_params(tmp_path):
    """Image media + --checkpoint none (smoke mode): structure only, no
    training required.  Also exercises the iterative single-frame pack."""
    media, paths = _image_media(tmp_path)
    cfg = _image_cfg(tmp_path, paths, tmp_path / "run")
    cfg_path = tmp_path / "run.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    results = infer_mod.infer(str(cfg_path), media, checkpoint="none",
                              topk=4)
    assert len(results) == 3
    for r in results:
        # full softmax over 4 classes sums to 1
        assert np.isclose(sum(p for _, p in r["topk"]), 1.0, atol=1e-5)
        assert all(isinstance(c, int) for c, _ in r["topk"])


def test_infer_train_only_config(tmp_path):
    """A config with NO val: block (trained train-only) must still
    serve: infer synthesizes val defaults instead of KeyError'ing."""
    media, paths = _image_media(tmp_path)
    cfg = _image_cfg(tmp_path, paths, tmp_path / "run")
    del cfg["run"]["val"]
    cfg["run"]["phase"] = "defs.phase.train"
    cfg["run"]["data"]["imgs"]["phase"] = "defs.phase.train"
    cfg_path = tmp_path / "run.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    results = infer_mod.infer(str(cfg_path), media, checkpoint="none",
                              topk=2)
    assert len(results) == 3
    assert all(len(r["topk"]) == 2 for r in results)


def test_infer_png_and_space_paths(tmp_path):
    """Regressions: (a) image media whose extension differs from the
    training config's frame_format (png vs jpg) must still pack as IMAGES
    — the packer infers image-vs-video mode from the first path's suffix,
    so the pack format has to follow the media; (b) media paths with
    spaces are staged through space-free symlinks (the packer's list-file
    format is space-delimited)."""
    from PIL import Image

    from tests.conftest import make_image

    _, paths = _image_media(tmp_path)    # jpg training list
    spaced = tmp_path / "my photos"
    spaced.mkdir()
    p0 = spaced / "im 0.png"
    Image.fromarray(make_image(112, 112, seed=7)).save(p0)
    p1 = tmp_path / "imx.jpg"
    Image.fromarray(make_image(112, 112, seed=8)).save(p1, quality=95)
    media = [str(p0), str(p1)]

    cfg = _image_cfg(tmp_path, paths, tmp_path / "run")
    cfg_path = tmp_path / "run.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    results = infer_mod.infer(str(cfg_path), media, checkpoint="none",
                              topk=2)
    assert [r["media"] for r in results] == media
    assert all(len(r["topk"]) == 2 for r in results)


def test_infer_missing_media_reports_not_found(tmp_path):
    from video_learning_tpu.utils import FrameworkError
    with pytest.raises(FrameworkError, match="not found"):
        infer_mod._media_kind([str(tmp_path / "no_such_dir")])


def test_infer_untagged_dataset_error(tmp_path):
    from video_learning_tpu.utils import FrameworkError
    media, paths = _image_media(tmp_path)
    cfg = _image_cfg(tmp_path, paths, tmp_path / "run")
    cfg["run"]["data"]["imgs"]["tag"] = "defs.dataset_tag.aux"
    cfg_path = tmp_path / "run.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    with pytest.raises(FrameworkError, match="main-tagged"):
        infer_mod.infer(str(cfg_path), media, checkpoint="none")


def test_infer_rejects_mixed_media(tmp_path, tiny_image_tree):
    from video_learning_tpu.utils import FrameworkError
    img = tiny_image_tree.read_text().split()[0]
    with pytest.raises(FrameworkError):
        infer_mod._media_kind([img, str(tmp_path)])


from tests.test_caption_e2e import caption_fixture  # noqa: F401,E402


def test_infer_captioning(caption_fixture, tmp_path):  # noqa: F811
    """Caption serving: train briefly, then caption raw image files via
    the CLI (decode length carried over from the training .size)."""
    import shutil

    from tests.test_caption_e2e import _cfg
    fix_path, paths_file, emb_path, gt_path, vocab = caption_fixture
    run_folder = fix_path / "run"
    if run_folder.exists():
        shutil.rmtree(run_folder)
    cfg = _cfg(fix_path, paths_file, emb_path, gt_path, "train")
    run_task.main(str(cfg))

    media = sorted(str(p) for p in (fix_path / "imgs").glob("*.jpg"))[:2]
    results = infer_mod.infer(str(cfg), media, checkpoint="latest",
                              workdir=str(tmp_path / "cw"))
    assert len(results) == 2
    for r, m in zip(results, media):
        assert r["media"] == m
        assert isinstance(r["caption"], str)
        for w in r["caption"].split():
            assert w in vocab


# ------------------------------------------------- AOT serving export
def test_export_serving_roundtrip(trained_video_run, tmp_path):
    """tools/export_serving: the AOT artifact reproduces the in-process
    val forward EXACTLY (same feed arrays through the deserialized
    StableHLO vs jit of build_serving_fn), pads partial batches, and is
    deterministic across calls."""
    import jax

    from video_learning_tpu import run_task
    from video_learning_tpu.batching import BatchGeometry
    from video_learning_tpu.tools import export_serving as exp_mod

    fix_path, cfg, vids = trained_video_run
    out = tmp_path / "model.vlx"
    meta = exp_mod.main([str(cfg), "--out", str(out),
                         "--batch-items", "2", "--platforms", "cpu",
                         "--workdir", str(tmp_path / "xw"),
                         "--selftest"])
    assert out.exists()
    assert meta["output"]["num_classes"] == 3
    assert meta["quantize"] is None

    serving = exp_mod.load(str(out))
    ins = serving.meta["inputs"]
    assert [i["name"] for i in ins] == [i["name"] for i in meta["inputs"]]

    # in-process ground truth through the SAME production chain
    workdir = tmp_path / "gt"
    workdir.mkdir()
    settings, feeder, model, params, val, kind = \
        infer_mod.build_serving_context(str(cfg), vids[:2], "latest",
                                        None, None, str(workdir),
                                        batch_size=2)
    assert feeder.loop()
    feed, batches = feeder.get_feed(model.required_input)
    feed = run_task._prepare_feed(feed, batches, model)
    feed, _, _ = BatchGeometry().pad_feed(feed)
    serve, names, specs = val.build_serving_fn(params, feed)
    arrays = [feed[n] for n in names]
    # geometry must match the exported signature for a direct compare
    assert [list(a.shape) for a in arrays] == [i["shape"] for i in ins]
    direct = np.asarray(jax.jit(serve)(*arrays))

    aot = serving(*arrays)
    np.testing.assert_allclose(aot, direct, rtol=1e-5, atol=1e-5)
    # deterministic
    np.testing.assert_array_equal(aot, serving(*arrays))

    # partial batch: half the items -> half the rows back
    half = [a[: a.shape[0] // 2] for a in arrays]
    part = serving(*half)
    assert part.shape[0] == aot.shape[0] // 2
    np.testing.assert_allclose(part, direct[: part.shape[0]],
                               rtol=1e-5, atol=1e-5)


def test_export_serving_int8(trained_video_run, tmp_path):
    """--int8 bakes the pre-quantized w8a8 forward into the artifact."""
    from video_learning_tpu.tools import export_serving as exp_mod

    _, cfg, vids = trained_video_run
    out = tmp_path / "model_int8.vlx"
    meta = exp_mod.main([str(cfg), "--out", str(out),
                         "--batch-items", "1", "--platforms", "cpu"])
    f32 = exp_mod.load(str(out))
    meta_q = exp_mod.main([str(cfg), "--out", str(out),
                           "--batch-items", "1", "--platforms", "cpu",
                           "--int8"])
    assert meta_q["quantize"] == "int8"
    quant = exp_mod.load(str(out))
    arrays = [np.random.RandomState(0).randint(
        0, 256, i["shape"]).astype(i["dtype"]) for i in f32.meta["inputs"]]
    a = f32(*arrays)
    b = quant(*arrays)
    assert a.shape == b.shape
    assert np.all(np.isfinite(b))
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
    assert rel < 0.1, "int8 artifact rel err %.4f" % rel

    # static activation scales, calibrated on the signature batch,
    # baked into the artifact (no per-batch amax in the StableHLO)
    out_s = tmp_path / "model_int8s.vlx"
    meta_s = exp_mod.main([str(cfg), "--out", str(out_s),
                           "--batch-items", "1", "--platforms", "cpu",
                           "--int8-static"])
    assert meta_s["quantize"] == "int8_static"
    quant_s = exp_mod.load(str(out_s))
    c = quant_s(*arrays)
    assert c.shape == a.shape
    assert np.all(np.isfinite(c))
    rel_s = np.linalg.norm(a - c) / (np.linalg.norm(a) + 1e-9)
    assert rel_s < 0.12, "int8_static artifact rel err %.4f" % rel_s


def test_export_serving_multidevice(trained_video_run, tmp_path):
    """--mesh exports a GSPMD-partitioned artifact (inputs batch-sharded
    over the data axis, output replicated); the loader rebuilds a
    same-shape mesh from jax.devices() and the result matches the
    single-device artifact exactly."""
    from video_learning_tpu.tools import export_serving as exp_mod

    _, cfg, vids = trained_video_run
    single = tmp_path / "m1.vlx"
    exp_mod.main([str(cfg), "--out", str(single),
                  "--batch-items", "2", "--platforms", "cpu"])
    sharded = tmp_path / "m4.vlx"
    meta = exp_mod.main([str(cfg), "--out", str(sharded),
                         "--batch-items", "2", "--platforms", "cpu",
                         "--mesh", "data=4"])
    assert meta["mesh"] == {"data": 4, "model": 1}

    s1 = exp_mod.load(str(single))
    s4 = exp_mod.load(str(sharded))
    assert [i["shape"] for i in s1.meta["inputs"]] == \
        [i["shape"] for i in s4.meta["inputs"]]
    rng = np.random.RandomState(3)
    arrays = [rng.randint(0, 200, i["shape"]).astype(i["dtype"])
              for i in s1.meta["inputs"]]
    a = s1(*arrays)
    b = s4(*arrays)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_export_serving_bucketed(trained_video_run, tmp_path):
    """--batch-items 1,2,4 exports one artifact with three static-batch
    executables; calls route to the smallest bucket that fits and match
    the largest bucket's rows exactly (per-item independence)."""
    from video_learning_tpu.tools import export_serving as exp_mod

    _, cfg, vids = trained_video_run
    out = tmp_path / "buckets.vlx"
    meta = exp_mod.main([str(cfg), "--out", str(out),
                         "--batch-items", "4,1,2", "--platforms", "cpu"])
    assert meta["buckets"] == [1, 2, 4]
    assert meta["batch_items"] == 4
    assert meta["format"] == "vlx-2"

    serving = exp_mod.load(str(out))
    ins = serving.meta["inputs"]
    per_item = [int(i["shape"][0]) // 4 for i in ins]
    rng = np.random.RandomState(7)
    full = [rng.randint(0, 200, i["shape"]).astype(i["dtype"])
            for i in ins]
    warm = serving.warmup()      # loads every bucket's executable
    assert warm.shape[0] == warm.shape[0] // 4 * 4
    ref = serving(*full)
    assert serving.last_bucket == 4

    # 1 item -> bucket 1; 2 -> 2; 3 -> 4 (smallest fitting)
    for items, want_bucket in ((1, 1), (2, 2), (3, 4)):
        part = [a[: p * items] for a, p in zip(full, per_item)]
        got = serving(*part)
        assert serving.last_bucket == want_bucket, (items, want_bucket)
        out_rows = ref.shape[0] // 4 * items
        assert got.shape[0] == out_rows
        np.testing.assert_allclose(got, ref[:out_rows],
                                   rtol=1e-5, atol=1e-5)


def test_export_serving_captioner(caption_fixture, tmp_path):  # noqa: F811
    """Caption AOT export: the artifact runs the on-device greedy decode
    (embedding baked in), returns (B, T) int32 word indices, carries the
    vocabulary in meta, and its trimmed captions match tools/infer on
    the same images + checkpoint."""
    import shutil

    from tests.test_caption_e2e import _cfg
    from video_learning_tpu.tools import export_serving as exp_mod

    fix_path, paths_file, emb_path, gt_path, vocab = caption_fixture
    run_folder = fix_path / "run"
    if run_folder.exists():
        shutil.rmtree(run_folder)
    cfg = _cfg(fix_path, paths_file, emb_path, gt_path, "train")
    run_task.main(str(cfg))

    out = tmp_path / "captioner.vlx"
    meta = exp_mod.main([str(cfg), "--out", str(out),
                         "--batch-items", "2", "--platforms", "cpu"])
    assert meta["output"]["kind"] == "token_ids"
    assert meta["output"]["vocabulary"] == list(vocab)

    # ground truth through the in-process serving CLI on real images
    media = sorted(str(p) for p in (fix_path / "imgs").glob("*.jpg"))[:2]
    results = infer_mod.infer(str(cfg), media, checkpoint="latest",
                              workdir=str(tmp_path / "cw"))

    # drive the artifact with the same packed batch the CLI built: rerun
    # the context to capture the feed arrays
    from video_learning_tpu import run_task as rt
    from video_learning_tpu.batching import BatchGeometry
    (tmp_path / "cw2").mkdir()
    settings, feeder, model, params, val, kind = \
        infer_mod.build_serving_context(str(cfg), media, "latest",
                                        None, None,
                                        str(tmp_path / "cw2"),
                                        batch_size=2)
    assert feeder.loop()
    feed, batches = feeder.get_feed(model.required_input)
    feed = rt._prepare_feed(feed, batches, model)
    feed, _, _ = BatchGeometry().pad_feed(feed)

    serving = exp_mod.load(str(out))
    arrays = [feed[i["name"]] for i in serving.meta["inputs"]]
    ids = serving(*arrays)
    assert ids.dtype.kind in "iu" and ids.ndim == 2
    caps = serving.captions_from_ids(ids)
    assert caps == [r["caption"] for r in results]


def test_serve_captioner_http(caption_fixture, tmp_path):  # noqa: F811
    """The HTTP server recognizes a caption artifact and returns decoded
    strings alongside the raw index rows."""
    import http.client
    import io
    import threading

    from tests.test_caption_e2e import _cfg
    from video_learning_tpu.tools import export_serving as exp_mod
    from video_learning_tpu.tools import serve as serve_mod

    fix_path, paths_file, emb_path, gt_path, vocab = caption_fixture
    cfg = _cfg(fix_path, paths_file, emb_path, gt_path, "train")
    run_folder = fix_path / "run"
    if not (run_folder / "checkpoints").exists():
        run_task.main(str(cfg))
    out = tmp_path / "cap.vlx"
    exp_mod.main([str(cfg), "--out", str(out),
                  "--batch-items", "2", "--platforms", "cpu"])
    module = exp_mod.load(str(out))

    started = threading.Event()
    t = threading.Thread(target=serve_mod.serve, args=(str(out),),
                         kwargs=dict(port=0, window_ms=5.0,
                                     started=started), daemon=True)
    t.start()
    assert started.wait(timeout=120)
    host, port = started.addr
    try:
        rng = np.random.RandomState(0)
        arrays = [rng.randint(0, 200, i["shape"]).astype(i["dtype"])
                  for i in module.meta["inputs"]]
        want_caps = module.captions(*arrays)
        buf = io.BytesIO()
        np.savez(buf, **{s["name"]: a for s, a in
                         zip(module.meta["inputs"], arrays)})
        c = http.client.HTTPConnection(host, port, timeout=60)
        c.request("POST", "/predict", body=buf.getvalue(),
                  headers={"Content-Type": "application/x-npz"})
        r = c.getresponse()
        doc = json.loads(r.read())
        c.close()
        assert r.status == 200
        assert doc["captions"] == want_caps
        for cap in doc["captions"]:
            for w in cap.split():
                assert w in vocab
    finally:
        started.httpd.shutdown()


def test_export_serving_bucketed_multidevice(trained_video_run, tmp_path):
    """Buckets + --mesh compose: every bucket's executable carries the
    GSPMD partitioning and small-bucket calls still match the
    single-device artifact."""
    from video_learning_tpu.tools import export_serving as exp_mod

    _, cfg, vids = trained_video_run
    plain = tmp_path / "p.vlx"
    exp_mod.main([str(cfg), "--out", str(plain),
                  "--batch-items", "1,2", "--platforms", "cpu"])
    sharded = tmp_path / "s.vlx"
    meta = exp_mod.main([str(cfg), "--out", str(sharded),
                         "--batch-items", "1,2", "--platforms", "cpu",
                         "--mesh", "data=4"])
    assert meta["buckets"] == [1, 2]
    assert meta["mesh"] == {"data": 4, "model": 1}

    s1 = exp_mod.load(str(plain))
    s4 = exp_mod.load(str(sharded))
    rng = np.random.RandomState(5)
    full = [rng.randint(0, 200, i["shape"]).astype(i["dtype"])
            for i in s1.meta["inputs"]]
    per_item = [int(i["shape"][0]) // 2 for i in s1.meta["inputs"]]
    one = [a[:p] for a, p in zip(full, per_item)]
    a1, a4 = s1(*one), s4(*one)
    assert s1.last_bucket == 1 and s4.last_bucket == 1
    np.testing.assert_allclose(a4, a1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s4(*full), s1(*full),
                               rtol=1e-5, atol=1e-5)
