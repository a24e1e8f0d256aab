"""HTTP serving server (tools/serve.py): an exported .vlx artifact
behind /predict with request coalescing — responses must match the
in-process ServingModule exactly."""

import http.client
import io
import json
import threading

import numpy as np
import pytest

from video_learning_tpu import run_task


@pytest.fixture(scope="module")
def served_artifact(tmp_path_factory):
    """Train a tiny run, export a 2-item artifact, start the server.

    Yields (module, conn_factory, started) where ``module`` is the
    directly-loaded ServingModule for ground truth.
    """
    from PIL import Image

    from tests.conftest import make_image
    from tests.test_train_e2e import _pack, _run_config
    from video_learning_tpu.tools import export_serving as exp_mod
    from video_learning_tpu.tools import serve as serve_mod

    tmp_path = tmp_path_factory.mktemp("servefix")
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
    cfg, _ = _run_config(tmp_path, tree, "train", epochs=2)
    run_task.main(str(cfg))

    artifact = tmp_path / "model.vlx"
    # bucketed artifact: a lone 1-item request routes to the size-1
    # executable instead of padding to capacity
    exp_mod.main([str(cfg), "--out", str(artifact),
                  "--batch-items", "1,2", "--platforms", "cpu"])
    module = exp_mod.load(str(artifact))

    classes = tmp_path / "classes.txt"
    classes.write_text("alpha 0\nbeta 1\ngamma 2\n")

    started = threading.Event()
    t = threading.Thread(
        target=serve_mod.serve,
        args=(str(artifact),),
        kwargs=dict(port=0, classes=str(classes), window_ms=60.0,
                    started=started),
        daemon=True)
    t.start()
    assert started.wait(timeout=120), "server did not start"
    started.artifact = str(artifact)
    host, port = started.addr

    def conn():
        return http.client.HTTPConnection(host, port, timeout=60)

    yield module, conn, started
    started.httpd.shutdown()


def _items(module, n, seed=0):
    rng = np.random.RandomState(seed)
    per = [int(s["shape"][0]) // int(module.meta["batch_items"])
           for s in module.meta["inputs"]]
    return [rng.randint(0, 200, (p * n,) + tuple(s["shape"][1:]))
            .astype(s["dtype"])
            for p, s in zip(per, module.meta["inputs"])]


def _post(conn_factory, body, ctype, path="/predict"):
    c = conn_factory()
    c.request("POST", path, body=body, headers={"Content-Type": ctype})
    r = c.getresponse()
    data = r.read()
    c.close()
    return r.status, data


def test_health_and_meta(served_artifact):
    module, conn, _ = served_artifact
    c = conn()
    c.request("GET", "/healthz")
    r = c.getresponse()
    assert r.status == 200 and r.read() == b"ok"
    c.request("GET", "/meta")
    r = c.getresponse()
    meta = json.loads(r.read())
    c.close()
    assert meta["batch_items"] == module.meta["batch_items"]
    assert meta["server"]["coalesce"] is True
    assert meta["server"]["capacity_items"] == 2


def test_predict_npz_full_batch(served_artifact):
    module, conn, _ = served_artifact
    arrays = _items(module, 2, seed=1)
    direct = module(*arrays)
    buf = io.BytesIO()
    np.savez(buf, **{s["name"]: a
                     for s, a in zip(module.meta["inputs"], arrays)})
    status, data = _post(conn, buf.getvalue(), "application/x-npz")
    assert status == 200, data
    out = np.asarray(json.loads(data)["outputs"])
    np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-5)

    # npz response format
    status, data = _post(conn, buf.getvalue(),
                         "application/x-npz", "/predict?format=npz")
    assert status == 200
    with np.load(io.BytesIO(data)) as z:
        np.testing.assert_allclose(z["outputs"], direct,
                                   rtol=1e-5, atol=1e-5)


def test_predict_json_topk(served_artifact):
    module, conn, _ = served_artifact
    arrays = _items(module, 1, seed=2)
    direct = module(*arrays)
    doc = {"inputs": {s["name"]: a.tolist()
                      for s, a in zip(module.meta["inputs"], arrays)},
           "topk": 2}
    status, data = _post(conn, json.dumps(doc), "application/json")
    assert status == 200, data
    resp = json.loads(data)
    out = np.asarray(resp["outputs"])
    np.testing.assert_allclose(out, direct, rtol=1e-4, atol=1e-4)
    assert len(resp["topk"]) == out.shape[0]
    for row in resp["topk"]:
        assert len(row) == 2
        assert row[0]["prob"] >= row[1]["prob"]
        assert row[0]["class"] in ("alpha", "beta", "gamma")


def test_concurrent_requests_coalesce(served_artifact):
    """Two concurrent single-item requests coalesce into ONE device
    call and each gets its own rows back."""
    module, conn, started = served_artifact
    batcher = started.batcher
    real = batcher.module
    calls = []

    class Counting:
        meta = real.meta

        def __call__(self, *a):
            calls.append(tuple(x.shape[0] for x in a))
            return real(*a)

    a1 = _items(module, 1, seed=3)
    a2 = _items(module, 1, seed=4)
    d1, d2 = module(*a1), module(*a2)

    def req(arrays, out):
        buf = io.BytesIO()
        np.savez(buf, **{s["name"]: a for s, a in
                         zip(module.meta["inputs"], arrays)})
        out.append(_post(conn, buf.getvalue(), "application/x-npz"))

    batcher.module = Counting()
    try:
        r1, r2 = [], []
        t1 = threading.Thread(target=req, args=(a1, r1))
        t2 = threading.Thread(target=req, args=(a2, r2))
        t1.start(); t2.start(); t1.join(); t2.join()
    finally:
        batcher.module = real
    assert r1[0][0] == 200 and r2[0][0] == 200
    o1 = np.asarray(json.loads(r1[0][1])["outputs"])
    o2 = np.asarray(json.loads(r2[0][1])["outputs"])
    # coalesced: one call carrying both items (full leading dims);
    # under scheduling jitter two calls are legal, but every call must
    # stay within capacity
    assert 1 <= len(calls) <= 2
    if len(calls) == 1:
        full = [int(s["shape"][0]) for s in module.meta["inputs"]]
        assert list(calls[0]) == full
    np.testing.assert_allclose(o1, d1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(o2, d2, rtol=1e-5, atol=1e-5)


def test_predict_errors(served_artifact):
    module, conn, _ = served_artifact
    # wrong trailing shape -> 400
    bad = [np.zeros((s["shape"][0], 3), s["dtype"])
           for s in module.meta["inputs"]]
    buf = io.BytesIO()
    np.savez(buf, **{s["name"]: a
                     for s, a in zip(module.meta["inputs"], bad)})
    status, data = _post(conn, buf.getvalue(), "application/x-npz")
    assert status == 400 and b"error" in data
    # over capacity -> 400
    over = _items(module, 3, seed=5)
    buf = io.BytesIO()
    np.savez(buf, **{s["name"]: a
                     for s, a in zip(module.meta["inputs"], over)})
    status, data = _post(conn, buf.getvalue(), "application/x-npz")
    assert status == 400
    # unknown path -> 404
    status, _ = _post(conn, b"{}", "application/json", "/nope")
    assert status == 404
    # malformed json -> 400
    status, _ = _post(conn, b"{not json", "application/json")
    assert status == 400


def test_single_item_routes_to_small_bucket(served_artifact):
    """A lone 1-item request is served by the size-1 bucket (no
    full-capacity padding), and matches the ground-truth module rows."""
    module, conn, started = served_artifact
    arrays = _items(module, 1, seed=9)
    buf = io.BytesIO()
    np.savez(buf, **{s["name"]: a
                     for s, a in zip(module.meta["inputs"], arrays)})
    status, data = _post(conn, buf.getvalue(), "application/x-npz")
    assert status == 200
    got = np.asarray(json.loads(data)["outputs"])
    want = module(*arrays)
    assert module.last_bucket == 1
    # the server's module instance also took the 1-item bucket
    assert started.batcher.module.last_bucket == 1
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert started.batcher.module.meta["buckets"] == [1, 2]


def test_metrics_endpoint(served_artifact):
    """/metrics serves Prometheus-format counters that move with
    traffic: request statuses, items served, device-call buckets."""
    module, conn, started = served_artifact

    def scrape():
        c = conn()
        c.request("GET", "/metrics")
        r = c.getresponse()
        body = r.read().decode()
        c.close()
        assert r.status == 200
        out = {}
        for line in body.splitlines():
            if line.startswith("#") or not line.strip():
                continue
            key, val = line.rsplit(" ", 1)
            out[key] = float(val)
        return out

    before = scrape()
    arrays = _items(module, 2, seed=11)
    buf = io.BytesIO()
    np.savez(buf, **{s["name"]: a
                     for s, a in zip(module.meta["inputs"], arrays)})
    status, _ = _post(conn, buf.getvalue(), "application/x-npz")
    assert status == 200
    # counters are recorded after the response bytes go out (do_POST's
    # finally); give the handler thread a beat to reach it
    import time as time_mod
    k200 = 'vlx_requests_total{status="200"}'
    deadline = time_mod.time() + 5.0
    after = scrape()
    while after.get(k200, 0) < before.get(k200, 0) + 1 and \
            time_mod.time() < deadline:
        time_mod.sleep(0.05)
        after = scrape()
    assert after[k200] == before.get(k200, 0) + 1
    assert after["vlx_items_total"] == before.get("vlx_items_total",
                                                  0) + 2
    assert after["vlx_request_seconds_total"] > \
        before.get("vlx_request_seconds_total", 0)
    assert after['vlx_device_calls_total{bucket="2"}'] >= 1


def test_concurrent_stress_mixed_item_counts(served_artifact):
    """Sustained concurrent load with RANDOM item counts: every response
    must carry exactly its own rows (no cross-request bleed under
    coalescing / overflow re-queueing), and the items counter must add
    up.  This is the failure mode a micro-batcher can silently get
    wrong: misaligned row splits return plausible-looking but foreign
    logits."""
    module, conn, started = served_artifact
    capacity = int(module.meta["batch_items"])
    n_threads, reqs_per_thread = 6, 4
    results = [[] for _ in range(n_threads)]
    expected = [[] for _ in range(n_threads)]

    def client(tid):
        rng = np.random.RandomState(1000 + tid)
        for r in range(reqs_per_thread):
            k = int(rng.randint(1, capacity + 1))
            arrays = _items(module, k, seed=tid * 97 + r)
            expected[tid].append(module(*arrays))
            buf = io.BytesIO()
            np.savez(buf, **{s["name"]: a for s, a in
                             zip(module.meta["inputs"], arrays)})
            status, body = _post(conn, buf.getvalue(),
                                 "application/x-npz")
            assert status == 200, body
            results[tid].append(
                np.asarray(json.loads(body)["outputs"]))

    threads = [threading.Thread(target=client, args=(t,))
               for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "stress client hung"
    for tid in range(n_threads):
        assert len(results[tid]) == reqs_per_thread
        for got, want in zip(results[tid], expected[tid]):
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sigterm_drains_server(tmp_path):
    """SIGTERM stops the accept loop and serve() returns after draining
    (the deployment-side preemption story)."""
    import signal
    import time as time_mod

    from video_learning_tpu.tools import serve as serve_mod

    # reuse the already-exported artifact from the module fixture is not
    # possible here (its server owns it); spin a minimal fake module
    class FakeModule:
        meta = {"batch_items": 1,
                "inputs": [{"name": "x", "shape": [1, 4],
                            "dtype": "float32"}],
                "quantize": None, "mesh": None}

        def __call__(self, *arrays):
            return np.zeros((1, 3), np.float32)

    import video_learning_tpu.tools.export_serving as exp_mod
    orig_load = exp_mod.load
    exp_mod.load = lambda path: FakeModule()
    started = threading.Event()
    done = []
    main = threading.Thread(
        target=lambda: (serve_mod.serve("fake.vlx", port=0,
                                        started=started),
                        done.append(True)))
    try:
        main.start()
        assert started.wait(timeout=60)
        # handler installation is skipped off the main thread; drive the
        # same path the signal would take
        threading.Thread(target=started.httpd.shutdown,
                         daemon=True).start()
        main.join(timeout=60)
        assert done, "serve() did not return after shutdown"
    finally:
        exp_mod.load = orig_load
        if main.is_alive():
            started.httpd.shutdown()


def test_request_timeout_returns_503():
    """--request-timeout-s: a wedged device call answers 503 instead of
    hanging the client (the environment's own tunnel-stall story)."""
    from video_learning_tpu.tools.serve import Batcher

    block = threading.Event()

    class SlowModule:
        meta = {"batch_items": 2,
                "inputs": [{"name": "x", "shape": [2, 4],
                            "dtype": "float32"}]}
        calls = [0]

        def __call__(self, *arrays):
            self.calls[0] += 1
            if self.calls[0] > 1:       # warm-up call passes through
                block.wait(10.0)
            return np.zeros((arrays[0].shape[0], 3), np.float32)

    b = Batcher(SlowModule(), window_s=0.001, request_timeout_s=0.2)
    try:
        with pytest.raises(TimeoutError, match="timed out"):
            b.run([np.zeros((1, 4), np.float32)])
        # pile more requests behind the wedged call; they also time out
        # and must NOT be replayed once the device recovers
        results = []

        def req():
            try:
                b.run([np.zeros((1, 4), np.float32)])
                results.append("ok")
            except TimeoutError:
                results.append("timeout")
        stale = [threading.Thread(target=req) for _ in range(2)]
        for t in stale:
            t.start()
        for t in stale:
            t.join()
        assert results == ["timeout", "timeout"]
    finally:
        block.set()                     # release the worker thread
    calls_after_recovery = SlowModule.calls[0]
    fresh = b.run([np.zeros((1, 4), np.float32)])
    assert fresh.shape == (1, 3)
    # warm-up + wedged call + this fresh one; the two abandoned queue
    # entries were skipped, not replayed as device calls
    assert SlowModule.calls[0] == calls_after_recovery + 1


def test_selftest_loadgen(served_artifact):
    """tools/serve --selftest: loopback load generation reports sustained
    RPS and p50/p99 per request size (the HTTP-tier numbers bench.py's
    device-call measurements exclude)."""
    from video_learning_tpu.tools import serve as serve_mod

    _, _, started = served_artifact
    rows = serve_mod.selftest(started.artifact, item_counts=(1, 2, 99),
                              duration_s=1.5, concurrency=3,
                              window_ms=5.0)
    assert [r["items_per_request"] for r in rows] == [1, 2, 2]  # 99 clamped
    for r in rows:
        assert r["errors"] == 0
        assert r["requests"] > 0 and r["rps"] > 0
        assert r["p50_ms"] > 0 and r["p99_ms"] >= r["p50_ms"]
