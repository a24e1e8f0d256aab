"""HTTP serving server over an AOT-exported ``.vlx`` artifact.

Completes the deployment chain (reference parity context: the reference
framework stops at offline validation, ``val.py``; this framework adds
``tools/infer`` for raw media and ``tools/export_serving`` for AOT
artifacts — this server is the final tier, putting an exported artifact
behind a network endpoint with TPU-shaped request coalescing):

  python -m video_learning_tpu.tools.serve model.vlx --port 8000 \
      [--classes map.txt] [--window-ms 3] [--no-batch] \
      [--request-timeout-s 30]

The exported forward has a STATIC batch (XLA static shapes — the right
trade on TPU: one compiled program, MXU-sized batches).  Production
traffic is mostly single items, so the server bridges the two with a
micro-batcher: concurrent requests arriving within a short window are
coalesced into one device call up to the exported capacity, then the
output rows are split back per request.  A lone request still runs
immediately after the window (bounded tail latency); the artifact's own
zero-padding covers the remainder of the batch.

Endpoints (stdlib http.server; no framework needed on the consumer —
the module loads with jax + numpy only):

  GET  /healthz        -> 200 "ok" once the warm-up call has finished
  GET  /meta           -> the artifact's meta.json (+ server settings)
  GET  /metrics        -> Prometheus text exposition: request counts by
                          status, items served, request latency sum,
                          device calls by bucket, coalesced batches
  POST /predict        -> run the forward
      JSON body: {"inputs": {name: nested-list, ...}} or
                 {"inputs": [nested-list, ...]} (positional), optional
                 "topk": N -> adds per-item {"class","prob"} lists
                 (softmax over logits; --classes names them).
      NPZ body (content-type application/x-npz or octet-stream):
                 numpy .npz keyed by input name (or arr_0, arr_1, ...);
                 respond JSON, or .npz with ?format=npz.

Each request carries 1..batch_items ITEMS (leading dims must be whole
multiples of the per-item row counts in ``meta['inputs']``; partial
clips cannot be split across devices or fused correctly downstream).
"""

import argparse
import io
import json
import os
import queue
import threading
import time
import zipfile

import numpy as np

from video_learning_tpu.utils import ensure_console_logging, error, info

# --------------------------------------------------------------- metrics


class Stats:
    """Thread-safe serving counters, exposed at /metrics in Prometheus
    text exposition format (scrape-ready; no client library needed)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests = {}          # status code -> count
        self.items = 0              # items served (2xx only)
        self.request_seconds = 0.0  # summed request wall time
        self.device_calls = {}      # bucket (batch items) -> count
        self.coalesced = 0          # device calls serving >1 request

    def request(self, status, seconds, items=0):
        with self._lock:
            self.requests[status] = self.requests.get(status, 0) + 1
            self.request_seconds += seconds
            if 200 <= status < 300:
                self.items += items

    def device_call(self, bucket, requests_in_batch):
        with self._lock:
            self.device_calls[bucket] = \
                self.device_calls.get(bucket, 0) + 1
            if requests_in_batch > 1:
                self.coalesced += 1

    def render(self):
        with self._lock:
            lines = [
                "# TYPE vlx_requests_total counter",
                *("vlx_requests_total{status=\"%d\"} %d" % (s, c)
                  for s, c in sorted(self.requests.items())),
                "# TYPE vlx_items_total counter",
                "vlx_items_total %d" % self.items,
                "# TYPE vlx_request_seconds_total counter",
                "vlx_request_seconds_total %.6f" % self.request_seconds,
                "# TYPE vlx_device_calls_total counter",
                *("vlx_device_calls_total{bucket=\"%d\"} %d" % (b, c)
                  for b, c in sorted(self.device_calls.items())),
                "# TYPE vlx_coalesced_batches_total counter",
                "vlx_coalesced_batches_total %d" % self.coalesced,
            ]
        return ("\n".join(lines) + "\n").encode("utf-8")


# --------------------------------------------------------------- batcher


class _Pending:
    __slots__ = ("arrays", "items", "event", "result", "err",
                 "abandoned")

    def __init__(self, arrays, items):
        self.arrays = arrays
        self.items = items
        self.event = threading.Event()
        self.result = None
        self.err = None
        self.abandoned = False     # waiter gave up (request timeout)


class Batcher:
    """Coalesce concurrent requests into single device calls.

    All module calls happen on the one worker thread (the exported
    callable is only ever entered serially).  ``window_s`` bounds how
    long the first request of a batch waits for company.
    """

    def __init__(self, module, window_s=0.003, coalesce=True, stats=None,
                 request_timeout_s=None):
        self.module = module
        self.stats = stats or Stats()
        self.window_s = float(window_s)
        # deadline for a coalesced request to get its result back; a
        # wedged accelerator then answers 503 instead of hanging every
        # client (the worker thread may still be stuck inside the device
        # RPC — results completing after the deadline are discarded)
        self.request_timeout_s = (float(request_timeout_s)
                                  if request_timeout_s else None)
        meta = module.meta
        self.capacity = int(meta["batch_items"])
        ins = meta["inputs"]
        self.per_item = []
        for spec in ins:
            rows = int(spec["shape"][0])
            if rows % self.capacity:
                # row count not divisible by items: no per-item split
                coalesce = False
                break
            self.per_item.append(rows // self.capacity)
        # warm-up: run every bucket once (executable load is lazy per
        # bucket) — the largest call also measures the output rows per
        # item for result splitting
        if hasattr(module, "warmup"):
            out = module.warmup()
        else:
            zeros = [np.zeros(i["shape"], i["dtype"]) for i in ins]
            out = module(*zeros)
        self.out_shape = out.shape
        if out.shape[0] % self.capacity:
            coalesce = False
        self.out_per_item = (out.shape[0] // self.capacity
                             if not out.shape[0] % self.capacity else None)
        self.coalesce = bool(coalesce)
        self._q = queue.Queue()
        self._lock = threading.Lock()  # no-coalesce fallback path
        if self.coalesce:
            t = threading.Thread(target=self._worker, daemon=True,
                                 name="vlx-batcher")
            t.start()

    # ---- request-side API
    def items_of(self, arrays):
        """Validate leading dims; return the request's item count."""
        ins = self.module.meta["inputs"]
        if len(arrays) != len(ins):
            raise ValueError("expected %d inputs %s; got %d"
                             % (len(ins), [i["name"] for i in ins],
                                len(arrays)))
        if not self.coalesce:
            return None
        k = None
        for a, per, spec in zip(arrays, self.per_item, ins):
            if a.shape[1:] != tuple(spec["shape"][1:]):
                raise ValueError(
                    "input %s expects trailing shape %s; got %s"
                    % (spec["name"], tuple(spec["shape"][1:]), a.shape))
            if a.shape[0] % per:
                raise ValueError(
                    "input %s rows (%d) must be a multiple of the "
                    "per-item row count %d"
                    % (spec["name"], a.shape[0], per))
            ak = a.shape[0] // per
            if k is None:
                k = ak
            elif ak != k:
                raise ValueError("inconsistent item count across inputs "
                                 "(%d vs %d)" % (ak, k))
        if not 1 <= k <= self.capacity:
            raise ValueError("request carries %d items; the artifact "
                             "serves 1..%d per call" % (k, self.capacity))
        return k

    def run(self, arrays):
        """Run one request's arrays through the module; returns the
        output rows belonging to this request."""
        k = self.items_of(arrays)
        if not self.coalesce:
            # the deadline also covers waiting on the serialization lock
            # (a wedged call holds it); the thread already inside the
            # device RPC itself cannot be interrupted
            if not self._lock.acquire(
                    timeout=self.request_timeout_s or -1):
                raise TimeoutError(
                    "request timed out after %.1fs waiting for the "
                    "device" % self.request_timeout_s)
            try:
                out = self.module(*arrays)
                self.stats.device_call(
                    getattr(self.module, "last_bucket", None)
                    or self.capacity, 1)
                return out
            finally:
                self._lock.release()
        p = _Pending(arrays, k)
        self._q.put(p)
        if not p.event.wait(timeout=self.request_timeout_s):
            # leave a tombstone: the worker skips abandoned entries so a
            # recovered device doesn't replay the timed-out backlog
            # ahead of live traffic
            p.abandoned = True
            raise TimeoutError(
                "request timed out after %.1fs waiting for the device"
                % self.request_timeout_s)
        if p.err is not None:
            raise p.err
        return p.result

    # ---- worker side
    def _worker(self):
        while True:
            first = self._q.get()
            if first.abandoned:
                continue
            batch = [first]
            total = first.items
            t_end = time.monotonic() + self.window_s
            while total < self.capacity:
                remaining = t_end - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt.abandoned:
                    continue
                if total + nxt.items > self.capacity:
                    # would overflow: run it in the next batch
                    self._q.put(nxt)
                    break
                batch.append(nxt)
                total += nxt.items
            try:
                if len(batch) == 1:
                    out = self.module(*batch[0].arrays)
                    batch[0].result = out
                else:
                    joined = [np.concatenate([p.arrays[i] for p in batch])
                              for i in range(len(batch[0].arrays))]
                    out = self.module(*joined)
                    row = 0
                    for p in batch:
                        take = p.items * self.out_per_item
                        p.result = out[row:row + take]
                        row += take
                self.stats.device_call(
                    getattr(self.module, "last_bucket", None)
                    or self.capacity, len(batch))
                for p in batch:
                    p.event.set()
            except Exception as e:  # noqa: BLE001 — surface to waiters
                for p in batch:
                    p.err = e
                    p.event.set()


# ----------------------------------------------------------------- http


def _softmax(x):
    x = np.asarray(x, np.float64)
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def _parse_npz(body):
    with np.load(io.BytesIO(body)) as z:
        return dict(z)


def make_handler(batcher, idx2name):
    from http.server import BaseHTTPRequestHandler

    module = batcher.module
    ins = module.meta["inputs"]
    server_meta = dict(module.meta)
    server_meta["server"] = {
        "coalesce": batcher.coalesce,
        "window_s": batcher.window_s,
        "capacity_items": batcher.capacity,
        "buckets": module.meta.get("buckets",
                                   [int(module.meta["batch_items"])]),
        "output_shape": list(map(int, batcher.out_shape)),
    }

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        # socket timeout: idle keep-alive connections close after this,
        # so the graceful drain (non-daemon threads + block_on_close)
        # can't hang forever on a client that holds its connection open
        timeout = 5

        def log_message(self, fmt, *args):  # route through CustomLogger
            info("serve: %s" % (fmt % args))

        # -- helpers
        def _send(self, code, payload, ctype="application/json"):
            if isinstance(payload, (dict, list)):
                payload = json.dumps(payload).encode("utf-8")
            self._last_status = code
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _fail(self, code, msg):
            self._send(code, {"error": str(msg)})

        # -- routes
        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif path == "/meta":
                self._send(200, server_meta)
            elif path == "/metrics":
                self._send(200, batcher.stats.render(),
                           "text/plain; version=0.0.4")
            else:
                self._fail(404, "unknown path %s" % path)

        def do_POST(self):
            t0 = time.monotonic()
            self._last_status = 500
            self._predict_items = 0
            try:
                self._predict()
            finally:
                batcher.stats.request(self._last_status,
                                      time.monotonic() - t0,
                                      self._predict_items)

        def _predict(self):
            path, _, query = self.path.partition("?")
            if path != "/predict":
                return self._fail(404, "unknown path %s" % path)
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                ctype = (self.headers.get("Content-Type") or "").lower()
                topk = 0
                if "json" in ctype:
                    doc = json.loads(body.decode("utf-8"))
                    given = doc.get("inputs")
                    topk = int(doc.get("topk", 0))
                    if isinstance(given, dict):
                        arrays = [np.asarray(given[s["name"]],
                                             dtype=s["dtype"])
                                  for s in ins]
                    else:
                        arrays = [np.asarray(v, dtype=s["dtype"])
                                  for v, s in zip(given or [], ins)]
                        if len(arrays) != len(ins):
                            raise ValueError(
                                "JSON 'inputs' needs %d entries" % len(ins))
                else:
                    named = _parse_npz(body)
                    if all(s["name"] in named for s in ins):
                        arrays = [np.asarray(named[s["name"]],
                                             dtype=s["dtype"])
                                  for s in ins]
                    else:
                        arrays = [np.asarray(named["arr_%d" % i],
                                             dtype=s["dtype"])
                                  for i, s in enumerate(ins)]
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                return self._fail(400, e)
            try:
                out = batcher.run(arrays)
            except ValueError as e:
                return self._fail(400, e)
            except TimeoutError as e:   # wedged device -> retryable 503
                return self._fail(503, e)
            except Exception as e:  # noqa: BLE001 — device faults -> 500
                return self._fail(500, e)
            if len(batcher.per_item) == len(ins):
                # per-item rows are known whether or not coalescing is
                # active — the items counter must not read 0 under
                # --no-batch
                self._predict_items = \
                    arrays[0].shape[0] // batcher.per_item[0]
            if "format=npz" in query:
                buf = io.BytesIO()
                np.savez(buf, outputs=out)
                return self._send(200, buf.getvalue(),
                                  "application/x-npz")
            doc = {"outputs": np.asarray(out).tolist()}
            if module.meta["output"].get("kind") == "token_ids":
                # caption artifact: decode rows to trimmed strings via
                # the vocabulary the exporter baked into meta
                doc["captions"] = module.captions_from_ids(out)
            if topk and module.meta["output"].get("kind",
                                                  "logits") == "logits":
                probs = _softmax(out)
                k = min(topk, probs.shape[-1])
                order = np.argsort(-probs, axis=-1)[:, :k]
                doc["topk"] = [
                    [{"class": (idx2name.get(int(c), int(c))
                                if idx2name else int(c)),
                      "prob": float(p[c])}
                     for c in row]
                    for row, p in zip(order, probs)]
            return self._send(200, doc)

    return Handler


def serve(artifact, port=8000, host="127.0.0.1", classes=None,
          window_ms=3.0, coalesce=True, started=None,
          request_timeout_s=None):
    """Blocking server loop. ``started`` (optional threading.Event) is
    set with the bound (host, port) once listening — for tests.

    SIGTERM (the cloud scheduler's grace signal) drains gracefully:
    the accept loop stops, in-flight requests finish (non-daemon
    handler threads + block_on_close), then the process exits —
    mirroring run_task's preemption-safe training shutdown."""
    from http.server import ThreadingHTTPServer
    from video_learning_tpu.tools.export_serving import load

    class _Server(ThreadingHTTPServer):
        daemon_threads = False      # wait for in-flight requests
        block_on_close = True

    module = load(artifact)
    idx2name = None
    if classes:
        from video_learning_tpu.tools.combine_logits import load_class_map
        idx2name = load_class_map(classes)[1]
    info("Loaded %s (inputs=%s, batch_items=%s, quantize=%s, mesh=%s); "
         "warming up..."
         % (artifact, [i["name"] for i in module.meta["inputs"]],
            module.meta["batch_items"], module.meta.get("quantize"),
            module.meta.get("mesh")))
    batcher = Batcher(module, window_s=window_ms / 1000.0,
                      coalesce=coalesce,
                      request_timeout_s=request_timeout_s)
    httpd = _Server((host, port), make_handler(batcher, idx2name))
    # graceful drain on the scheduler's grace signal (main thread only;
    # shutdown() must run off-thread — it joins the serve loop we're in)
    import signal
    prev_term = None
    try:
        prev_term = signal.signal(
            signal.SIGTERM,
            lambda signum, frame: threading.Thread(
                target=httpd.shutdown, daemon=True).start())
    except ValueError:
        pass                        # not the main thread (tests)
    info("Serving on http://%s:%d (coalesce=%s, window=%.1fms, "
         "capacity=%d items)" % (httpd.server_address[0],
                                 httpd.server_address[1],
                                 batcher.coalesce, window_ms,
                                 batcher.capacity))
    if started is not None:
        started.addr = httpd.server_address
        started.httpd = httpd
        started.batcher = batcher
        started.set()
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()    # blocks until in-flight requests finish
        if prev_term is not None:
            signal.signal(signal.SIGTERM, prev_term)
        info("Server drained and closed.")
    return httpd


def selftest(artifact, item_counts=(1, 8, 32), duration_s=8.0,
             concurrency=8, window_ms=3.0, classes=None):
    """Loopback load test: start the server in-process on an ephemeral
    port, drive it with closed-loop client threads posting npz bodies,
    and report sustained RPS / items/s / p50 / p99 per request size.

    Measures what bench.py's device-call numbers exclude: request
    parsing, the coalescing window, response encoding and socket
    overhead (docs/SERVING.md "HTTP tier").  Items beyond the artifact's
    batch capacity are clamped (a request cannot exceed one batch)."""
    import http.client

    from video_learning_tpu.tools.export_serving import load

    module = load(artifact)
    capacity = int(module.meta["batch_items"])
    per = [int(s["shape"][0]) // capacity for s in module.meta["inputs"]]

    def body_for(n):
        rng = np.random.RandomState(n)
        arrays = {s["name"]: rng.randint(
            0, 200, (p * n,) + tuple(s["shape"][1:])).astype(s["dtype"])
            for p, s in zip(per, module.meta["inputs"])}
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        return buf.getvalue()

    started = threading.Event()
    server_thread = threading.Thread(
        target=serve, args=(artifact,),
        kwargs=dict(port=0, classes=classes, window_ms=window_ms,
                    started=started),
        daemon=True)
    server_thread.start()
    if not started.wait(timeout=300):
        error("selftest server did not start")
    host, port = started.addr

    results = []
    for n in item_counts:
        n = min(int(n), capacity)
        body = body_for(n)
        stop_at = [0.0]
        lat, errs = [], [0]
        lock = threading.Lock()

        def client():
            conn = http.client.HTTPConnection(host, port, timeout=120)
            my_lat = []
            while time.monotonic() < stop_at[0]:
                t0 = time.monotonic()
                try:
                    conn.request("POST", "/predict", body=body,
                                 headers={"Content-Type":
                                          "application/x-npz"})
                    r = conn.getresponse()
                    r.read()
                    ok = r.status == 200
                except Exception:
                    ok = False
                    conn.close()
                    conn = http.client.HTTPConnection(host, port,
                                                      timeout=120)
                dt = time.monotonic() - t0
                if ok:
                    my_lat.append(dt)
                else:
                    with lock:
                        errs[0] += 1
            conn.close()
            with lock:
                lat.extend(my_lat)

        # warmup: one request compiles/warms every bucket this size hits
        warm = http.client.HTTPConnection(host, port, timeout=300)
        warm.request("POST", "/predict", body=body,
                     headers={"Content-Type": "application/x-npz"})
        assert warm.getresponse().read() is not None
        warm.close()

        stop_at[0] = time.monotonic() + duration_s
        threads = [threading.Thread(target=client) for _ in
                   range(concurrency)]
        t_start = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = time.monotonic() - t_start
        lat.sort()
        row = {
            "items_per_request": n,
            "concurrency": concurrency,
            "duration_s": round(elapsed, 2),
            "requests": len(lat),
            "errors": errs[0],
            "rps": round(len(lat) / elapsed, 2),
            "items_per_sec": round(len(lat) * n / elapsed, 2),
            "p50_ms": round(1e3 * lat[len(lat) // 2], 2) if lat else None,
            "p99_ms": round(1e3 * lat[int(len(lat) * 0.99)], 2)
            if lat else None,
        }
        results.append(row)
        print(json.dumps(row))
    started.httpd.shutdown()
    server_thread.join(timeout=60)
    return results


def main(argv=None):
    ensure_console_logging()
    parser = argparse.ArgumentParser(
        description="Serve an exported .vlx artifact over HTTP with "
                    "request coalescing.")
    parser.add_argument("artifact", help="path to the .vlx artifact")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--classes", help="'classname index' map file "
                                          "for named top-k responses")
    parser.add_argument("--request-timeout-s", type=float,
                        default=None,
                        help="deadline for a queued request; a "
                             "wedged device answers 503 instead "
                             "of hanging clients")
    parser.add_argument("--window-ms", type=float, default=3.0,
                        help="micro-batch coalescing window")
    parser.add_argument("--no-batch", action="store_true",
                        help="disable coalescing (serialize requests)")
    parser.add_argument("--selftest", action="store_true",
                        help="loopback load test instead of serving: "
                             "prints one JSON line per request size "
                             "with sustained RPS and p50/p99 latency")
    parser.add_argument("--selftest-items", default="1,8,32",
                        help="comma list of items per request")
    parser.add_argument("--selftest-duration-s", type=float, default=8.0)
    parser.add_argument("--selftest-concurrency", type=int, default=8)
    args = parser.parse_args(argv)
    if not (os.path.exists(args.artifact)
            and zipfile.is_zipfile(args.artifact)):
        error("Not a .vlx artifact: %s" % args.artifact)
    if args.selftest:
        selftest(args.artifact,
                 item_counts=[int(x) for x in
                              args.selftest_items.split(",") if x],
                 duration_s=args.selftest_duration_s,
                 concurrency=args.selftest_concurrency,
                 window_ms=args.window_ms, classes=args.classes)
        return
    serve(args.artifact, port=args.port, host=args.host,
          classes=args.classes, window_ms=args.window_ms,
          coalesce=not args.no_batch,
          request_timeout_s=args.request_timeout_s)


if __name__ == "__main__":
    main()
