"""Serving example driver: start tools/serve on an exported ``.vlx``
artifact (blocking, on the main thread — the production shape, so the
SIGTERM handler installs), POST a single-item request from a client
thread (which routes to the small batch bucket), print the top-k
response and the Prometheus counters, then drain with SIGTERM.

Usage: python query_server.py <model.vlx>
(normally invoked by run_serving.sh after export)
"""

import http.client
import io
import json
import os
import signal
import sys
import threading

import numpy as np


def client(started, meta):
    if not started.wait(timeout=300):
        os._exit(2)
    host, port = started.addr
    print("Serving on http://%s:%d" % (host, port))

    # one ITEM: per-item row counts come from the largest bucket's specs
    cap = int(meta["batch_items"])
    rng = np.random.RandomState(0)
    arrays = {
        s["name"]: rng.randint(
            0, 256, (int(s["shape"][0]) // cap,) + tuple(s["shape"][1:])
        ).astype(s["dtype"])
        for s in meta["inputs"]
    }
    buf = io.BytesIO()
    np.savez(buf, **arrays)

    conn = http.client.HTTPConnection(host, port, timeout=300)
    conn.request("POST", "/predict", body=buf.getvalue(),
                 headers={"Content-Type": "application/x-npz"})
    resp = conn.getresponse()
    doc = json.loads(resp.read())
    print("POST /predict -> %d" % resp.status)
    if "captions" in doc:
        print("captions:", doc["captions"])
    else:
        logits = np.asarray(doc["outputs"])
        print("logits shape: %s, argmax: %s"
              % (logits.shape, logits.argmax(-1).tolist()))

    conn.request("GET", "/metrics")
    resp = conn.getresponse()
    print("GET /metrics ->\n" + resp.read().decode().strip())
    conn.close()

    # graceful drain: serve()'s SIGTERM handler stops the accept loop;
    # serve() returns on the main thread once in-flight requests finish
    os.kill(os.getpid(), signal.SIGTERM)


def main(artifact):
    from video_learning_tpu.tools import export_serving as exp_mod
    from video_learning_tpu.tools import serve as serve_mod

    meta = exp_mod.load(artifact).meta
    print("Artifact: buckets=%s, inputs=%s"
          % (meta.get("buckets"), [i["name"] for i in meta["inputs"]]))

    started = threading.Event()
    t = threading.Thread(target=client, args=(started, meta),
                         daemon=True)
    t.start()
    serve_mod.serve(artifact, port=0, window_ms=3.0,
                    request_timeout_s=120.0, started=started)
    t.join(timeout=60)
    print("Server drained after SIGTERM. Serving example complete.")


if __name__ == "__main__":
    main(sys.argv[1])
