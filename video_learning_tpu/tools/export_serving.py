"""AOT serving export: compile a trained checkpoint into a
self-contained, parameter-baked StableHLO artifact (jax.export).

The reference framework (and ``tools/infer`` here) serves by rebuilding
the model in-process from config + checkpoint.  For production serving
on TPU, that couples deployment to the full framework and to trace-time
Python; this tool instead AOT-exports the EXACT production forward —
the fused device preprocessing (uint8 frames -> crop/mean/mirror on
chip) + the model DAG at train=False, with the optional w8a8 int8
quantization and the parameters CLOSED OVER as constants — into one
portable artifact that any JAX process (no framework, no config, no
checkpoint) can deserialize and call:

  python -m video_learning_tpu.tools.export_serving run_config.yml \
      --checkpoint latest --out model.vlx \
      [--batch-items 8] [--fpc N] [--cpv N] [--int8] \
      [--platforms cpu,tpu] [--workdir DIR]

  # consumer side (only jax required):
  from video_learning_tpu.tools.export_serving import load
  serving = load("model.vlx")
  logits = serving(frames_uint8, proc_params)   # names/shapes in .meta

The exported signature is the framework's own val-feed layout, captured
from a REAL packed batch (a synthesized dummy batch of the configured
geometry travels the production serialize -> feed -> pad chain), so the
artifact can never drift from what the framework's feeder produces.
Captioning pipelines export the on-device greedy/beam decode (the
embedding matrix is baked in as a constant): the artifact returns
(B, T) int32 word indices and records the vocabulary in ``meta.json``
— ``ServingModule.captions(...)`` maps them to trimmed strings.

Artifact format ``.vlx``: a zip holding ``forward.bin`` (the serialized
jax.export Exported) and ``meta.json`` (positional input names, shapes,
dtypes, batch geometry, num_classes, quantize mode, platforms, creation
provenance).

Note on cross-platform exports: platform-adaptive op forms (the
band-matmul vs sliding LRN in models/layers) specialize at TRACE time
from the exporting host's backend.  An artifact lowered for TPU from a
CPU-only host is numerically correct on TPU but carries the CPU-chosen
LRN form; export on a TPU host for the measured peak-perf lowering
(meta.json records ``trace_platform`` so this is auditable).
"""

import argparse
import json
import os
import shutil
import tempfile
import zipfile

import numpy as np

from video_learning_tpu.utils import (ensure_console_logging, error, info,
                                      warning)

_FORWARD_NAME = "forward.bin"
_META_NAME = "meta.json"


# ----------------------------------------------------------------- export
def _dummy_media(workdir, dcfg, kind, fpc, cpv, n_items):
    """Synthesize ``n_items`` dummy media items at the config's raw
    geometry — only their SHAPES matter (they define the exported
    signature); the packed bytes are never baked into the artifact.
    Video folders carry enough frames for the clip sampler to draw
    ``cpv`` distinct clips."""
    from PIL import Image
    from video_learning_tpu.parse_opts import parse_seq

    raw_shape = dcfg.get("raw_image_shape") or dcfg.get("image_shape")
    if raw_shape is None:
        error("Config dataset needs raw_image_shape or image_shape to "
              "synthesize the export signature batch")
    h, w = [int(v) for v in parse_seq(str(raw_shape))[:2]]
    rng = np.random.RandomState(0)
    fpc = max(fpc or 1, 1)
    n_frames = fpc * (max(cpv or 1, 1) + 1)
    media = []
    for i in range(n_items):
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        if kind == "video":
            vdir = os.path.join(workdir, "export_vid%d" % i)
            os.makedirs(vdir, exist_ok=True)
            for f in range(n_frames):
                Image.fromarray(img).save(
                    os.path.join(vdir, "f_%04d.jpg" % f), quality=95)
            media.append(vdir)
        else:
            p = os.path.join(workdir, "export_im%d.jpg" % i)
            Image.fromarray(img).save(p, quality=95)
            media.append(p)
    return media


def export(config_file, out, checkpoint="latest", batch_items=None,
           fpc=None, cpv=None, workdir=None, int8=False, platforms=None,
           mesh_shape=None, use_ema=False):
    """Export the serving forward; returns the meta dict.

    ``mesh_shape`` ({"data": N, "model": M}) exports a MULTI-DEVICE
    artifact: visual inputs annotated batch-sharded over the data axis,
    output replicated, GSPMD partitioning baked into the StableHLO — the
    consumer calls it on any same-shape mesh (the loader rebuilds the
    mesh and places inputs; see ServingModule).

    ``batch_items`` may be a LIST of sizes (e.g. [1, 8, 32]): the same
    forward is exported once per size into one artifact and the loader
    routes each call to the smallest bucket that fits — static XLA
    shapes (one compiled program per bucket, TPU-right) without making
    a single request pay full-capacity latency."""
    import jax
    from jax import export as jax_export

    from video_learning_tpu import run_task
    from video_learning_tpu.batching import BatchGeometry
    from video_learning_tpu.tools.infer import (_main_dataset_cfg,
                                                _training_fpc_cpv,
                                                build_serving_context)
    import yaml

    owns_workdir = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix="vlt_export_")
    os.makedirs(workdir, exist_ok=True)
    try:
        with open(config_file) as f:
            docs = yaml.safe_load(f)
        if "run" not in docs:
            error("Config %s has no run: document" % config_file)
        if mesh_shape:
            # the serving mesh overrides the training config's; the
            # Validation built below then jits over it
            docs = dict(docs)
            docs["run"] = dict(docs["run"])
            docs["run"]["mesh_shape"] = dict(mesh_shape)
            config_file = os.path.join(workdir, "export_src.yml")
            with open(config_file, "w") as f:
                yaml.safe_dump(docs, f)
        _, dcfg = _main_dataset_cfg(docs["run"])
        size_file = str(dcfg.get("data_path")) + ".tfrecord.size"
        t_fpc, t_cpv = _training_fpc_cpv(size_file)
        kind = "video" if (fpc or t_fpc or 0) > 1 or (cpv or 0) > 0 \
            else "image"
        use_fpc = fpc or t_fpc

        buckets = sorted(set(int(b) for b in batch_items)) \
            if isinstance(batch_items, (list, tuple)) else \
            [int(batch_items or 8)]
        if not buckets:
            error("batch_items needs at least one batch size")
        if buckets[0] < 1:
            error("batch sizes must be >= 1 (got %s)" % buckets)
        batch_items = buckets[-1]
        media = _dummy_media(workdir, dcfg, kind, use_fpc,
                             cpv or t_cpv, batch_items)
        settings, feeder, model, params, val, kind = \
            build_serving_context(config_file, media, checkpoint,
                                  fpc, cpv, workdir,
                                  batch_size=batch_items, int8=int8,
                                  use_ema=use_ema)
        is_caption = model.caption_dataset is not None
        if int8 == "static":
            warning("int8-static export calibrates activation scales on "
                    "the synthetic signature batch; for production-"
                    "fidelity scales validate with tools/infer "
                    "--int8-static on representative media")

        # one REAL batch through the production chain fixes the
        # exported signature (shapes, dtypes, key order)
        geometry = BatchGeometry()
        if not feeder.loop():
            error("Internal: export signature batch produced no feed")
        feed, batches = feeder.get_feed(model.required_input)
        feed = run_task._prepare_feed(feed, batches, model)
        feed, _, _ = geometry.pad_feed(feed)

        # captioners export the DECODE: the greedy/beam feedback search
        # runs on-device (embedding matrix baked in); the artifact
        # returns (B, T) int32 word indices and carries the vocabulary
        # in meta for the host-side index->word mapping
        serve, names, specs = val.build_serving_fn(params, feed,
                                                   decode=is_caption)
        jit_kw = {}
        if val.mesh.size > 1:
            from video_learning_tpu.parallel import mesh as mesh_mod
            jit_kw["in_shardings"] = \
                [mesh_mod.data_sharding(val.mesh)] * len(specs)
            jit_kw["out_shardings"] = mesh_mod.replicated(val.mesh)
        plats = [p.strip() for p in (platforms or "cpu,tpu").split(",")
                 if p.strip()]
        try:
            exported = jax_export.export(jax.jit(serve, **jit_kw),
                                         platforms=plats)(*specs)
        except Exception as e:  # noqa: BLE001 — cross-lowering varies
            if plats == ["cpu"]:
                raise
            info("Multi-platform lowering failed (%s); retrying for "
                 "the current platform only" % e)
            plats = [jax.default_backend()]
            exported = jax_export.export(jax.jit(serve, **jit_kw),
                                         platforms=plats)(*specs)
        blob = exported.serialize()

        # smaller buckets: the SAME forward at scaled leading dims (all
        # feed rows are proportional to the item count)
        data_par = int(val.mesh.shape["data"]) if val.mesh.size > 1 else 1
        bucket_blobs = {}
        for b in buckets[:-1]:
            specs_b = []
            for s in specs:
                rows = int(s.shape[0])
                if rows % batch_items:
                    error("Input rows (%d) are not a multiple of the "
                          "batch item count (%d); bucketed export needs "
                          "uniform per-item geometry"
                          % (rows, batch_items))
                rows_b = rows // batch_items * b
                if rows_b % data_par:
                    error("Bucket %d gives %d input rows, not divisible "
                          "by the mesh data axis (%d); choose bucket "
                          "sizes that shard evenly" % (b, rows_b,
                                                       data_par))
                specs_b.append(jax.ShapeDtypeStruct(
                    (rows_b,) + tuple(s.shape[1:]), s.dtype))
            bucket_blobs[b] = jax_export.export(
                jax.jit(serve, **jit_kw),
                platforms=plats)(*specs_b).serialize()

        if is_caption:
            dset = model.caption_dataset
            cap_opts = settings.captioning
            output = {
                "kind": "token_ids",
                "vocabulary": list(dset.vocabulary),
                "max_caption_length": int(dset.max_caption_length),
                "caption_search": (str(cap_opts.caption_search)
                                   if cap_opts else "max"),
            }
        else:
            output = {"kind": "logits",
                      "num_classes": int(settings.num_classes)}
        meta = {
            "format": "vlx-1" if len(buckets) == 1 else "vlx-2",
            "inputs": [{"name": n,
                        "shape": list(map(int, specs[i].shape)),
                        "dtype": str(np.dtype(specs[i].dtype))}
                       for i, n in enumerate(names)],
            "output": output,
            "batch_items": int(batch_items),
            "buckets": [int(b) for b in buckets],
            "frames_per_clip": int(use_fpc or 1),
            "clips_per_item": int(cpv or t_cpv or 1),
            "quantize": (("int8_static" if int8 == "static" else "int8")
                         if int8 else None),
            "ema": bool(getattr(settings, "serving_ema", False)),
            "mesh": ({"data": int(val.mesh.shape["data"]),
                      "model": int(val.mesh.shape["model"])}
                     if val.mesh.size > 1 else None),
            "platforms": plats,
            "trace_platform": jax.default_backend(),
            "jax_version": jax.__version__,
            "run_id": str(settings.run_id),
        }
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr(_FORWARD_NAME, blob)
            for b, bb in bucket_blobs.items():
                z.writestr("forward_%d.bin" % b, bb)
            z.writestr(_META_NAME, json.dumps(meta, indent=1))
        info("Exported serving artifact: %s (%.1f MB, platforms=%s, "
             "buckets=%s, inputs=%s)"
             % (out, os.path.getsize(out) / 1e6, ",".join(plats),
                buckets, names))
        return meta
    finally:
        if owns_workdir:
            shutil.rmtree(workdir, ignore_errors=True)


# ------------------------------------------------------------------- load
class ServingModule:
    """A deserialized serving artifact: call with the positional arrays
    described by ``.meta['inputs']`` (a short batch is zero-padded to the
    exported geometry and the padding rows dropped from the output).

    Bucketed artifacts (``meta['buckets']``, vlx-2) hold the same
    forward at several static batch sizes; each call routes to the
    smallest bucket that fits, so a single-item request pays
    single-item latency instead of full-capacity padding
    (``.last_bucket`` records the choice).

    Multi-device artifacts (``meta['mesh']``) rebuild a same-shape mesh
    from ``jax.devices()`` at load time and shard inputs over its data
    axis before the call — the consumer just needs >= the exported
    device count visible."""

    def __init__(self, exported, meta, bucket_exports=None):
        self._exported = exported
        self.meta = meta
        # ascending (bucket, exported); the meta['inputs'] specs always
        # describe the LARGEST bucket
        cap = int(meta["batch_items"])
        self._buckets = sorted((bucket_exports or {}).items())
        self._buckets.append((cap, exported))
        self.last_bucket = None
        self._in_sharding = None
        if meta.get("mesh"):
            import jax
            from jax.sharding import (Mesh, NamedSharding,
                                      PartitionSpec as P)
            shape = meta["mesh"]
            need = int(shape["data"]) * int(shape["model"])
            if len(jax.devices()) < need:
                error("Artifact was exported for a %dx%d device mesh; "
                      "only %d devices visible"
                      % (shape["data"], shape["model"],
                         len(jax.devices())))
            mesh = Mesh(np.asarray(jax.devices()[:need]).reshape(
                int(shape["data"]), int(shape["model"])),
                ("data", "model"))
            self._in_sharding = NamedSharding(mesh, P("data"))

    def __call__(self, *arrays):
        ins = self.meta["inputs"]
        cap = int(self.meta["batch_items"])
        if len(arrays) != len(ins):
            error("Serving artifact takes %d inputs %s; got %d"
                  % (len(ins), [i["name"] for i in ins], len(arrays)))
        # validate + establish the shared batch fraction vs the largest
        # bucket's specs
        frac = None
        arrays = [np.asarray(a, dtype=s["dtype"])
                  for a, s in zip(arrays, ins)]
        for a, spec in zip(arrays, ins):
            want = tuple(spec["shape"])
            if a.shape == want:
                f = 1.0
            else:
                if a.shape[1:] != want[1:] or a.shape[0] > want[0]:
                    error("Input %s expects shape %s (leading dim may "
                          "be smaller); got %s"
                          % (spec["name"], want, a.shape))
                f = a.shape[0] / want[0]
            if frac is None:
                frac = f
            elif abs(f - frac) > 1e-9:
                error("Inconsistent partial batch across inputs")
        # smallest bucket that fits (bucket rows are per-item multiples,
        # so b/cap >= frac <=> every input fits in bucket b)
        bucket, exported = next(
            ((b, e) for b, e in self._buckets
             if b + 1e-9 >= frac * cap), self._buckets[-1])
        self.last_bucket = bucket
        rows = None
        padded = []
        for a, spec in zip(arrays, ins):
            want_rows = int(spec["shape"][0]) * bucket // cap
            if a.shape[0] != want_rows:
                if rows is None:
                    rows = a.shape[0] / want_rows
                pad = [(0, want_rows - a.shape[0])] + \
                    [(0, 0)] * (a.ndim - 1)
                a = np.pad(a, pad)
            padded.append(a)
        if self._in_sharding is not None:
            import jax
            padded = [jax.device_put(a, self._in_sharding)
                      for a in padded]
        out = np.asarray(exported.call(*padded))
        if rows is not None:
            out = out[:max(int(round(out.shape[0] * rows)), 1)]
        return out

    def captions_from_ids(self, rows):
        """Map decoded (B, T) word-index rows to trimmed strings via the
        framework's own EOS-trim + join conventions (data/captions
        trim_at_eos / validation_logits_to_captions — reference
        val.py:36-46), so artifact captions can never drift from
        tools/infer's."""
        from video_learning_tpu.data.captions import trim_at_eos
        out = self.meta["output"]
        if out.get("kind") != "token_ids":
            error("Not a caption artifact (output kind %r)"
                  % out.get("kind"))
        vocab = out["vocabulary"]
        cap = int(out["max_caption_length"])
        texts = []
        for row in np.asarray(rows):
            words = [vocab[i] for i in trim_at_eos(row, vocab, cap)]
            texts.append(" ".join(words) if words else " ")
        return texts

    def captions(self, *arrays):
        """Caption artifacts: run the on-device decode, return trimmed
        caption strings (one per item)."""
        return self.captions_from_ids(self(*arrays))

    def warmup(self):
        """Run zeros through EVERY bucket (executable load/compile is
        lazy per bucket); returns the largest bucket's output."""
        ins = self.meta["inputs"]
        cap = int(self.meta["batch_items"])
        out = None
        for b, _ in self._buckets:
            zeros = [np.zeros((int(s["shape"][0]) * b // cap,)
                              + tuple(s["shape"][1:]), s["dtype"])
                     for s in ins]
            out = self(*zeros)
        return out


def load(path):
    """Load a ``.vlx`` artifact (only jax + numpy needed)."""
    from jax import export as jax_export
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read(_META_NAME).decode("utf-8"))
        exported = jax_export.deserialize(bytearray(z.read(_FORWARD_NAME)))
        buckets = {}
        for b in meta.get("buckets", []):
            name = "forward_%d.bin" % b
            if name in z.namelist():
                buckets[int(b)] = jax_export.deserialize(
                    bytearray(z.read(name)))
    return ServingModule(exported, meta, bucket_exports=buckets)


def main(argv=None):
    ensure_console_logging()
    parser = argparse.ArgumentParser(
        description="AOT-export a trained checkpoint as a self-contained "
                    "serving artifact (StableHLO via jax.export).")
    parser.add_argument("config", help="the run's YAML config")
    parser.add_argument("--out", required=True, help="output .vlx path")
    parser.add_argument("--checkpoint", default="latest",
                        help="'latest', a checkpoint path, or 'none'")
    parser.add_argument("--batch-items", default="8",
                        help="exported (static) batch size in items; a "
                             "comma list (e.g. 1,8,32) exports bucketed "
                             "executables and calls route to the "
                             "smallest fitting bucket")
    parser.add_argument("--fpc", type=int,
                        help="frames per clip (default: training .size)")
    parser.add_argument("--cpv", type=int, help="clips per item")
    parser.add_argument("--int8", action="store_true",
                        help="bake the w8a8-quantized serving forward")
    parser.add_argument("--int8-static", action="store_true",
                        help="int8 with static activation scales "
                             "calibrated on the export signature batch "
                             "(no per-batch amax in the artifact)")
    parser.add_argument("--ema", action="store_true",
                        help="bake the EMA shadow weights from an "
                             "ema_decay training run")
    parser.add_argument("--platforms", default="cpu,tpu",
                        help="comma-separated lowering targets")
    parser.add_argument("--mesh",
                        help="export a multi-device artifact, e.g. "
                             "'data=4,model=2' (GSPMD partitioning "
                             "baked into the StableHLO)")
    parser.add_argument("--workdir",
                        help="keep the signature-batch workdir here")
    parser.add_argument("--selftest", action="store_true",
                        help="reload the artifact and run zeros through "
                             "it after exporting")
    args = parser.parse_args(argv)
    mesh_shape = None
    if args.mesh:
        try:
            mesh_shape = {k.strip(): int(v) for k, v in
                          (kv.split("=") for kv in args.mesh.split(","))}
        except ValueError:
            error("--mesh expects 'data=N[,model=M]'; got %r" % args.mesh)
    try:
        batch_items = [int(b) for b in
                       str(args.batch_items).split(",") if b.strip()]
    except ValueError:
        error("--batch-items expects an int or comma list; got %r"
              % args.batch_items)
    if len(batch_items) == 1:
        batch_items = batch_items[0]
    int8 = "static" if args.int8_static else args.int8
    meta = export(args.config, args.out, checkpoint=args.checkpoint,
                  batch_items=batch_items, fpc=args.fpc,
                  cpv=args.cpv, workdir=args.workdir, int8=int8,
                  platforms=args.platforms, mesh_shape=mesh_shape,
                  use_ema=args.ema)
    if args.selftest:
        serving = load(args.out)
        zeros = [np.zeros(i["shape"], i["dtype"])
                 for i in serving.meta["inputs"]]
        out = serving(*zeros)
        info("Selftest OK: output %s %s" % (out.shape, out.dtype))
    return meta


if __name__ == "__main__":
    main()
