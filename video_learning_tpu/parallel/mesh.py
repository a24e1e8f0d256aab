"""Device mesh construction for SPMD execution.

The reference framework is strictly single-process / single-device
(SURVEY.md §2 parallelism checklist); the TPU-native design scales through a
``jax.sharding.Mesh`` with a ``data`` axis (batch sharding over ICI) and an
optional ``model`` axis (tensor-parallel sharding of the wide FC / LSTM
kernels).  XLA GSPMD inserts the collectives; nothing here issues explicit
communication.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_learning_tpu.utils import error, info

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_platform():
    """Initialize the JAX backend resiliently.

    The tunnelled TPU plugin in this environment registers its backend
    lazily and intermittently fails; when the configured platform cannot
    initialize, fall back to automatic selection and finally to CPU rather
    than aborting the run.  Returns the list of devices.

    A ``JAX_PLATFORMS`` (or ``VLT_PLATFORM``) environment variable is
    honored explicitly via jax.config — some out-of-tree device plugins
    register themselves regardless of the env var, which would silently
    put a run meant for the host CPU (e.g. the deterministic accuracy
    anchors in BASELINE.md) on the accelerator."""
    import os

    import jax

    forced = os.environ.get("VLT_PLATFORM") or \
        os.environ.get("JAX_PLATFORMS")
    attempts = (forced, "", "cpu") if forced else (None, "", "cpu")
    for attempt, platforms in enumerate(attempts):
        try:
            if platforms is not None:
                jax.config.update("jax_platforms", platforms)
            devices = jax.devices()
            if attempt:
                from video_learning_tpu.utils import warning
                warning("Configured JAX platform unavailable; using %s"
                        % devices[0].platform)
            return devices
        except RuntimeError:
            continue
    error("No JAX backend could be initialized")


def make_mesh(mesh_shape=None, devices=None):
    """Build a Mesh.  mesh_shape: {"data": N, "model": M} (model defaults
    to 1; data defaults to all remaining devices)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mesh_shape = dict(mesh_shape or {})
    model = int(mesh_shape.get(MODEL_AXIS, 1))
    data = int(mesh_shape.get(DATA_AXIS, n // model))
    if data < 1 or model < 1 or data * model > n:
        error("Mesh shape data=%d x model=%d exceeds %d devices"
              % (data, model, n))
    arr = np.asarray(devices[:data * model]).reshape(data, model)
    used = data * model
    info("Mesh: %d devices as (%s=%d, %s=%d)"
         % (used, DATA_AXIS, data, MODEL_AXIS, model))
    if used < n:
        from video_learning_tpu.utils import warning
        warning("Mesh uses %d of %d available devices; %d idle "
                "(raise mesh_shape to use them)" % (used, n, n - used))
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh):
    """Batch arrays: leading axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_feed(feed, mesh, sharding=None):
    """Place a host feed dict onto the mesh: batch-leading arrays split
    over the data axis (multi-controller runs assemble per-process local
    batches into one global array), everything else left to jit's default
    placement.  Shared by the train engine and the validation forward so
    both phases scale over the same mesh."""
    sharding = sharding or data_sharding(mesh)
    data_size = mesh.shape[DATA_AXIS]
    procs = jax.process_count()
    out = {}
    for k, v in feed.items():
        # divisibility is judged on the GLOBAL batch (local rows x
        # processes), not the local rows: with 4 hosts on a 16-wide
        # data axis each host holds data_size/procs rows per shard
        if getattr(v, "ndim", 0) >= 1 and \
                (v.shape[0] * procs) % data_size == 0:
            if procs > 1:
                # assemble per-process local batches into one global
                # array: plain device_put would treat each host's
                # (different) local batch as the same global array and
                # silently drop most rows
                out[k] = jax.make_array_from_process_local_data(
                    sharding, np.asarray(v))
            else:
                out[k] = jax.device_put(v, sharding)
        elif procs > 1 and getattr(v, "ndim", 0) >= 1:
            # a host-local numpy array reaching the SPMD step in a
            # multi-controller run would be treated as replicated even
            # though each host holds different rows — silent cross-host
            # divergence.  Fail loudly instead.
            error("Feed array [%s] global batch %d (local %d x %d "
                  "procs) is not divisible by the data-axis size %d; "
                  "pad the batch or resize the mesh"
                  % (k, v.shape[0] * procs, v.shape[0], procs,
                     data_size))
        else:
            out[k] = v
    return out
