"""Checkpointing: save/restore of parameter + optimizer pytrees.

TPU-native counterpart of the reference's TF-Saver checkpoints + ``.snap``
sidecars (/root/reference/feeder.py:198-288).  A checkpoint is a data-only ``.npz``
archive of a flat {slash/joined/name: numpy array} dict plus scalar leaves,
which makes the reference's *name-diffing* restore semantics
(feeder.py:224-249) straightforward: variables present in exactly one side
are reported, ignorable names are skipped, and everything that matches by
name (and shape) is loaded.  Offline checkpoint surgery lives in
tools/modify_checkpoint.py, mirroring the reference's tool.
"""

import os
import pickle

import numpy as np

from video_learning_tpu.utils import error, info, warning

_SEP = "/"


# ------------------------------------------------------------- tree <-> flat
def flatten_tree(tree, prefix=""):
    """Flatten a nested dict/list pytree into {path: leaf}."""
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix.rstrip(_SEP): tree}
    for k, v in items:
        path = prefix + str(k)
        if isinstance(v, (dict, list, tuple)):
            out.update(flatten_tree(v, path + _SEP))
        else:
            out[path] = v
    return out


def _assign_flat(tree, path_parts, value):
    key = path_parts[0]
    if isinstance(tree, tuple):
        error("Restore target contains an immutable tuple node at [%s]; "
              "state pytrees must use lists/dicts (see Train.state_dict, "
              "which flattens optimizer tuples into a leaf list)." % key)
    if isinstance(tree, list):
        idx = int(key)
        if len(path_parts) == 1:
            tree[idx] = value
        else:
            _assign_flat(tree[idx], path_parts[1:], value)
        return
    if len(path_parts) == 1:
        tree[key] = value
    else:
        _assign_flat(tree[key], path_parts[1:], value)


def _to_numpy(leaf):
    if hasattr(leaf, "dtype") and hasattr(leaf, "shape"):
        return np.asarray(leaf)
    return leaf


def _copy_tree(tree):
    """Structural copy of a dict/list pytree (leaves shared).  Tuples
    become lists — restore targets must be mutable (_assign_flat)."""
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_copy_tree(v) for v in tree]
    return tree


# --------------------------------------------- EMA eval-weight selection
def prepare_eval_state(params, ignorables, use_ema):
    """Build the restore target for an eval/serving consumer.  With
    ``use_ema`` the state carries "ema_params" slots shaped like
    ``params`` so the name-mapped restore can fill the shadow weights;
    without it, the shadow tree in an EMA checkpoint is skipped silently
    (via an ignorable).  Returns ``(state, ignorables)``."""
    state = {"params": params}
    if use_ema:
        state["ema_params"] = _copy_tree(params)
    else:
        ignorables = list(ignorables) + ["ema_params"]
    return state, ignorables


def select_eval_params(state, loaded_names, use_ema, resumed, origin):
    """Pick the weights an eval/serving consumer should run: the restored
    EMA shadow tree when ``use_ema`` and the checkpoint carries one, else
    the live params.  A PARTIALLY restored shadow (shape drift skipped
    some leaves) is completed from the restored live params — the
    fresh-init slot values must never be served as "EMA weights".
    ``loaded_names`` is the restore's ``loaded_out`` bookkeeping;
    ``origin`` labels the request in log lines (e.g. "val: use_ema").
    Returns ``(params, ema_used)``."""
    if not use_ema:
        return state["params"], False
    if not resumed:
        warning("%s requested but no checkpoint is being restored; "
                "using the (fresh) live params" % origin)
        return state["params"], False
    got = set(n for n in (loaded_names or [])
              if n.startswith("ema_params" + _SEP))
    if not got:
        warning("%s requested but the checkpoint has no ema_params; "
                "using the live params" % origin)
        return state["params"], False
    missing = [n for n in flatten_tree({"ema_params": state["ema_params"]})
               if n not in got]
    if missing:
        warning("%s: %d EMA leaves missing from the checkpoint (shape "
                "drift?); seeding them from the restored live params"
                % (origin, len(missing)))
        live = flatten_tree({"params": state["params"]})
        for name in missing:
            value = live["params" + _SEP + name.split(_SEP, 1)[1]]
            _assign_flat(state, name.split(_SEP), value)
    info("Evaluating the EMA weights (%s)" % origin)
    return state["ema_params"], True


# ------------------------------------------------------------------- public
def _reject_tuple_nodes(tree, prefix=""):
    """Tuples flatten like lists but cannot be assigned into on restore
    (_assign_flat); failing at save time keeps the formats symmetric
    instead of producing an unrestorable checkpoint."""
    if isinstance(tree, tuple):
        error("State pytree contains an immutable tuple node at [%s]; "
              "convert to a list before saving (see Train.state_dict)."
              % (prefix or "<root>"))
    if isinstance(tree, dict):
        for k, v in tree.items():
            _reject_tuple_nodes(v, prefix + str(k) + _SEP)
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            _reject_tuple_nodes(v, prefix + str(i) + _SEP)


def save_checkpoint(path, state):
    """Serialize a state pytree to ``path`` as a data-only numpy ``.npz``
    archive (a zip of raw ``.npy`` members) — never pickle, so restoring
    a checkpoint from an untrusted or tampered file cannot execute code
    (unlike pickle; the reference's TF-Saver format was data-only too)."""
    _reject_tuple_nodes(state)
    flat = {}
    for k, v in flatten_tree(state).items():
        arr = np.asarray(_to_numpy(v))
        if arr.dtype == object:
            error("Checkpoint leaf [%s] is not a plain numeric array "
                  "(dtype=object); cannot save without pickle" % k)
        flat[k] = arr
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_flat(path):
    if is_orbax_checkpoint(path):
        return load_flat_orbax(path)
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic[:2] == b"PK":  # .npz zip container
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    # legacy (round-1) pickle checkpoint: loading executes pickle opcodes,
    # so only trusted files should ever reach this branch
    warning("Loading legacy pickle checkpoint [%s]; pickle can execute "
            "code — only load checkpoints you trust" % path)
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_checkpoint(path, state, ignorable_names=None, strict=False,
                       loaded_out=None):
    """Load ``path`` into ``state`` (a mutable nested-dict pytree) with
    name diffing (reference feeder.py:224-249): names missing on either
    side are reported; ``ignorable_names`` (substring match, like the
    reference's checkpoint-ignorable variables) are silently skipped.  With
    strict=True, unexpected mismatches raise instead of warn."""
    ignorable_names = ignorable_names or []
    saved = load_flat(path)
    current = flatten_tree(state)

    def ignorable(name):
        return any(ig in name for ig in ignorable_names)

    missing_from_ckpt = [n for n in current
                         if n not in saved and not ignorable(n)]
    missing_from_curr = [n for n in saved
                         if n not in current and not ignorable(n)]
    if missing_from_ckpt:
        msg = ("%d variables missing from checkpoint: %s"
               % (len(missing_from_ckpt), missing_from_ckpt[:16]))
        error(msg) if strict else warning(msg)
    if missing_from_curr:
        msg = ("%d checkpoint variables missing in the model: %s"
               % (len(missing_from_curr), missing_from_curr[:16]))
        error(msg) if strict else warning(msg)

    loaded = 0
    loaded_names = []
    for name, value in saved.items():
        if name not in current or ignorable(name):
            continue
        cur = current[name]
        if hasattr(cur, "shape") and hasattr(value, "shape") and \
                tuple(cur.shape) != tuple(value.shape):
            msg = ("Shape mismatch for %s: checkpoint %s vs model %s"
                   % (name, value.shape, cur.shape))
            error(msg) if strict else warning(msg)
            continue
        _assign_flat(state, name.split(_SEP), value)
        loaded += 1
        loaded_names.append(name)
    info("Restored %d/%d variables from %s" % (loaded, len(current), path))
    if loaded_out is not None:
        # which names actually came from the file (e.g. the EMA fallback
        # when resuming from an EMA-less checkpoint needs to know)
        loaded_out.extend(loaded_names)
    return state


class AsyncSaver:
    """Background checkpoint writer: one worker at a time, submit() joins
    the previous write first (bounding in-flight state copies to one) and
    re-raises any error it hit, so a failed save cannot pass silently.

    The expensive parts of a save — the ``.npz`` zip write or the Orbax
    array serialization — are pure host work on an already-materialized
    numpy snapshot (Train.state_dict copies device arrays to host before
    save is called), so running them on a thread overlaps checkpointing
    with the next training steps.  ``wait()`` must be called before the
    process exits (run_task calls it after the training loop)."""

    def __init__(self):
        self._thread = None
        self._failure = None

    def submit(self, fn):
        import threading
        self.wait()

        def run():
            try:
                fn()
            except BaseException as e:     # re-raised on the main thread
                self._failure = e

        self._thread = threading.Thread(target=run, daemon=True,
                                        name="vlt-ckpt-writer")
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._failure is not None:
            failure, self._failure = self._failure, None
            raise failure


def delete_checkpoint(path):
    for suffix in ("", ".snap"):
        target = path + suffix
        if os.path.exists(target):
            if os.path.isdir(target):
                import shutil
                shutil.rmtree(target)
            else:
                os.remove(target)


# --------------------------------------------------------- orbax backend
def save_checkpoint_orbax(path, state):
    """Alternative backend: Orbax StandardCheckpointer (async-capable,
    multi-host-aware).  Saves the same flat {name: array} mapping so the
    name-diff restore and inspection tools keep working; ``path`` becomes
    a directory.  Select with ``checkpoint_backend: orbax`` in the run
    config."""
    import orbax.checkpoint as ocp
    flat = {k: _to_numpy(v) for k, v in flatten_tree(state).items()}
    # orbax keys cannot contain '/', map to a safe separator
    safe = {k.replace(_SEP, "::"): v for k, v in flat.items()}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), safe, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_flat_orbax(path):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    safe = ckptr.restore(os.path.abspath(path))
    ckptr.close()
    return {k.replace("::", _SEP): v for k, v in safe.items()}


def is_orbax_checkpoint(path):
    return os.path.isdir(path)


def get_checkpoint_tensor_names(path):
    """Names of all array leaves in a checkpoint
    (reference tools/inspect_checkpoint.py:60-80)."""
    return sorted(load_flat(path).keys())
