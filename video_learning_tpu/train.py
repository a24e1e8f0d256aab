"""Training engine: loss, LR schedule, optimizers, jitted SPMD train step.

Counterpart of /root/reference/train.py with the host/TF split replaced by a
single jitted step under a device mesh:

* loss: softmax cross-entropy against (multi-)one-hot labels, mean-reduced
  (train.py:117-124), with a validity mask so ragged final batches can be
  padded to static shapes (XLA compiles one step for the whole run),
* LR schedule precomputed on the host for all epochs x batches with the
  reference's exact exp/staircase x interval/drops semantics incl. the drop
  offset, dumped to ``<run_id>_lr_decay_schedule.txt``
  (train.py:50-109); the schedule rides along as a device constant indexed
  by the step counter,
* optimizers SGD / Adam / RMSProp (the reference enumerates rmsprop but
  never implemented it — train.py:166-171; here it works),
* global-norm gradient clipping (train.py:210-217),
* two-tier learning: 'modified' (fresh) parameters train at lr x lr_mult,
  'regular' (pretrained) parameters at lr (train.py:152-197; the reference
  applies both groups with the base optimizer due to a latent bug at
  train.py:187 — the documented intent is implemented here),
* train-accuracy metric (train.py:141-149).

The step is jitted once with donated state; batches are padded to the
static batch geometry and sharded over the mesh's data axis.

TPU-native addition: ``accum_steps: N`` splits each batch into N equal
micro-batches inside the step (lax.scan) and applies ONE optimizer update
from the accumulated sums — the masked-mean loss/grads are numerically
identical to N=1 while peak activation memory drops ~N-fold (the lever
for batch sizes past HBM, complementary to ``remat``).
"""

import math
import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import optax

from video_learning_tpu.defs import defs
from video_learning_tpu.ops.preprocess import make_preprocessor, \
    supports_device_path
from video_learning_tpu.parallel import mesh as mesh_mod
from video_learning_tpu.parallel.sharding import param_shardings
from video_learning_tpu.utils import error, info, warning

# ----------------------------------------------------------- LR schedule


def precompute_learning_rates(settings, num_batches):
    """Host-side full schedule with reference semantics
    (train.py:50-109).

    Reference quirk preserved ON PURPOSE: ``exp`` produces the same
    schedule as ``staircase``.  In the reference (train.py:83-91), idx
    only ever holds multiples of decay_freq when the fraction is
    computed, so ``idx / decay_freq`` (smooth) is always the same
    integer as ``idx // decay_freq`` (jagged) — its "smoothly" log
    message notwithstanding.  Reproducing the schedule exactly keeps
    every reference config training identically here; a truly smooth
    per-batch exponential would silently change training dynamics.
    The quirk is pinned by test_robustness.py."""
    base_lr = settings.train.base_lr
    decay_params = settings.train.lr_decay
    total = num_batches * settings.train.epochs
    if decay_params is None:
        lr_per_batch = [base_lr] * total
        warmup = int(getattr(settings.train, "lr_warmup", 0) or 0)
        for i in range(min(warmup, total)):
            lr_per_batch[i] = base_lr * (i + 1) / warmup
        return lr_per_batch
    lr_drop_offset = 0 if len(tuple(decay_params)) == 4 else decay_params[-1]
    decay_strategy, decay_scheme, decay_freq, decay_factor = \
        tuple(decay_params[:4])

    cosine = False
    if decay_strategy == defs.decay.exp:
        staircase = False
    elif decay_strategy == defs.decay.staircase:
        staircase = True
    elif decay_strategy == defs.decay.cosine:
        # TPU-native addition (the reference enumerates exp/staircase
        # only): half-cosine anneal from base_lr to
        # base_lr * decay_factor over the whole run, recomputed every
        # decay_freq batches (interval) / at each of decay_freq equally
        # spaced drops (drops) — same piecewise-constant structure as
        # the other strategies, so the schedule-file and device-constant
        # machinery are unchanged
        cosine, staircase = True, False
    else:
        error("Undefined decay strategy %s" % decay_strategy)

    if decay_scheme == defs.periodicity.interval:
        decay_period = decay_freq
    elif decay_scheme == defs.periodicity.drops:
        decay_period = math.ceil(total / decay_freq)
    else:
        error("Undefined decay scheme %s" % decay_scheme)

    lr_per_batch = []
    idx = 0
    while len(lr_per_batch) < total:
        if cosine:
            floor = decay_factor
            progress = min(idx / max(total - decay_period, 1), 1.0)
            current = base_lr * (
                floor + (1.0 - floor) * 0.5 *
                (1.0 + math.cos(math.pi * progress)))
            idx += decay_period
        else:
            fraction = idx // decay_freq if staircase else idx / decay_freq
            current = base_lr * pow(decay_factor, fraction)
            idx += decay_freq
        lr_per_batch.extend(current for _ in range(decay_period))
    lr_per_batch = lr_per_batch[:total]
    if lr_drop_offset:
        lr_per_batch = [base_lr] * lr_drop_offset + \
            lr_per_batch[:-lr_drop_offset]

    warmup = int(getattr(settings.train, "lr_warmup", 0) or 0)
    if warmup:
        # linear ramp 0 -> scheduled value over the first ``warmup``
        # batches, applied on top of whatever decay produced (TPU-native
        # addition; large-batch training stabilizer)
        for i in range(min(warmup, total)):
            lr_per_batch[i] = lr_per_batch[i] * (i + 1) / warmup

    if settings.run_folder:
        sched_file = os.path.join(
            settings.run_folder, settings.run_id + "_lr_decay_schedule.txt")
        with open(sched_file, "w") as f:
            k = 0
            for ep in range(settings.train.epochs):
                for b in range(num_batches):
                    f.write("Epoch %d/%d, batch %d/%d, lr %2.8f\n"
                            % (ep + 1, settings.train.epochs, b + 1,
                               num_batches, lr_per_batch[k]))
                    k += 1
    info("LR schedule: base %2.5f, %d steps, %d distinct values"
         % (base_lr, total, len(set(lr_per_batch))))
    return lr_per_batch


# ------------------------------------------------------------- optimizer
def _decay_mask(params):
    """Decoupled weight decay applies to matrices/kernels only (ndim > 1);
    biases and other vector/scalar params are exempt — the standard
    AdamW practice (Loshchilov & Hutter 2019)."""
    return jax.tree_util.tree_map(
        lambda p: getattr(p, "ndim", 0) > 1, params)


def _base_opt(train, schedule):
    name = train.optimizer
    if name == defs.optim.sgd:
        return optax.sgd(schedule)
    if name == defs.optim.adam:
        return optax.adam(schedule)
    if name == defs.optim.rmsprop:
        return optax.rmsprop(schedule)
    if name == defs.optim.adamw:
        wd = float(getattr(train, "weight_decay", 0.0) or 0.0)
        return optax.adamw(schedule, weight_decay=wd, mask=_decay_mask)
    error("Undefined optimizer %s" % name)


def make_optimizer(settings, lr_array, label_tree=None):
    """Build the optax transformation: optional global-norm clip ->
    (optionally two-tier) optimizer with the precomputed schedule."""
    lr_const = jnp.asarray(lr_array, jnp.float32)

    def schedule(count):
        i = jnp.clip(count, 0, lr_const.shape[0] - 1)
        return lr_const[i]

    mult = settings.train.lr_mult
    if mult is not None and label_tree is not None:
        def schedule_mod(count):
            return schedule(count) * mult
        tx = optax.multi_transform(
            {"regular": _base_opt(settings.train, schedule),
             "modified": _base_opt(settings.train, schedule_mod)},
            label_tree)
    else:
        tx = _base_opt(settings.train, schedule)

    chain = []
    if settings.train.clip_norm:
        chain.append(optax.clip_by_global_norm(
            float(settings.train.clip_norm)))
    if getattr(settings.train, "clip_grads", None):
        # reference clip_grads semantics: each gradient tensor's norm is
        # capped independently (train.py:175-186 applies
        # clip_by_global_norm per gradient with the upper bound)
        lo, hi = settings.train.clip_grads
        chain.append(_clip_per_tensor_norm(max(abs(lo), abs(hi))))
    chain.append(tx)
    return optax.chain(*chain)


def _clip_per_tensor_norm(max_norm):
    """Optax transform capping each gradient leaf's own norm."""
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def clip_leaf(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale
        return jax.tree_util.tree_map(clip_leaf, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_label_tree(params, modified_prefixes):
    """Label every param leaf 'regular' or 'modified' by path prefix
    (two-tier groups from Model.param_groups)."""
    def label(path, leaf):
        joined = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                          for p in path)
        for pref in modified_prefixes:
            if joined.startswith(pref):
                return "modified"
        return "regular"
    return jax.tree_util.tree_map_with_path(label, params)


# ------------------------------------------------------------------ loss
def softmax_cross_entropy(logits, onehot_labels, mask=None):
    """TF-style softmax CE against (multi-)hot labels, mean-reduced
    (reference train.py:117-124), with optional row validity mask."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_row = -jnp.sum(onehot_labels.astype(jnp.float32) * logp, axis=-1)
    if mask is None:
        return jnp.mean(per_row)
    mask = mask.astype(jnp.float32)
    return jnp.sum(per_row * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# ----------------------------------------------------------------- engine
class Train:
    """Owns optimizer state + the jitted SPMD train step."""

    def __init__(self, settings, feeder, model, seed=0):
        if not settings.train:
            return
        info("Creating training: { %s }" % settings.get_train_str())
        self.settings = settings
        self.model = model
        self.feeder = feeder
        num_batches = feeder.get_num_batches()
        self.lr_array = np.asarray(
            precompute_learning_rates(settings, num_batches), np.float32)
        self.mesh = mesh_mod.make_mesh(settings.mesh_shape)
        self.data_sharding = mesh_mod.data_sharding(self.mesh)

        self._accum = int(getattr(settings.train, "accum_steps", 1) or 1)
        if self._accum > 1:
            self._check_accum_geometry()
        self.params = model.init_params(jax.random.PRNGKey(seed))
        _, modified = model.param_groups()
        self.label_tree = make_label_tree(self.params, modified)
        self.tx = make_optimizer(settings, self.lr_array, self.label_tree)
        self.opt_state = self.tx.init(self.params)
        # weight EMA (TPU-native addition): the shadow params ride inside
        # opt_state so the jitted step, the scan-fused loop, donation, and
        # checkpointing all see ONE state object; state_dict() splits them
        # back out under "ema_params" for name-mapped restore
        self._ema_decay = float(getattr(settings.train, "ema_decay", 0.0)
                                or 0.0)
        if self._ema_decay:
            self.opt_state = {
                "tx": self.opt_state,
                "ema": jax.tree_util.tree_map(jnp.array, self.params)}
        self.base_rng = jax.random.PRNGKey(seed + 1)
        self.global_step = settings.global_step

        self._preprocessors = self._build_preprocessors()
        self._step_fn = self._compile_step()
        # static batch geometry: grows adaptively (see batching.py), so
        # ragged/variable-cpv batches and ragged-first-batch resumes are
        # safe at the cost of at most a few recompilations
        from video_learning_tpu.batching import BatchGeometry
        self._geometry = BatchGeometry()

    def _check_accum_geometry(self):
        """accum_steps splits the batch into EQUAL micro-batches along
        every feed array's leading dim, which requires per-item row
        counts to be uniform (micro-batch boundaries must align across
        the visual/label/caption arrays).  Variable clips-per-video
        batches under batch_item=default violate that — reject up front
        instead of training on misaligned chunks."""
        from video_learning_tpu.defs import defs as _defs
        if self.settings.train.batch_item == _defs.batch_item.clip:
            return
        datasets = getattr(self.feeder, "datasets", {})
        for d in datasets.get(_defs.phase.train, []):
            cpv = getattr(d, "clips_per_video", None)
            if isinstance(cpv, (list, tuple)) and len(set(cpv)) > 1:
                error("accum_steps > 1 needs uniform batch geometry; "
                      "dataset has variable clips-per-video (%d..%d). "
                      "Use batch_item: defs.batch_item.clip or repack "
                      "with a fixed cpv." % (min(cpv), max(cpv)))

    def _check_accum_feed(self, feed):
        """Friendly host-side divisibility check (a bad split would
        otherwise surface as a cryptic reshape error at trace time)."""
        for k, v in feed.items():
            if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1 and \
                    v.shape[0] % self._accum:
                error("accum_steps=%d does not divide feed '%s' rows "
                      "(%d); adjust batch_size/accum_steps"
                      % (self._accum, k, v.shape[0]))

    # ------------------------------------------------------ preprocessors
    def _build_preprocessors(self):
        pre = {}
        for key, itype, tag in self.model.required_input:
            if itype != defs.net_input.visual:
                continue
            dsets = self.feeder.get_dataset_by_tag(tag)
            if not dsets:
                continue
            d = dsets[0]
            if d.device_preprocess and d.processor is not None:
                if not supports_device_path(d.imgproc, d):
                    error("Device preprocessing unsupported for imgproc %s"
                          % d.imgproc)
                # emit frames directly in the compute dtype: the first
                # conv consumes them as-is, halving the largest
                # activation's HBM traffic under bfloat16
                pre[key] = make_preprocessor(
                    d.processor, out_dtype=self.model.compute_dtype)
        return pre

    # -------------------------------------------------------------- step
    def _compile_step(self):
        model = self.model
        tx = self.tx
        lr_const = jnp.asarray(self.lr_array)
        preprocessors = self._preprocessors
        settings = self.settings
        accum = int(getattr(settings.train, "accum_steps", 1) or 1)

        def micro_sums(params, feed, rng):
            """Masked SUMS over one (micro-)batch: grads of the summed
            loss plus (loss_sum, mask_count, correct_count).  Dividing
            the accumulated sums by the total mask count reproduces the
            full-batch masked MEAN exactly (up to fp reassociation), so
            accum_steps=N is numerically the N=1 step."""
            feed = dict(feed)
            for key, pre in preprocessors.items():
                feed[key] = pre(feed[key], feed.pop(key + "/proc_params"))
            labels = feed["labels"]
            mask = feed.get("label_mask")
            if mask is None:
                mask = jnp.ones((labels.shape[0],), jnp.float32)
            mask = mask.astype(jnp.float32)

            def loss_sum_fn(p):
                logits = model.apply(p, feed, train=True, dropout_rng=rng)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                per_row = -jnp.sum(labels.astype(jnp.float32) * logp, -1)
                correct = (jnp.argmax(logits, 1) ==
                           jnp.argmax(labels, 1)).astype(jnp.float32)
                return jnp.sum(per_row * mask), jnp.sum(correct * mask)

            (loss_sum, correct), grads = jax.value_and_grad(
                loss_sum_fn, has_aux=True)(params)
            return grads, loss_sum, jnp.sum(mask), correct

        # single source of truth for the opt_state structure: the value
        # captured at construction (mutating settings afterwards must not
        # desync the compiled step from state_dict/place_params)
        ema_decay = self._ema_decay

        # descriptive tensor summaries (reference utils_.py:172-184
        # add_descriptive_summary): the watch list is static config, so
        # the matched paths are resolved once at trace time and the
        # stats are fused into the step executable — scalars only leave
        # the device, never the tensors themselves
        watched_paths = []
        patterns = [re.compile(p)
                    for p in getattr(settings, "watch_tensors", []) or []]
        if patterns:
            from video_learning_tpu.checkpoint import flatten_tree
            watched_paths = sorted(
                path for path in flatten_tree(self.params)
                if any(rx.search(path) for rx in patterns))
            if not watched_paths:
                warning("logging.watch_tensors %s matched no params"
                        % settings.watch_tensors)

        def _watch_stats(params, grads, metrics):
            if not watched_paths:
                return
            from video_learning_tpu.checkpoint import flatten_tree
            flat = {"param": flatten_tree(params),
                    "grad": flatten_tree(grads)}
            for kind, leaves in flat.items():
                for path in watched_paths:
                    x = leaves[path].astype(jnp.float32)
                    key = "%s/%s" % (kind, path)
                    metrics[key + "/mean"] = jnp.mean(x)
                    metrics[key + "/std"] = jnp.std(x)
                    metrics[key + "/min"] = jnp.min(x)
                    metrics[key + "/max"] = jnp.max(x)

        def finish(params, opt_state, grads, loss, acc, step):
            """Optimizer update + metrics from already mean-normalized
            grads/loss/accuracy."""
            tx_state = opt_state["tx"] if ema_decay else opt_state
            updates, new_tx_state = tx.update(grads, tx_state, params)
            new_params = optax.apply_updates(params, updates)
            if ema_decay:
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: e * ema_decay +
                    p.astype(e.dtype) * (1.0 - ema_decay),
                    opt_state["ema"], new_params)
                new_opt_state = {"tx": new_tx_state, "ema": new_ema}
            else:
                new_opt_state = new_tx_state
            metrics = {
                "loss": loss,
                "lr": lr_const[jnp.clip(step, 0, lr_const.shape[0] - 1)],
                "grad_norm": optax.global_norm(grads),
                "accuracy": acc,
            }
            _watch_stats(params, grads, metrics)
            return new_params, new_opt_state, metrics

        if accum == 1:
            # differentiate the masked MEAN directly — bit-identical to
            # the pre-accum_steps step (the micro-sum formulation is
            # mathematically equal but fp-reassociated: the 1/denom
            # scaling moves across the backward pass, which measurably
            # shifts long training trajectories; the caption example
            # regression pinned this, BASELINE.md round-3)
            def step_fn(params, opt_state, feed, step, rng):
                feed = dict(feed)
                for key, pre in preprocessors.items():
                    feed[key] = pre(feed[key],
                                    feed.pop(key + "/proc_params"))
                labels = feed["labels"]
                mask = feed.get("label_mask")

                def loss_fn(p):
                    logits = model.apply(p, feed, train=True,
                                         dropout_rng=rng)
                    return softmax_cross_entropy(logits, labels,
                                                 mask), logits

                (loss, logits), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                correct = (jnp.argmax(logits, 1) ==
                           jnp.argmax(labels, 1)).astype(jnp.float32)
                if mask is None:
                    acc = jnp.mean(correct)
                else:
                    m = mask.astype(jnp.float32)
                    acc = (jnp.sum(correct * m) /
                           jnp.maximum(jnp.sum(m), 1.0))
                return finish(params, opt_state, grads, loss, acc, step)
        else:
            def step_fn(params, opt_state, feed, step, rng):
                # split every feed array's leading dim into ``accum``
                # equal micro-batches; lax.scan holds one micro-batch of
                # activations live at a time (activation memory / accum)
                chunked, static = {}, {}
                for k, v in feed.items():
                    if hasattr(v, "shape") and v.ndim >= 1:
                        rows = v.shape[0]
                        chunked[k] = v.reshape(
                            (accum, rows // accum) + v.shape[1:])
                    else:
                        static[k] = v

                def body(carry, xs):
                    g_acc, ls, cnt, cor = carry
                    i, feed_i = xs
                    g, s, c, ok = micro_sums(
                        params, dict(static, **feed_i),
                        jax.random.fold_in(rng, i))
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                    return (g_acc, ls + s, cnt + c, cor + ok), None

                zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
                (grads, ls, cnt, cor), _ = jax.lax.scan(
                    body, (zeros, 0.0, 0.0, 0.0),
                    (jnp.arange(accum), chunked))
                denom = jnp.maximum(cnt, 1.0)
                grads = jax.tree_util.tree_map(
                    lambda g: (g.astype(jnp.float32) /
                               denom).astype(g.dtype), grads)
                return finish(params, opt_state, grads, ls / denom,
                              cor / denom, step)

        self.raw_step = step_fn
        return jax.jit(step_fn, donate_argnums=(0, 1))

    def compile_scan_steps(self, num_steps):
        """Fuse ``num_steps`` optimizer steps over one batch into a single
        compiled device loop (lax.scan) — host-free training, the pattern
        that hides dispatch latency entirely.  Returns
        fn(params, opt_state, feed, step0, rng) ->
        (params, opt_state, stacked_metrics)."""
        raw = self.raw_step

        def many(params, opt_state, feed, step0, rng):
            def body(carry, i):
                p, o = carry
                p, o, m = raw(p, o, feed, step0 + i,
                              jax.random.fold_in(rng, i))
                return (p, o), m

            (p, o), ms = jax.lax.scan(body, (params, opt_state),
                                      jnp.arange(num_steps))
            return p, o, ms

        return jax.jit(many, donate_argnums=(0, 1))

    def place_params(self):
        """Shard/replicate params + opt state onto the mesh.  Placing both
        up-front keeps jit input shardings identical to output shardings,
        so the step executable compiles exactly once.  EMA shadow params
        are sharded exactly like the live params (they are elementwise
        blends of them — a replicated EMA against tp-sharded params would
        force a resharding collective every step)."""
        from video_learning_tpu.parallel.sharding import shard_params
        self.params = shard_params(self.params, self.mesh)
        repl = mesh_mod.replicated(self.mesh)
        opt = self.opt_state
        ema = None
        if self._ema_decay:
            ema = shard_params(opt["ema"], self.mesh)
            opt = opt["tx"]
        opt = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl)
            if hasattr(x, "shape") else x, opt)
        self.opt_state = {"tx": opt, "ema": ema} if ema is not None else opt

    # ----------------------------------------------------------- padding
    def _pad_feed(self, feed):
        """Pad to the adaptive static geometry; preserves any
        caller-provided label_mask (caption word-grid validity)."""
        out, _, _ = self._geometry.pad_feed(feed)
        return out

    def _shard_feed(self, feed):
        return mesh_mod.shard_feed(feed, self.mesh, self.data_sharding)

    # ------------------------------------------------------------ public
    def prepare_device_feed(self, feed):
        """Pad + transfer a feed to the device.  Safe to call from a
        prefetch thread so host->device copies overlap the previous
        step's compute; run_step detects prepared feeds and skips the
        work."""
        feed = self._pad_feed(feed)
        if self._accum > 1:
            self._check_accum_feed(feed)
        feed = self._shard_feed(feed)
        feed["__on_device__"] = True
        return feed

    def run_step(self, feed):
        """One optimizer step on a host feed dict; returns host metrics."""
        if not feed.pop("__on_device__", False):
            feed = self._pad_feed(feed)
            if self._accum > 1:
                self._check_accum_feed(feed)
            feed = self._shard_feed(feed)
        rng = jax.random.fold_in(self.base_rng, self.global_step)
        self.params, self.opt_state, metrics = self._step_fn(
            self.params, self.opt_state, feed,
            jnp.asarray(self.global_step), rng)
        self.global_step += 1
        return {k: float(v) for k, v in metrics.items()}

    def eval_params(self):
        """Parameters an inline evaluation should use: the EMA shadow
        weights when ema_decay is on and ``val: use_ema`` asks for them,
        else the live params."""
        if self._ema_decay and self.settings.val is not None and \
                getattr(self.settings.val, "use_ema", False):
            return self.opt_state["ema"]
        return self.params

    # --------------------------------------------------- state (ckpt I/O)
    def state_dict(self):
        # only the LEAVES are stored; load_state_dict re-derives the
        # treedef from the live opt_state (the optimizer config defines
        # the structure, not the checkpoint).  EMA shadow params are
        # stored as a named tree ("ema_params") so an eval phase can
        # restore them by name like the live params.
        opt = self.opt_state
        ema = None
        if self._ema_decay:
            ema, opt = opt["ema"], opt["tx"]
        leaves, _ = jax.tree_util.tree_flatten(opt)
        out = {
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "opt_state_leaves": [np.asarray(l) for l in leaves],
            defs.names.global_step: np.asarray(self.global_step),
        }
        if ema is not None:
            out["ema_params"] = jax.tree_util.tree_map(np.asarray, ema)
        return out

    def load_state_dict(self, state, restored_names=None):
        """``restored_names``: the names actually loaded from a checkpoint
        file (feeder.init_saveload's loaded_out), used to seed the EMA at
        the restored params when resuming from an EMA-less checkpoint."""
        self.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        cur_tx = self.opt_state["tx"] if self._ema_decay else self.opt_state
        leaves, treedef = jax.tree_util.tree_flatten(cur_tx)
        saved = state.get("opt_state_leaves")
        new_tx = cur_tx
        if saved is not None and len(saved) == len(leaves):
            new_tx = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(l) for l in saved])
        if self._ema_decay:
            resumed = bool(restored_names)
            ema_from_ckpt = any(n.startswith("ema_params")
                                for n in (restored_names or []))
            if resumed and not ema_from_ckpt:
                info("Checkpoint carries no EMA state; seeding the EMA "
                     "at the restored params")
                ema = jax.tree_util.tree_map(jnp.array, self.params)
            elif state.get("ema_params") is not None:
                ema = jax.tree_util.tree_map(jnp.asarray,
                                             state["ema_params"])
            else:
                ema = self.opt_state["ema"]
            self.opt_state = {"tx": new_tx, "ema": ema}
        else:
            self.opt_state = new_tx
        gs = state.get(defs.names.global_step)
        if gs is not None:
            self.global_step = int(gs)
