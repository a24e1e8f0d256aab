"""Constant / enum registry for the TPU-native video-learning framework.

This is the framework's configuration vocabulary: every enum-ish value in a
YAML config is written as a dotted ``defs.<group>.<member>`` string and
validated against this registry.  The groups and member names are the public
config language of the reference framework (see /root/reference/defs_.py:37-122)
and are kept identical so existing configs keep working; the implementation is
a fresh, data-driven registry rather than introspected nested classes.
"""

from video_learning_tpu.utils import error


class _Group:
    """A named enum group.  Members are attributes whose value equals their
    name (string-valued enums, like the reference's nested classes)."""

    def __init__(self, name, members):
        self._name = name
        self._members = tuple(members)
        for m in members:
            setattr(self, m, m)

    def __contains__(self, value):
        return value in self._members

    def __iter__(self):
        return iter(self._members)

    def __repr__(self):
        return "defs.%s{%s}" % (self._name, ",".join(self._members))


class defs:
    """Namespace of enum groups + the dotted-string validator.

    Mirrors the reference config vocabulary (/root/reference/defs_.py).
    """

    representation = _Group("representation", ["dcnn", "fc", "nop"])
    classifier = _Group("classifier", ["fc", "lstm"])
    phase = _Group("phase", ["train", "val"])
    input_mode = _Group("input_mode", ["video", "image", "vectors"])
    net_input = _Group("net_input", ["visual", "labels"])
    dataset_tag = _Group("dataset_tag", ["main", "aux"])
    data_format = _Group("data_format", ["raw", "tfrecord"])
    rnn_visual_mode = _Group(
        "rnn_visual_mode", ["state_bias", "input_bias", "input_concat"])
    fusion_method = _Group(
        "fusion_method",
        ["avg", "last", "concat", "reshape", "state", "ibias", "maximum"])
    fusion_type = _Group("fusion_type", ["early", "late", "none", "main", "aux"])
    clipframe_mode = _Group(
        "clipframe_mode", ["rand_frames", "rand_clips", "iterative"])
    generation_error = _Group(
        "generation_error", ["abort", "compromise", "report"])
    batch_item = _Group("batch_item", ["default", "clip"])
    # adamw is a TPU-native addition (decoupled weight decay); the
    # reference enumerates sgd/rmsprop/adam (defs_.py optim group)
    optim = _Group("optim", ["sgd", "rmsprop", "adam", "adamw"])
    decay = _Group("decay", ["exp", "staircase", "cosine"])
    periodicity = _Group("periodicity", ["interval", "drops"])
    label_type = _Group("label_type", ["single", "multiple"])
    # "max" = greedy argmax (the only reference mode); "beam" is a
    # TPU-native addition (batched beam search, models/lstm.py)
    caption_search = _Group("caption_search", ["max", "beam"])
    eval_type = _Group("eval_type", ["coco"])
    return_type = _Group("return_type", ["argmax_index", "standard"])
    imgproc = _Group(
        "imgproc",
        ["rand_mirror", "rand_crop", "center_crop", "resize", "raw_resize",
         "sub_mean"])

    class names:
        global_step = "global_step"
        latest_savefile = "latest"

    train_idx, val_idx = 0, 1
    image, label = 0, 1

    # ----------------------------------------------------------------- check
    @staticmethod
    def check(arg, should_belong_to, do_boolean=False):
        """Validate a dotted config string like ``defs.fusion_method.avg``
        against a group and return the member's string value.

        Semantics mirror the reference validator (/root/reference/defs_.py:6-34):
        the path must start with ``defs``, every intermediate component must
        exist, and one of the traversed containers must be the required group.
        With ``do_boolean=True`` returns ``(ok, value)`` instead of raising.
        """
        def fail(msg):
            if do_boolean:
                return (False, None)
            error(msg)

        if not isinstance(arg, str):
            return fail("Invalid def (non-string): %s" % str(arg))
        parts = arg.split(".")
        if parts[0] != "defs":
            return fail("Invalid def : %s" % arg)
        current = defs
        belongs_ok = False
        for part in parts[1:]:
            if not belongs_ok:
                belongs_ok = current is should_belong_to
            nxt = getattr(current, part, None) \
                if not part.startswith("_") else None
            if nxt is None or callable(nxt):
                # private attributes and methods are not config values
                # (reference defs_.py:6-34 filters routines via inspect)
                return fail("Parameter [%s] is not defined for [%s]"
                            % (part, current))
            current = nxt
        if not isinstance(current, str) and current is not should_belong_to:
            return fail("Parameter [%s] does not name an enum value" % arg)
        if not belongs_ok:
            return fail("Supplied parameter [%s] should be a child of def [%s]"
                        % (arg, should_belong_to))
        if do_boolean:
            return (True, current)
        return current

    @staticmethod
    def imgproc_to_str(vec):
        """Short tag string for an imgproc list (reference defs_.py:112-120)."""
        abbrev = [("rand_mirror", "rm"), ("rand_crop", "rc"),
                  ("center_crop", "cc"), ("resize", "rs"),
                  ("raw_resize", "rr"), ("sub_mean", "sm")]
        return "-".join(short for name, short in abbrev if name in vec)
