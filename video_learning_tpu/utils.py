"""Logging, small helpers, and run-folder conventions.

TPU-native counterpart of the reference's utils (/root/reference/utils_.py):
same public logging surface (``info/debug/warning/error`` with ``error``
raising after logging, deferred "log storage" buckets used by the packer's
generation-error reporting, optional email notification) plus the small list /
file helpers the rest of the stack shares.  No TF dependencies.
"""

import logging
import os
import sys
import time

import numpy as np


# --------------------------------------------------------------------- time
def elapsed_str(previous_tic, up_to=None):
    """H:MM:SS string since ``previous_tic`` (reference utils_.py:27-33)."""
    if up_to is None:
        up_to = time.time()
    m, s = divmod(up_to - previous_tic, 60)
    h, m = divmod(m, 60)
    return "%d:%02d:%02d" % (h, m, s)


def get_datetime_str():
    return time.strftime("%d%m%y_%H%M%S")


# ------------------------------------------------------------------ logging
class CustomLogger:
    """Singleton-ish logger with file+console handlers and deferred storage
    buckets (reference utils_.py:41-93).  The storage buckets let long batch
    jobs (e.g. the packer) collect per-item errors and report them at the end.
    """

    loggername = "vlt"
    instance = None
    email_notify = None

    def __init__(self):
        self.log_storage = {}
        self.logger = logging.getLogger(CustomLogger.loggername)

    # deferred log storage -------------------------------------------------
    def get_log_storage(self, storage_id):
        return self.log_storage.get(storage_id, [])

    def clear_log_storage(self, storage_id):
        self.log_storage.pop(storage_id, None)

    def add_to_log_storage(self, storage_id, message):
        self.log_storage.setdefault(storage_id, []).append(message)

    # configuration ---------------------------------------------------------
    def configure_logging(self, logfile, logging_level, email_notify=None):
        if isinstance(logging_level, str):
            # accept "logging.DEBUG"-style strings from config files
            name = logging_level.split(".")[-1]
            resolved = getattr(logging, name, None)
            if not isinstance(resolved, int):
                error("Invalid logging level: %s" % logging_level)
            logging_level = resolved
        self.logging_level = logging_level
        self.logger = logging.getLogger(CustomLogger.loggername)
        self.logger.setLevel(logging_level)
        self.logger.handlers = []
        fmt = logging.Formatter(
            "%(asctime)s| %(levelname)7s - %(filename)15s - "
            "line %(lineno)4d - %(message)s")
        if logfile:
            fh = logging.FileHandler(logfile)
            fh.setLevel(logging_level)
            fh.setFormatter(fmt)
            self.logger.addHandler(fh)
        ch = logging.StreamHandler()
        ch.setFormatter(fmt)
        self.logger.addHandler(ch)
        CustomLogger.email_notify = email_notify
        CustomLogger.instance = self

    @staticmethod
    def get_logging_level():
        return logging.getLogger(CustomLogger.loggername).level

    @staticmethod
    def email(message, message_type):
        """Best-effort email notification (reference utils_.py:96-129).
        Disabled unless configured; failures are never fatal."""
        if not CustomLogger.email_notify:
            return
        try:
            import smtplib
            sender, passw, recipient = CustomLogger.email_notify
            subject = "video-learning-tpu | %s : %s" % (os.uname()[1],
                                                        message_type)
            body = "\r\n".join(["To: %s" % recipient, "From: %s" % sender,
                                "Subject: %s" % subject, "", message])
            server = smtplib.SMTP("smtp.gmail.com", 587, timeout=10)
            server.ehlo()
            server.starttls()
            server.login(sender, passw)
            server.sendmail(sender, [recipient], body)
            server.quit()
        except Exception:
            logging.getLogger(CustomLogger.loggername).warning(
                "Email notification failed (ignored).")


def prep_email(tofrom):
    """Interactive password prompt for email notify (utils_.py:96-100)."""
    if not tofrom or len(tofrom) != 2:
        error("Need a sender and recipient email address, got [%s]" % tofrom)
    import getpass
    passw = getpass.getpass(
        prompt="Enter password for sender email [%s]: " % tofrom[0])
    return (tofrom[0], passw, tofrom[1])


class FrameworkError(Exception):
    """Raised by error(); carries the logged message."""


def error(msg):
    logging.getLogger(CustomLogger.loggername).error(msg)
    CustomLogger.email(str(msg), "ERROR")
    raise FrameworkError(msg)


def as_num(value, field, conv=float, minimum=None):
    """Convert a config scalar, surfacing a typo as a config-level
    FrameworkError naming the field — never a raw ValueError/TypeError
    from a loader's internals (the reference reports every config
    problem through error(), settings_.py:152-159)."""
    try:
        out = conv(value)
        if conv is int and not isinstance(value, bool) and \
                float(value) != out:
            # int(4.9) silently truncates — a config typo like
            # ``batch_size: 4.9`` must surface, not round down
            raise ValueError(value)
    except (TypeError, ValueError):
        error("Field [%s] must be a %s, got: [%s]"
              % (field, conv.__name__, value))
    if minimum is not None and out < minimum:
        error("Field [%s] must be >= %s (got %s)" % (field, minimum, out))
    return out


def info(message, email=False):
    logging.getLogger(CustomLogger.loggername).info(message)
    if email:
        CustomLogger.email(message, "INFO")


def warning(message, email=False):
    logging.getLogger(CustomLogger.loggername).warning(message)
    if email:
        CustomLogger.email(message, "WARNING")


_ONCE_SEEN = set()


def warning_once(message, email=False, key=None):
    """``warning`` deduplicated on ``key`` (default: the message text) —
    for trace-time advisories that would otherwise repeat once per
    compile (e.g. the nop-representation quantize notice under multiple
    quantize modes)."""
    key = message if key is None else key
    if key in _ONCE_SEEN:
        return
    _ONCE_SEEN.add(key)
    warning(message, email=email)


def debug(message):
    logging.getLogger(CustomLogger.loggername).debug(message)


# ------------------------------------------------------------ small helpers
def labels_to_one_hot(labels, num_classes):
    """Multi-hot encode a list of per-item label lists
    (reference utils_.py:160-169). Accepts a scalar, a flat list, or a list
    of lists; returns (num_items, num_classes) int32."""
    if not isinstance(labels, list):
        labels = [labels]
    norm = []
    for item in labels:
        if isinstance(item, (list, tuple, np.ndarray)):
            norm.append([int(x) for x in item])
        else:
            norm.append([int(item)])
    flat = [l for item in norm for l in item]
    if flat and max(flat) >= num_classes:
        error("Encountered label %d but the number of classes is %d"
              % (max(flat), num_classes))
    onehots = np.zeros((len(norm), num_classes), dtype=np.int32)
    for i, item in enumerate(norm):
        onehots[i, item] = 1
    return onehots


def sublist(llist, sublist_length):
    """Chop a list into consecutive chunks (reference utils_.py:187-192)."""
    return [llist[i:i + sublist_length]
            for i in range(0, len(llist), sublist_length)]


def duplicates(llist):
    seen, dups = set(), set()
    for x in llist:
        if x in seen:
            dups.add(x)
        seen.add(x)
    return dups


def read_file_lines(filename):
    with open(filename, "r") as f:
        return [line.strip() for line in f]


def read_file_dict(filename):
    """key<TAB>value lines -> dict (reference utils_.py:234-243)."""
    out = {}
    with open(filename, "r") as f:
        for line in f:
            if not line.strip():
                continue
            key, value = line.strip().split("\t", 1)
            key, value = key.strip(), value.strip()
            if key in out:
                warning("Duplicate key %s in file %s" % (key, filename))
            out[key] = value
    return out


def get_run_checkpoints(run_folder):
    """Sorted checkpoint basenames under <run_folder>/checkpoints
    (reference utils_.py:223-230); our checkpoints are single ``.ckpt``
    directories/files with ``.snap`` sidecars."""
    folder = os.path.join(run_folder, "checkpoints")
    if not os.path.isdir(folder):
        return []
    files = [os.path.join(folder, x) for x in os.listdir(folder)
             if x.endswith(".ckpt") and x != "best.ckpt"]
    # best.ckpt (eval_keep_best) lives OUTSIDE the rotation: it is
    # neither pruned, nor what 'latest' resumes, nor re-evaluated by the
    # multi-checkpoint tools — resume it explicitly with
    # resume_file: best
    return sorted(files, key=os.path.getmtime)


def flush_stdio():
    sys.stdout.flush()
    sys.stderr.flush()


def print_tensor(tensor, message):
    """Debug tensor tap: emits shape + leading values from inside jitted
    code when DEBUG logging is active (counterpart of the reference's
    tf.Print injection, utils_.py:195-208; implemented with
    jax.debug.print so it survives tracing)."""
    if CustomLogger.get_logging_level() != logging.DEBUG:
        # reference semantics (utils_.py:195-208): taps only when the
        # level is exactly DEBUG; an unconfigured logger (NOTSET == 0)
        # must not inject host callbacks into compiled graphs
        return tensor
    if tensor is None:
        debug("[null tensor] " + message)
        return tensor
    try:
        import jax
        jax.debug.print(message + " shape={shape} values={vals}",
                        shape=tensor.shape,
                        vals=tensor.ravel()[:10] if hasattr(tensor, "ravel")
                        else tensor)
    except Exception:
        debug("%s %s" % (message, getattr(tensor, "shape", tensor)))
    return tensor


def ensure_console_logging(level=logging.INFO):
    """Give standalone CLI tools a console handler so info() output is
    visible without a full run configuration."""
    logger = logging.getLogger(CustomLogger.loggername)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s| %(levelname)7s - "
                                         "%(message)s"))
        logger.addHandler(h)
        logger.setLevel(level)
