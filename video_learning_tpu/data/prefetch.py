"""Background batch prefetching: overlap host-side record decode with
device compute.

The reference's hot loop is serial — python decode, then sess.run
(SURVEY §3.1); here a bounded producer thread keeps ``depth`` prepared
batches ahead of the training step, so record IO + label framing run while
the accelerator executes the previous step.  Each yielded item carries the
batch index *at production time* so checkpoints record the correct resume
position even while the feeder's cursor runs ahead of consumption.
"""

import queue
import threading

class _Stop:
    pass


class FeedPrefetcher:
    """Iterate one epoch's batches with background preparation.

    prepare_fn(feed, batches) -> feed : optional post-processing hook
    (e.g. caption input framing) applied in the producer thread.
    """

    def __init__(self, feeder, required_input, prepare_fn=None, depth=2):
        self.feeder = feeder
        self.required_input = required_input
        self.prepare_fn = prepare_fn
        self.depth = max(1, depth)
        # the datasets' reusable read-buffer ring must outlast every
        # in-flight batch: producer(1) + queue(depth) + consumer(1).  A
        # deeper prefetch with ring reuse enabled would silently rewrite
        # pixels still queued — refuse loudly instead.
        from video_learning_tpu.data.dataset import Dataset
        if self.depth + 2 > Dataset._BUF_RING:
            from video_learning_tpu.utils import error
            error("Prefetch depth %d needs a read-buffer ring >= %d "
                  "(Dataset._BUF_RING is %d); raise the ring or lower "
                  "the depth" % (self.depth, self.depth + 2,
                                 Dataset._BUF_RING))

    def __iter__(self):
        q = queue.Queue(maxsize=self.depth)
        exc = []
        cancelled = threading.Event()

        def put(item):
            # bounded put that notices consumer cancellation, so an early
            # consumer exit never leaves the producer blocked (and never
            # leaves a live thread advancing the shared feeder)
            while not cancelled.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                while not cancelled.is_set() and self.feeder.loop():
                    batch_index = self.feeder.get_batch_index()
                    feed, batches = self.feeder.get_feed(
                        self.required_input)
                    if self.prepare_fn is not None:
                        feed = self.prepare_fn(feed, batches)
                    if not put((feed, batches, batch_index)):
                        return
            except BaseException as ex:  # surfaced on the consumer side
                exc.append(ex)
            finally:
                put(_Stop)

        worker = threading.Thread(target=produce, daemon=True,
                                  name="feed-prefetch")
        worker.start()
        try:
            while True:
                item = q.get()
                if item is _Stop:
                    break
                yield item
        finally:
            cancelled.set()
            # never abandon a live producer: a stale thread finishing a
            # blocking get_feed after the caller rewinds the feeder would
            # silently advance the fresh cursors (skipped/dup batches)
            worker.join(timeout=30)
            while worker.is_alive():
                from video_learning_tpu.utils import warning
                warning("Prefetch worker still draining a blocking read; "
                        "waiting before releasing the feeder")
                worker.join(timeout=30)
        if exc:
            raise exc[0]
