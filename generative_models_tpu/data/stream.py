"""Host-streaming data pipeline: training splits larger than HBM.

The on-device Dataset (data/mnist.py) keeps the whole training split in HBM
and scans the epoch inside one jit — the right call at MNIST scale (the
reference streams even MNIST through 2-worker DataLoaders with a per-step
H2D copy, gms/common.py:102-132, gms/main.py:208). But a production
framework must also train on datasets that do NOT fit in device memory.

StreamingDataset keeps the training split host-resident — anything with
numpy fancy indexing works: np.ndarray, np.memmap / np.lib.format
.open_memmap (so the split need not fit in host RAM either) — and streams
shuffled batches to the device through a background prefetch thread:

  * per epoch, a deterministic permutation of the train indices is drawn
    from the epoch's data key (same key -> same batch order, like the
    on-device path);
  * a daemon thread slices the next batch on the host, applies the optional
    per-batch transform, and `jax.device_put`s it onto the data-axis batch
    sharding (parallel/mesh.py::batch_sharding);
  * a bounded queue holds `prefetch` staged batches, so the H2D copy of
    batch k+1 rides under the device compute of batch k (double buffering);
    device_put dispatches async on TPU, so the queue holds in-flight
    transfers, not host blocks.

The TEST split stays on device: evaluation needs random access
(first_test_batch, eval_heavy's rotating windows) and test splits are small
relative to train. epoch_batches(train=False) therefore works exactly like
the on-device Dataset; epoch_batches(train=True) is refused — the training
harness uses stream_epoch() per-step iteration instead (main.py routes on
`dataset.is_streaming`).

Enable on the CLI with --stream_data=1 (any --data_source). Measured on
chip (scripts/stream_measure.py -> STREAM.json, docs/PERF.md "Streaming
data tier"): overhead vs the on-device epoch-in-one-jit path is 1.01x for
gated_pixel_cnn (compute hides the per-step dispatch+H2D), 1.83x for
diffusion — reduced to 1.00x by --stream_chunk=16 (stacked blocks through
the jitted multi-step scan; dispatch count / 16, same batch order) — and
38x for sub-millisecond-step made, where the residual is raw H2D bandwidth
(188 MB of batches over a ~40 MB/s tunnel), not dispatch. The >HBM
capability run (6M-image memmap split, 17.5 GiB f32-equivalent vs
15.75 GiB HBM) trains a full epoch end-to-end at ~14k imgs/s, which the
on-device tier cannot express at all.
"""

import queue
import threading

import jax
import numpy as np


class _EndOfEpoch:
    pass


_END = _EndOfEpoch()


class _PrefetchIterator:
    """Iterates device-staged batches produced by a background thread.

    The queue is bounded (maxsize = prefetch depth), so the producer stays
    at most `depth` batches ahead. close() (or exhausting the iterator, or
    leaving the `with` block) stops the producer and joins it — breaking
    out of a partial epoch never leaks a thread. Producer exceptions are
    re-raised on the consumer side.
    """

    def __init__(self, produce, depth):
        self._q = queue.Queue(maxsize=max(1, int(depth)))
        self._stop = threading.Event()
        self._err = None
        self._done = False
        self._thread = threading.Thread(
            target=self._work, args=(produce,), daemon=True
        )
        self._thread.start()

    def _put(self, item):
        """Blocking put that stays responsive to close()."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.05)
                return True
            except queue.Full:
                continue
        return False

    def _work(self, produce):
        try:
            for item in produce():
                if not self._put(item):
                    return  # closed mid-epoch
        except BaseException as e:  # surfaced to the consumer in __next__
            self._err = e
        self._put(_END)

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:
            raise StopIteration
        item = self._q.get()
        if isinstance(item, _EndOfEpoch):
            self._done = True
            self._thread.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        """Stop the producer and drop any staged batches."""
        self._stop.set()
        # drain so a producer blocked on put() can observe _stop and exit
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
        self._done = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def _np_seed_from_key(key_or_seed):
    """Derive a numpy SeedSequence from a jax typed key (or a plain int):
    the streaming shuffle is host-side, but its determinism contract is the
    same as the on-device path — one data key per epoch decides the order."""
    if isinstance(key_or_seed, (int, np.integer)):
        return np.random.SeedSequence(int(key_or_seed))
    raw = np.asarray(jax.random.key_data(key_or_seed)).reshape(-1)
    return np.random.SeedSequence(raw.astype(np.uint32).tolist())


class StreamingDataset:
    """Host-resident training split, streamed to device with prefetch.

    train_x/train_y: any numpy-indexable array-likes (ndarray, memmap, ...)
      — sliced per batch, never materialized whole.
    test_x/test_y: small enough for HBM; live on device like data/mnist.py.
    transform: optional host callable applied to each (bs, ...) image batch
      slice BEFORE device_put (use when the on-disk dtype is e.g. uint8 and
      the training dtype is transformed f32 — keeping the big split compact
      on disk is the point of streaming).
    """

    is_streaming = True

    def __init__(
        self,
        train_x,
        train_y,
        test_x,
        test_y,
        bs,
        mesh=None,
        prefetch=2,
        transform=None,
    ):
        from generative_models_tpu.parallel import mesh as pmesh

        self.bs = int(bs)
        self.mesh = mesh or pmesh.get_mesh()
        self.prefetch = int(prefetch)
        self.transform = transform
        self.train_x = train_x  # HOST (array-like)
        self.train_y = train_y
        sh = pmesh.batch_sharding(self.mesh, ndim=4)
        sh1 = pmesh.batch_sharding(self.mesh, ndim=1)
        tx = np.asarray(test_x)
        if transform is not None:
            tx = np.asarray(transform(tx))
        self.test_x = jax.device_put(tx, sh)
        self.test_y = jax.device_put(np.asarray(test_y), sh1)
        self._sh_x = sh
        self._sh_y = sh1
        self.steps_per_epoch = train_x.shape[0] // self.bs  # drop_last
        self.test_steps = self.test_x.shape[0] // self.bs

    def stream_epoch(self, key_or_seed, chunk=1):
        """One shuffled pass over the training split: an iterator (also a
        context manager) of (x, y) batches already placed on device with
        the data-axis batch sharding. Deterministic in the key.

        chunk > 1 stages STACKED (chunk, bs, ...) batch blocks instead of
        single batches — the consumer runs the jitted multi-step epoch scan
        on each block (main.py: model.train_epoch), cutting per-step
        dispatch round-trips (the measured streaming overhead on
        sub-10ms-step models, docs/PERF.md "Streaming data tier") by
        chunk x while device memory stays bounded by chunk batches. The
        batch order is IDENTICAL to chunk=1 (one permutation up front)."""
        rng = np.random.default_rng(_np_seed_from_key(key_or_seed))
        n = self.steps_per_epoch * self.bs
        perm = rng.permutation(self.train_x.shape[0])[:n]
        chunk = max(1, int(chunk))

        def slice_batch(s):
            idx = np.sort(perm[s * self.bs : (s + 1) * self.bs])
            # sorted fancy-index: sequential-ish reads for memmaps; the
            # within-batch order is shuffled again below so sorting
            # costs no randomness across epochs
            order = rng.permutation(self.bs)
            bx = np.asarray(self.train_x[idx])[order]
            by = np.asarray(self.train_y[idx])[order]
            if self.transform is not None:
                bx = np.asarray(self.transform(bx))
            return bx, by

        def produce():
            if chunk == 1:
                for s in range(self.steps_per_epoch):
                    bx, by = slice_batch(s)
                    yield (
                        jax.device_put(bx, self._sh_x),
                        jax.device_put(by, self._sh_y),
                    )
                return
            from generative_models_tpu.parallel import mesh as pmesh

            shx = pmesh.batch_sharding(self.mesh, ndim=5, batch_dim=1)
            shy = pmesh.batch_sharding(self.mesh, ndim=2, batch_dim=1)
            for c0 in range(0, self.steps_per_epoch, chunk):
                steps = min(chunk, self.steps_per_epoch - c0)
                pairs = [slice_batch(c0 + i) for i in range(steps)]
                bx = np.stack([p[0] for p in pairs])
                by = np.stack([p[1] for p in pairs])
                yield (
                    jax.device_put(bx, shx),
                    jax.device_put(by, shy),
                )

        return _PrefetchIterator(produce, self.prefetch)

    # ---- test-split surface, matching data/mnist.py::Dataset ----

    def epoch_batches(self, rng, train=True):
        if train:
            raise ValueError(
                'StreamingDataset has no stacked train epoch (the split '
                'lives on the host); iterate stream_epoch(key) instead'
            )
        n = self.test_steps * self.bs
        perm = jax.random.permutation(rng, self.test_x.shape[0])[:n]
        bx = self.test_x[perm].reshape(self.test_steps, self.bs, *self.test_x.shape[1:])
        by = self.test_y[perm].reshape(self.test_steps, self.bs)
        return bx, by

    def first_test_batch(self, epoch=0):
        idx = np.random.RandomState(epoch).permutation(self.test_x.shape[0])[
            : self.bs
        ]
        return self.test_x[idx], self.test_y[idx]
