"""Prefetching batch loader.

The reference parallelizes with forked DataLoader workers + RNG reseeding
footwork (``train_syn.py:78-80``, ``worker_init_fn``).  Here the heavy
per-sample work (raw decode, patch store reads) is NumPy/native code that
releases the GIL, so a thread pool + bounded prefetch queue gives the
same overlap without fork hazards; device randomness is key-threaded
jax.random and never lives in the loader.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional

import numpy as onp


def default_collate(items):
    """Stack array fields; keep the first value for non-array fields."""
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], onp.ndarray) and vals[0].dtype != object:
            out[k] = onp.stack(vals)
        elif isinstance(vals[0], (float, int, onp.floating, onp.integer)):
            out[k] = onp.asarray(vals)
        else:
            out[k] = vals if len(vals) > 1 else vals[0]
    return out


class Loader:
    """Iterates dict batches over a Dataset.

    shuffle uses a per-epoch seeded permutation (deterministic given
    ``seed`` and epoch count — the reproducibility story the reference
    gets from global seeding)."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 4, seed: int = 2018, drop_last: bool = False,
                 collate: Callable = default_collate, prefetch: int = 4,
                 shard: tuple = (0, 1)):
        """``shard=(rank, world)`` gives each host its slice of every global
        batch (rows rank::world) — multi-host data loading: all hosts use
        the same seed so permutations agree, each loads 1/world of the
        batch (pair with jax.make_array_from_process_local_data)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.drop_last = drop_last
        self.collate = collate
        self.prefetch = prefetch
        self.shard = shard
        if batch_size % shard[1] != 0:
            raise ValueError(f"batch_size {batch_size} not divisible by world {shard[1]}")
        if shard[1] > 1 and not drop_last:
            # a trailing partial batch would slice into unequal (possibly
            # empty) per-host pieces and desynchronize the global batch
            raise ValueError("multi-host sharding requires drop_last=True")
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        """Pin the shuffle permutation to a training epoch (cross-process
        resume reproducibility; the Engine calls this each epoch)."""
        self._epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = onp.random.default_rng(self.seed + self._epoch)
            return rng.permutation(n)
        return onp.arange(n)

    def __iter__(self):
        if hasattr(self.dataset, "set_epoch"):
            # pin per-sample augmentation streams to the same epoch as
            # the shuffle permutation (thread-scheduling-independent AND
            # resume-reproducible — see datasets.IndexedRNG)
            self.dataset.set_epoch(self._epoch)
        idxs = self._indices()
        self._epoch += 1
        batches = [
            idxs[i : i + self.batch_size]
            for i in range(0, len(idxs), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        rank, world = self.shard
        if world > 1:
            batches = [b[rank::world] for b in batches]

        if self.num_workers <= 0:
            for b in batches:
                yield self.collate([self.dataset[int(j)] for j in b])
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that gives up when the consumer is gone — a
            # blocking q.put would leak the producer thread forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # dataset errors must reach the consumer: a producer that dies
            # silently leaves the train loop blocked in q.get() forever
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(lambda j: self.dataset[int(j)], b))
                        if not put(self.collate(items)):
                            return
            except BaseException as e:  # noqa: BLE001 - re-raised consumer-side
                put(e)
                return
            put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()


def prefetched_map(fn, items, workers: int, window: int):
    """Ordered, bounded-in-flight background map.

    Yields ``fn(item)`` in input order while up to ``window`` calls run
    ahead on ``workers`` threads, so the consumer (typically a device
    forward) only waits on host work when it outruns the window.
    ``workers <= 0`` degenerates to a plain synchronous loop; exceptions
    surface at the failing item's position, exactly like the synchronous
    order.  ``fn`` must be safe to call concurrently on distinct items
    (native decode and patch-store reads are: handle-per-call, GIL
    released)."""
    if workers <= 0:
        for item in items:
            yield fn(item)
        return
    from collections import deque

    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs: deque = deque()
        for item in items:
            futs.append(ex.submit(fn, item))
            if len(futs) >= window:
                yield futs.popleft().result()
        while futs:
            yield futs.popleft().result()


def readahead(iterator, size: int = 2):
    """Run ``iterator`` on a background thread with a bounded queue.

    Exact pass-through semantics (same items, same order, exceptions
    re-raised at their position) — the only change is WHEN the producer
    runs: item i+1's host work (raw decode, packing) overlaps the
    consumer's device compute on item i.  ``size <= 0`` returns the
    iterator unchanged.  The producer thread is reclaimed when the
    consumer finishes or abandons the generator."""
    if size <= 0:
        return iterator

    def gen():
        q: queue.Queue = queue.Queue(maxsize=size)
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for item in iterator:
                    if not put(item):
                        return
            except BaseException as e:  # noqa: BLE001 - re-raised consumer-side
                put(e)
                return
            put(_DONE)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _DONE:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    return gen()


_DONE = object()  # readahead sentinel: None is a legal iterator item


def prefetch_to_device(iterator, mesh, size: int = 2, filter_arrays: bool = True):
    """Wrap a host batch iterator with async device placement: batch i+1's
    host->device transfer overlaps batch i's compute (device_put is async).

    The flax prefetch_to_device pattern, mesh-aware: arrays land already
    sharded over the mesh's data axis.
    """
    import collections

    import numpy as onp

    from eld_tpu.parallel.mesh import shard_batch

    queue = collections.deque()

    def put(batch):
        if filter_arrays:
            batch = {k: v for k, v in batch.items()
                     if isinstance(v, onp.ndarray) and v.dtype != object}
        return shard_batch(mesh, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        yield queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass


def pool_to_device(store, mesh=None, size: Optional[int] = None):
    """Load an entire patch store to the device as one (P, H, W, C) array.

    The scanned trainer (``train.steps.make_train_scan``) samples batches
    on device, so the whole clean set ships ONCE — as raw uint16 (half the
    bytes of f32; the train step normalizes on device with the same
    reciprocal constant as ``PatchStore.__getitem__``).  The SID clean set
    (1288 x 512^2 x 4ch u16) is ~2.7 GB: comfortable in one chip's HBM
    next to the model.

    With ``mesh`` the pool lands replicated (every data shard samples from
    the full set, like every DataLoader worker sees the full dataset).
    """
    import jax

    n = min(size, len(store)) if size else len(store)
    # record() keeps the stored dtype (batch() would promote to f32 and
    # quadruple both the transfer and the pool's HBM footprint)
    recs = onp.stack([store.record(i) for i in range(n)])
    if mesh is not None:
        from eld_tpu.parallel.mesh import replicated

        return jax.device_put(recs, replicated(mesh))
    return jax.device_put(recs)
