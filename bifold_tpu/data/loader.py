"""Host-side batching loader feeding the device-side Processor.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=6)``
(/root/reference/bifold/data/__init__.py:67-95): dataset ``__getitem__`` only
does cheap decode/tokenize work, batches are collated as numpy and handed to
``Processor.process_batch`` (one fused XLA program), and an optional
background thread overlaps next-batch host work with device compute
(prefetch=2 double buffering).

Randomness is STATELESS and index-derived: the epoch's shuffle permutation
comes from ``default_rng([seed, epoch])`` and each batch's augmentation key
from ``default_rng([seed, epoch, batch_index])`` — never from a stream that
advances as batches are built. This is what makes step-granular resume exact:
restarting an epoch at batch K (``start_batch``) reproduces the same
remaining batches, keys and all, regardless of how many batches the
interrupted run's prefetch thread had built ahead (the reference can only
resume at epoch granularity, __main__.py:272-302). Call
:meth:`DataLoader.set_epoch` each epoch (the Trainer does).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import numpy as np

__all__ = ["DataLoader", "collate"]


def collate(records: list) -> Dict[str, Any]:
    """Stack a list of raw records into one batch dict.

    ndarray values stack; strings and other scalars become lists;
    ``label_keys`` (identical across records) passes through.
    """
    batch: Dict[str, Any] = {}
    first = records[0]
    for k, v in first.items():
        if k == "label_keys":
            batch[k] = v
        elif isinstance(v, np.ndarray):
            batch[k] = np.stack([r[k] for r in records])
        elif isinstance(v, (np.integer, int, float, np.floating)):
            batch[k] = np.asarray([r[k] for r in records])
        else:
            batch[k] = [r[k] for r in records]
    return batch


class DataLoader:
    """Shuffling/batching iterator over a raw-record dataset.

    Each yielded batch has been through ``processor.process_batch`` (device
    arrays, model-ready). ``drop_last`` defaults True for train so batch
    shapes stay static under jit (no recompiles on the ragged tail).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: Optional[bool] = None,
                 num_workers: int = 0, prefetch: int = 2,
                 process_id: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self._seed = int(seed)
        self.epoch = 0
        # one-shot mid-epoch resume point: __iter__ starts at this batch
        # index (then resets to 0) — the Trainer sets it when a checkpoint
        # carries step_in_epoch > 0
        self.start_batch = 0
        self.processor = dataset.processor
        # multi-process (multi-host) runs: every process iterates the SAME
        # shuffled global order (seeded rng) but materializes only its
        # contiguous slice of each global batch — the slice
        # parallel.shard_batch assembles into the global array via
        # make_array_from_process_local_data (dcn groups devices by process,
        # so contiguous per-process chunks line up with the batch sharding).
        if process_count is None:
            try:
                import jax
                process_count = jax.process_count()
                process_id = jax.process_index() if process_id is None else process_id
            except Exception:  # noqa: BLE001 - jax-free usage stays valid
                process_count, process_id = 1, 0
        self.process_count = process_count
        self.process_id = process_id or 0
        if batch_size % self.process_count:
            raise ValueError(
                f"global batch_size {batch_size} must be divisible by "
                f"process_count {self.process_count}")
        self._local_bs = batch_size // self.process_count
        if self.process_count > 1:
            # ragged tails can't form equal per-process slices (the global
            # array assembly needs identical local shapes on every process)
            self.drop_last = True

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        """Select the epoch whose (seed, epoch)-derived shuffle permutation
        and batch keys the next iteration uses (torch DistributedSampler
        convention). Identical on every process — multi-host runs slice the
        same global order."""
        self.epoch = int(epoch)

    def _index_batches(self, start: int = 0):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng([self._seed, self.epoch]).shuffle(idx)
        nb = len(self)
        for b in range(start, nb):
            g = idx[b * self.batch_size : (b + 1) * self.batch_size]
            # this process's contiguous slice of the global batch
            yield b, g[self.process_id * self._local_bs
                       : (self.process_id + 1) * self._local_bs]

    def _batch_key(self, batch_index: int):
        """Per-(seed, epoch, batch) augmentation key — index-derived so a
        resumed epoch rebuilds batch K with exactly the key the uninterrupted
        run used (a stateful stream would have been advanced by whatever the
        prefetch thread built ahead of the interrupt)."""
        import jax
        seed = np.random.default_rng(
            [self._seed, self.epoch, batch_index]).integers(0, 2 ** 31 - 1)
        return jax.random.key(int(seed))

    def _make_batch(self, batch_index: int, indices) -> Dict[str, Any]:
        records = [self.dataset[int(i)] for i in indices]
        return self.processor.process_batch(collate(records),
                                            key=self._batch_key(batch_index))

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        start, self.start_batch = self.start_batch, 0
        if self.prefetch <= 1:
            for b, indices in self._index_batches(start):
                yield self._make_batch(b, indices)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list = []
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that aborts when the consumer is gone — a plain
            # q.put() would block FOREVER on the full queue if the consumer
            # abandons the iterator mid-epoch (evaluator `break` after
            # `limit` samples, SIGTERM preemption), leaking the thread and
            # the prefetched device batches it holds for the process life
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b, indices in self._index_batches(start):
                    if stop.is_set() or not _put(self._make_batch(b, indices)):
                        return
            except BaseException as e:  # noqa: BLE001 - surfaced on consumer side
                error.append(e)
            finally:
                _put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            # runs on normal exhaustion AND on generator close/GC
            stop.set()
            while True:     # unblock a producer waiting in put()
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5.0)
