"""Batching + prefetching data loader feeding the device.

Replaces the reference's torch DataLoader factory (data/__init__.py:43-69):
  * shuffle unless serial_batches, drop_last when training (data/__init__.py:52-58)
  * ``create_inference_dataloader`` clones the options to
    validation/serial/first-style (data/__init__.py:62-69)

TPU-first: a background thread assembles numpy batches (H5 reads + uint8
resizes) while the device computes, and batches are laid out NHWC ready for
``jax.device_put`` with a batch sharding.  With jax.process_count() > 1 each
process loads only its shard of every global batch.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from seg2eye_tpu.data.openeds import OpenEDSDataset

def threaded_iter(src, transform, depth: int):
    """Yield ``transform(item)`` for each item of ``src``, computed ahead of
    the consumer on a daemon worker thread through a bounded queue.

    The single source of the stop-aware producer pattern shared by
    ``DataLoader.__iter__`` (H5 reads + resizes overlap the step) and
    ``device_prefetch`` (host->device transfer overlaps the step):
      * an abandoned iteration (consumer broke out early) must not leave the
        worker blocked forever on a full queue, pinning a batch / H5 handle
        — the put polls a stop event;
      * worker exceptions re-raise on the consumer after any already-queued
        items (no silent swallowing);
      * the consumer's ``finally`` drains the queue so the worker can exit.
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    done = object()
    stop = threading.Event()
    err: List[BaseException] = []

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def work():
        try:
            for item in src:
                if stop.is_set() or not _put(transform(item)):
                    return
        except BaseException as e:          # surfaced below, on the consumer
            err.append(e)
        finally:
            _put(done)

    threading.Thread(target=work, daemon=True).start()
    try:
        while True:
            out = q.get()
            if out is done:
                if err:
                    raise err[0]
                return
            yield out
    finally:
        # consumer finished or abandoned mid-iteration: release the worker
        stop.set()
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break


def collate(items: List[Dict]) -> Dict:
    batch: Dict = {}
    for k in items[0].keys():
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray):
            batch[k] = np.stack(vals)
        else:
            batch[k] = vals
    return batch


class Subset:
    """Fixed-index view of a dataset (the reference's random test-split
    subsampling to ``test_num_samples``, refinenet/core/training.py:99-149).
    Indices are kept sorted for H5 read locality."""

    def __init__(self, dataset, indices: np.ndarray):
        self.dataset = dataset
        self.indices = np.sort(np.asarray(indices))

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        return self.dataset.__getitem__(int(self.indices[idx]), rng=rng)


def subsample(dataset, n: int, seed: int = 0):
    """Random subsample without replacement when the dataset is larger than
    ``n`` (training.py:119-127); otherwise the dataset unchanged."""
    if n and len(dataset) > n:
        rng = np.random.default_rng(seed)
        return Subset(dataset, rng.choice(len(dataset), n, replace=False))
    return dataset


class DataLoader:
    def __init__(self, dataset: OpenEDSDataset, batch_size: int,
                 shuffle: bool, drop_last: bool, seed: int = 0,
                 prefetch: int = 2, process_index: int = 0,
                 process_count: int = 1):
        """``batch_size`` is the GLOBAL batch; with process_count > 1 each
        process loads only its contiguous shard of every global batch (the
        host side of multi-process data parallelism)."""
        assert batch_size % process_count == 0, (batch_size, process_count)
        self.dataset = dataset
        self.batch_size = batch_size
        self.local_batch = batch_size // process_count
        self.process_index = process_index
        self.process_count = process_count
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        # The epoch shuffle MUST stay identical across processes (every
        # process slices the same global permutation) AND across restarts
        # (resumed-vs-unbroken trajectory equivalence,
        # tests/test_e2e.py::test_resume_trajectory_bitwise), so it is
        # STATELESS: a fresh generator seeded by (seed, epoch) per epoch.
        # Per-sample augmentation draws use a fresh generator seeded by
        # (seed, epoch, global index) in _sample_rng — see there.
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, self._epoch)).shuffle(order)
        batches = []
        for i in range(0, n, self.batch_size):
            b = order[i:i + self.batch_size]
            if self.drop_last and len(b) < self.batch_size:
                continue
            batches.append(b)
        return batches

    def skip_next_batches(self, n: int) -> None:
        """Resume support: drop the first ``n`` index batches of the NEXT
        epoch iteration (they were already trained before a mid-epoch
        restart).  One-shot — resets after the next ``__iter__``.  Skipped
        batches are never loaded from disk."""
        self._skip_next = n

    def set_epoch(self, epoch: int) -> None:
        """Pin the NEXT ``__iter__`` to training epoch ``epoch`` (torch
        DistributedSampler convention).  The shuffle and the per-sample
        augmentation streams are keyed by the epoch number, so a resumed
        run that starts at epoch E replays exactly the stream the unbroken
        run saw there — without this, a fresh loader restarts its local
        epoch count at 1 and every stream diverges on resume."""
        self._epoch = epoch - 1

    def __iter__(self) -> Iterator[Dict]:
        self._epoch += 1
        batches = self._index_batches()[getattr(self, "_skip_next", 0):]
        self._skip_next = 0
        if self.prefetch <= 0:
            for idxs in batches:
                yield self._load(idxs)
            return
        yield from threaded_iter(batches, self._load, self.prefetch)

    def _load(self, idxs: np.ndarray) -> Dict:
        if self.process_count > 1:
            # idxs is the GLOBAL batch, known identically on every process,
            # so this check fires (or not) consistently everywhere — a tail
            # sliced at fixed offsets would give processes UNEQUAL local
            # shards, which both diverges control flow downstream and is
            # unassemblable by make_array_from_process_local_data
            if len(idxs) % self.process_count:
                raise ValueError(
                    f"multi-process loading needs every batch divisible by "
                    f"process_count={self.process_count}; got a tail batch "
                    f"of {len(idxs)} — use drop_last, pad the dataset, or "
                    f"pick a dividing batch size")
            local = len(idxs) // self.process_count
            lo = self.process_index * local
            idxs = idxs[lo:lo + local]
        items = [self.dataset.__getitem__(int(i), rng=self._sample_rng(i))
                 for i in idxs]
        return collate(items)

    def _sample_rng(self, idx) -> np.random.Generator:
        """Per-sample generator seeded by (seed, epoch, GLOBAL index).

        A single shared stream would break multi-process DP: each process
        draws only for its shard, so draw counts diverge and any later
        shared use (the epoch shuffle) desynchronizes.  Per-sample seeding
        makes every sample's augmentation independent of process layout,
        batch order, and prefetch timing — a 2-process run draws exactly
        what the single-process run draws for the same (epoch, sample)."""
        return np.random.default_rng((self.seed, self._epoch, int(idx)))

    def get_particular(self, idx: int) -> Dict:
        """Single-sample batch (openeds_dataset.py:121-127 get_particular)."""
        return collate([self.dataset.__getitem__(
            int(idx), rng=self._sample_rng(idx))])


def device_prefetch(iterator, put_fn, depth: int = 1):
    """Wrap a batch iterator so host->device transfer of the next batch
    overlaps the current step (the jax analogue of torch pinned-memory
    prefetch).  ``put_fn`` runs on a worker thread: even a *blocking*
    device_put (e.g. a remote-TPU tunnel, where the transfer itself is the
    bottleneck) overlaps the in-flight step instead of serializing with it.
    Worker exceptions re-raise on the consumer (no silent swallowing)."""
    return threaded_iter(iterator, put_fn, depth)


def create_dataloader(opt, dataset_key: Optional[str] = None) -> DataLoader:
    import jax
    ds = OpenEDSDataset(opt, dataset_key=dataset_key)
    return DataLoader(ds, batch_size=opt.batchSize,
                      shuffle=not opt.serial_batches,
                      drop_last=opt.isTrain, seed=opt.seed,
                      prefetch=opt.prefetch,
                      process_index=jax.process_index() if opt.isTrain else 0,
                      process_count=jax.process_count() if opt.isTrain else 1)


def create_inference_dataloader(opt) -> DataLoader:
    """Validation clone: serial, no flip, first-style (data/__init__.py:62-69)."""
    val_opt = opt.replace(dataset_key="validation", serial_batches=True,
                          no_flip=True, style_sample_method="first",
                          isTrain=False)
    return create_dataloader(val_opt)
