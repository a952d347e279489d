"""Host input pipeline: sharded shuffling loader with device prefetch.

Replaces the reference's torch DataLoader + DistributedSampler stack
(reference datasets/dataloader.py:16-126, trainers/ddpm_beat_trainer.py:
358-371): in JAX's single-controller model each *process* loads only the
global-batch rows destined for its local devices; arrays then go straight to
device with the target sharding so the train step never sees host data.

Design:
  - epoch order = seeded permutation, round-up to a multiple of the global
    batch (the reference's round-up DistributedSampler semantics,
    dataloader.py:30-40), reseeded per epoch via ``set_epoch`` like
    torch's sampler (ddpm_beat_trainer.py:381);
  - each process takes the contiguous block of every global batch that maps
    onto its addressable devices (process p gets rows
    ``[p*local : (p+1)*local]``) — the layout
    ``jax.make_array_from_process_local_data`` assembles into a
    batch-sharded global array when the mesh's data axis enumerates devices
    in process order (parallel/mesh.py::make_mesh does);
  - a background thread keeps ``prefetch`` batches in flight so host gather
    overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import numpy as np


class ShardedBatchLoader:
    """Iterates seeded, sharded, fixed-size batches over an indexable dataset
    exposing ``batch(indices) -> dict[str, np.ndarray]``."""

    def __init__(
        self,
        dataset,
        global_batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
        transform: Optional[Callable[[Dict], Dict]] = None,
    ):
        assert global_batch_size % process_count == 0, (
            global_batch_size, process_count)
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // process_count
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.transform = transform
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch_size
        return -(-n // self.global_batch_size)

    def _epoch_order(self) -> np.ndarray:
        n = len(self.dataset)
        rng = np.random.RandomState((self.seed * 100003 + self.epoch)
                                    % (2 ** 31))
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        if not self.drop_last:
            pad = (-n) % self.global_batch_size
            if pad:
                order = np.concatenate([order, order[:pad]])
        else:
            order = order[:len(self) * self.global_batch_size]
        return order

    def _local_indices(self, global_rows: np.ndarray) -> np.ndarray:
        b = self.local_batch_size
        return global_rows[self.process_index * b:(self.process_index + 1) * b]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._epoch_order()
        batches = order.reshape(-1, self.global_batch_size)

        if self.prefetch <= 0:
            for rows in batches:
                yield self._make(rows)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        abandoned = threading.Event()

        def worker():
            try:
                for rows in batches:
                    item = self._make(rows)
                    # bounded put that notices an abandoned consumer
                    while not abandoned.is_set():
                        try:
                            q.put(item, timeout=0.25)
                            break
                        except queue.Full:
                            continue
                    if abandoned.is_set():
                        return
            finally:
                try:
                    q.put_nowait(stop)
                except queue.Full:
                    pass

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                yield item
        finally:
            # consumer stopped early (debug mode, max_batches): release the
            # worker instead of leaking a thread blocked on q.put
            abandoned.set()
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def _make(self, global_rows: np.ndarray) -> Dict[str, np.ndarray]:
        b = self.dataset.batch(self._local_indices(global_rows))
        return self.transform(b) if self.transform else b


def device_put_sharded(batch: Dict[str, np.ndarray], mesh, data_axis: str
                       ) -> Dict:
    """Move a host batch onto the mesh, batch axis sharded over ``data_axis``
    (single-process path; multi-process uses
    jax.make_array_from_process_local_data with the same spec)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        spec = P(data_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)
