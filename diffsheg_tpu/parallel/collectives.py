"""Cross-process reduction + synchronisation helpers.

The reference's distributed plumbing is explicit NCCL calls: metric
``AverageMeter.all_reduce`` (reference trainers/ddpm_beat_trainer.py:
1504-1514), ``dist.all_gather`` in the loss-aware sampler
(models/gaussian_diffusion.py:90-111), and ``dist.barrier`` around
filesystem setup (runner.py:121-122).  Under single-controller JAX most of
this disappears — a mean over a globally-sharded batch IS the reduced value —
but multi-host jobs still need host-side equivalents for values computed
outside jit (per-process eval shards, file staging).  These wrap
``jax.experimental.multihost_utils``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (reference runner.py:122 dist.barrier)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def all_reduce_mean_metrics(metrics: Dict[str, float],
                            weight: float = 1.0) -> Dict[str, float]:
    """Weighted mean of host-side scalar metrics across processes
    (the AverageMeter.all_reduce replacement)."""
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils
    keys = sorted(metrics)
    local = np.asarray([weight] + [metrics[k] * weight for k in keys],
                       dtype=np.float64)
    summed = np.asarray(
        multihost_utils.process_allgather(local)).sum(axis=0)
    total_w = max(summed[0], 1e-12)
    return {k: float(summed[i + 1] / total_w) for i, k in enumerate(keys)}


def all_reduce_nanmean_metrics(metrics: Dict[str, float],
                               weight: float = 1.0) -> Dict[str, float]:
    """Weighted mean across processes that ignores non-finite entries
    per metric.  A process that saw no clips (weight 0) or computed no
    value for one metric (e.g. ``beat_align`` when its samples carry no
    audio) contributes nothing to that metric instead of poisoning the
    global mean with ``NaN * weight``; a metric nobody measured stays
    NaN everywhere."""
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils
    keys = sorted(metrics)
    vals = np.asarray([metrics[k] for k in keys], dtype=np.float64)
    ok = np.isfinite(vals)
    local = np.concatenate([np.where(ok, vals * weight, 0.0),
                            np.where(ok, float(weight), 0.0)])
    summed = np.asarray(
        multihost_utils.process_allgather(local)).sum(axis=0)
    n = len(keys)
    return {k: float(summed[i] / summed[n + i]) if summed[n + i] > 0
            else float("nan")
            for i, k in enumerate(keys)}


def gather_arrays(x: np.ndarray) -> np.ndarray:
    """Concatenate per-process arrays along axis 0 (the dist.all_gather
    pattern in the loss-aware sampler and sharded result writing).
    Requires the SAME shape on every process."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    stacked = multihost_utils.process_allgather(np.asarray(x))
    return np.concatenate(list(stacked), axis=0)


def gather_arrays_ragged(x: np.ndarray) -> np.ndarray:
    """Like :func:`gather_arrays` but per-process leading dims may differ
    (e.g. eval latents when clips don't divide evenly): pad to the global
    max, gather, trim per-process.  Trailing dims must still match."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    x = np.asarray(x)
    counts = np.asarray(multihost_utils.process_allgather(
        np.asarray([x.shape[0]], dtype=np.int64))).reshape(-1)
    m = int(counts.max())
    padded = np.zeros((m,) + x.shape[1:], x.dtype)
    padded[: x.shape[0]] = x
    stacked = np.asarray(multihost_utils.process_allgather(padded))
    return np.concatenate(
        [stacked[p, : counts[p]] for p in range(len(counts))], axis=0)
