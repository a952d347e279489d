"""Device mesh construction and sharding helpers.

The reference's distribution layer is NCCL DDP: one process per GPU,
gradient all-reduce, DistributedSampler (runner.py:80-122, §2.2 of the
survey).  The TPU-native equivalent is a single-controller ``jax.sharding``
mesh: the batch is sharded along the ``data`` axis, parameters are
replicated, and XLA inserts the gradient ``psum`` over ICI automatically
under jit.  An optional ``fsdp`` axis shards the optimizer/parameter pytrees
for memory-constrained configurations.

Multi-host: ``jax.distributed.initialize()`` before calling ``make_mesh``
gives the same code path across hosts/slices; collectives ride ICI within a
slice and DCN across slices with no code changes here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffsheg_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // max(cfg.fsdp_parallel, 1)
    fsdp = max(cfg.fsdp_parallel, 1)
    if dp * fsdp != n:
        raise ValueError(f"mesh {dp}x{fsdp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, fsdp)
    return Mesh(arr, (cfg.data_axis, cfg.fsdp_axis))


def data_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays onto the mesh, batch-sharded.

    Single-process: plain ``device_put``.  Multi-process: each process holds
    only its local rows (the loader's contiguous block) and the global array
    is assembled across processes with
    ``jax.make_array_from_process_local_data`` — the NCCL-free equivalent of
    the reference's per-rank DataLoader shards (runner.py:250-252).
    """
    multi = jax.process_count() > 1

    def put(x):
        sh = data_sharding(mesh, np.ndim(x))
        if multi:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)
    return jax.tree.map(put, batch)


def to_global_replicated(mesh: Mesh, tree):
    """Convert host-local leaves into fully-replicated *global* arrays.

    Required under ``jax.process_count() > 1``: a jitted step over a global
    mesh only accepts global ``jax.Array`` inputs, and parameters/optimizer
    state are identical on every process (same seeded init), so each process
    contributes its full copy.
    """
    rep = NamedSharding(mesh, P())

    def put(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # already a global array (e.g. FSDP-placed)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])
    return jax.tree.map(put, tree)


def fsdp_sharding(mesh: Mesh, x, min_size: int = 2 ** 14) -> NamedSharding:
    """Fully-sharded-data-parallel placement for one parameter leaf.

    Shards the first axis divisible by the ``fsdp`` mesh size (largest-first
    preference is unnecessary for these shapes); small or indivisible leaves
    stay replicated.  XLA then inserts the all-gather before use and
    reduce-scatter on the gradient — the ZeRO-3 pattern, for free.
    """
    axis = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
    if axis is None:
        return NamedSharding(mesh, P())
    n = mesh.shape[axis]
    if n <= 1 or np.size(x) < min_size:
        return NamedSharding(mesh, P())
    for d, dim in enumerate(np.shape(x)):
        if dim % n == 0 and dim >= n:
            spec = [None] * np.ndim(x)
            spec[d] = axis
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_params_fsdp(mesh: Mesh, tree):
    """Place a parameter/optimizer pytree with per-leaf FSDP shardings."""
    multi = jax.process_count() > 1

    def place(x):
        sh = fsdp_sharding(mesh, x)
        if multi:
            xn = np.asarray(x)
            return jax.make_array_from_callback(
                xn.shape, sh, lambda idx: xn[idx])
        return jax.device_put(x, sh)
    return jax.tree.map(place, tree)
