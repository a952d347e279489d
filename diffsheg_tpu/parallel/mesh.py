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
    """Place a host pytree of arrays onto the mesh, batch-sharded."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))
    return jax.tree.map(put, batch)
