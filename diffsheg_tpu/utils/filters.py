"""Temporal smoothing filters for generated motion.

The reference smooths output trajectories with a per-channel gaussian filter
(reference utils/utils.py:128-133, scipy.ndimage.gaussian_filter1d).  Here
the filter is a jit-friendly depthwise convolution so it can run on-device
at the end of the sampling graph instead of as a host post-process.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy-compatible gaussian taps: radius = int(truncate * sigma + 0.5)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def motion_temporal_filter(motion: jax.Array, sigma: float = 2.5,
                           truncate: float = 4.0) -> jax.Array:
    """(..., T, C) -> same, gaussian-smoothed along T with edge replication
    ('nearest' mode, matching the scipy default used by the reference)."""
    kernel = jnp.asarray(gaussian_kernel1d(sigma, truncate))
    radius = (kernel.shape[0] - 1) // 2
    moved = jnp.moveaxis(motion, -2, -1)              # (..., C, T)
    padded = jnp.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(radius, radius)],
                     mode="edge")
    out = _depthwise(padded, kernel)
    return jnp.moveaxis(out, -1, -2)


def _depthwise(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """(..., C, Tp) valid 1-D convolution along the last axis, one shared
    kernel — expressed as a strided window matmul (MXU-friendly)."""
    K = kernel.shape[0]
    T = x.shape[-1] - K + 1
    idx = jnp.arange(T)[:, None] + jnp.arange(K)[None, :]
    windows = x[..., idx]                              # (..., C, T, K)
    return jnp.einsum("...tk,k->...t", windows, kernel)
