"""FGD (Frechet Gesture Distance) evaluation driver.

Combines the frozen feature net with the Frechet distance, replacing two
reference paths:
  - latent-space FGD in the in-train eval loop (reference
    trainers/ddpm_beat_trainer.py:571-642, FIDCalculator.frechet_distance);
  - BVH-level FID over forward-kinematics positions (reference
    datasets/data_tools.py:360-546) via :mod:`diffsheg_tpu.geometry.bvh`.

Feature extraction is batched and jit-compiled; only the final O(D^3)
covariance sqrt runs host-side (D=300).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffsheg_tpu.eval.fgd_net import FgdFeatureNet, FgdNetConfig, init_fgd_net
from diffsheg_tpu.eval.metrics import (
    activation_statistics,
    frechet_distance,
)


class FgdCalculator:
    """Accumulates generated/real latents, then computes FGD."""

    def __init__(self, cfg: FgdNetConfig, variables=None,
                 rng: Optional[jax.Array] = None):
        self.cfg = cfg
        self.model, init_vars = init_fgd_net(cfg, rng)
        self.variables = variables if variables is not None else init_vars
        self._embed = jax.jit(
            lambda v, x: self.model.apply(v, x))
        self.reset()

    def reset(self) -> None:
        self._gen: list = []
        self._real: list = []

    def embed(self, poses: np.ndarray) -> np.ndarray:
        """(B, T, C) windows -> (B, 300) latents."""
        return np.asarray(self._embed(self.variables, jnp.asarray(poses)))

    def update(self, generated: np.ndarray, real: np.ndarray) -> None:
        self._gen.append(self.embed(generated))
        self._real.append(self.embed(real))

    def compute(self) -> float:
        gen = np.concatenate(self._gen, axis=0)
        real = np.concatenate(self._real, axis=0)
        mu1, s1 = activation_statistics(gen)
        mu2, s2 = activation_statistics(real)
        return frechet_distance(mu1, s1, mu2, s2)


def fgd_from_positions(gen_positions: np.ndarray, real_positions: np.ndarray
                       ) -> float:
    """BVH-level FID: Frechet distance directly over flattened world-space
    joint positions per frame (reference data_tools.py:360-546 feeds FK
    position features; here callers pass
    ``geometry.bvh.forward_kinematics`` output reshaped to (T, J*3))."""
    mu1, s1 = activation_statistics(gen_positions)
    mu2, s2 = activation_statistics(real_positions)
    return frechet_distance(mu1, s1, mu2, s2)
