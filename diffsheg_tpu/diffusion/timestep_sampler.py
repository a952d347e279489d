"""Timestep samplers for training.

Functional equivalents of the reference schedule samplers
(models/gaussian_diffusion.py:21-170): uniform sampling (shipped default) and
loss-second-moment importance sampling.  The importance sampler's
cross-process ``all_gather`` synchronisation (:90-111) is unnecessary here —
the loss history is a replicated array updated from globally-reduced
per-timestep losses, which the data-parallel mesh provides for free.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def sample_uniform(rng: jax.Array, batch: int, num_steps: int) -> Tuple[jax.Array, jax.Array]:
    """Uniform timesteps and their importance weights (all ones)."""
    t = jax.random.randint(rng, (batch,), 0, num_steps)
    return t, jnp.ones((batch,))


class LossAwareState(NamedTuple):
    """Rolling per-timestep squared-loss history (T, K) and fill counts (T,)."""

    history: jax.Array
    counts: jax.Array

    @staticmethod
    def create(num_steps: int, history_per_term: int = 10) -> "LossAwareState":
        return LossAwareState(
            history=jnp.zeros((num_steps, history_per_term)),
            counts=jnp.zeros((num_steps,), dtype=jnp.int32),
        )

    @property
    def warmed_up(self) -> jax.Array:
        return (self.counts == self.history.shape[1]).all()


def loss_aware_weights(state: LossAwareState, uniform_prob: float = 0.001) -> jax.Array:
    """Sampling distribution over timesteps (gaussian_diffusion.py:143-149):
    p(t) ∝ sqrt(E[loss_t^2]), mixed with a uniform floor; uniform until the
    history is warm."""
    T = state.history.shape[0]
    w = jnp.sqrt(jnp.mean(state.history ** 2, axis=-1))
    w = w / jnp.maximum(w.sum(), 1e-12)
    w = w * (1.0 - uniform_prob) + uniform_prob / T
    uniform = jnp.full((T,), 1.0 / T)
    return jnp.where(state.warmed_up, w, uniform)


def sample_loss_aware(
    rng: jax.Array, batch: int, state: LossAwareState, uniform_prob: float = 0.001
) -> Tuple[jax.Array, jax.Array]:
    """Importance-sample timesteps; returns (t, 1/(T p(t)) weights)."""
    p = loss_aware_weights(state, uniform_prob)
    t = jax.random.choice(rng, p.shape[0], shape=(batch,), p=p)
    weights = 1.0 / (p.shape[0] * p[t])
    return t, weights


def update_loss_history(
    state: LossAwareState, t: jax.Array, losses: jax.Array
) -> LossAwareState:
    """Shift-in new losses at the sampled timesteps
    (gaussian_diffusion.py:113-127 semantics: FIFO once warm)."""
    K = state.history.shape[1]

    def body(carry, inp):
        history, counts = carry
        ti, li = inp
        row = history[ti]
        cnt = counts[ti]
        row = jnp.where(cnt == K, jnp.concatenate([row[1:], li[None]]),
                        row.at[jnp.minimum(cnt, K - 1)].set(li))
        counts = counts.at[ti].set(jnp.minimum(cnt + 1, K))
        return (history.at[ti].set(row), counts), None

    (history, counts), _ = jax.lax.scan(body, (state.history, state.counts),
                                        (t, losses))
    return LossAwareState(history, counts)
