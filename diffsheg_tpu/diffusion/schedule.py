"""Diffusion noise schedules and coefficient tables.

TPU-native design: every per-timestep coefficient is a static table computed
once on host in float64 (matching the reference's precision choice,
models/gaussian_diffusion.py:350-387) and materialised as a single stacked
``(num_tables, T)`` float32 device array.  Samplers gather rows with
``table[t]`` inside ``jit`` — no recomputation, no host sync, one small array
resident in HBM.

Reference behaviour covered here:
  - get_named_beta_schedule            (gaussian_diffusion.py:234-258)
  - betas_for_alpha_bar                (gaussian_diffusion.py:261-278)
  - the GaussianDiffusion coefficient precomputation (:350-387)
  - q_sample / q_posterior closed forms (:423-462, :475-497)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    """Beta schedule by name, float64 on host.

    'linear' is the Ho et al. schedule rescaled so its limit is invariant to
    ``num_steps`` (reference gaussian_diffusion.py:243-251); 'cosine' is the
    improved-DDPM alpha-bar discretisation (:252-256).
    """
    if name == "linear":
        scale = 1000.0 / num_steps
        return np.linspace(scale * 1e-4, scale * 0.02, num_steps, dtype=np.float64)
    if name == "cosine":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [
            min(1.0 - alpha_bar((i + 1) / num_steps) / alpha_bar(i / num_steps), 0.999)
            for i in range(num_steps)
        ]
        return np.array(betas, dtype=np.float64)
    raise ValueError(f"unknown beta schedule: {name!r}")


class DiffusionSchedule(NamedTuple):
    """Immutable per-timestep coefficient tables (each shape ``(T,)`` float32).

    A NamedTuple of arrays is a JAX pytree, so a schedule can be closed over by
    jitted functions or passed as an argument without re-tracing.
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    alphas_cumprod_next: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    # fixed_large variance tables (gaussian_diffusion.py:567-570)
    large_variance: jax.Array
    log_large_variance: jax.Array

    @property
    def num_steps(self) -> int:
        return self.betas.shape[0]

    # -- closed-form q(.) operations -------------------------------------
    def q_sample(self, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """Sample x_t ~ q(x_t | x_0).  ``t`` is (B,) int; broadcasts over trailing dims."""
        a = _gather(self.sqrt_alphas_cumprod, t, x_start.ndim)
        s = _gather(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
        return a * x_start + s * noise

    def q_posterior_mean(self, x_start: jax.Array, x_t: jax.Array, t: jax.Array) -> jax.Array:
        c1 = _gather(self.posterior_mean_coef1, t, x_t.ndim)
        c2 = _gather(self.posterior_mean_coef2, t, x_t.ndim)
        return c1 * x_start + c2 * x_t

    def predict_xstart_from_eps(self, x_t: jax.Array, t: jax.Array, eps: jax.Array) -> jax.Array:
        r = _gather(self.sqrt_recip_alphas_cumprod, t, x_t.ndim)
        rm1 = _gather(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)
        return r * x_t - rm1 * eps

    def predict_eps_from_xstart(self, x_t: jax.Array, t: jax.Array, x0: jax.Array) -> jax.Array:
        r = _gather(self.sqrt_recip_alphas_cumprod, t, x_t.ndim)
        rm1 = _gather(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)
        return (r * x_t - x0) / rm1

    def predict_xstart_from_xprev(self, x_t: jax.Array, t: jax.Array, xprev: jax.Array) -> jax.Array:
        c1 = _gather(1.0 / self.posterior_mean_coef1, t, x_t.ndim)
        c2 = _gather(self.posterior_mean_coef2 / self.posterior_mean_coef1, t, x_t.ndim)
        return c1 * xprev - c2 * x_t

    def undo(self, x: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """RePaint re-noising: one forward-diffusion step at level ``t``
        (reference gaussian_diffusion.py:467-473)."""
        beta = _gather(self.betas, t, x.ndim)
        return jnp.sqrt(1.0 - beta) * x + jnp.sqrt(beta) * noise


def _gather(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """``table[t]`` reshaped to broadcast against an ndim-rank batch tensor
    (the reference's _extract_into_tensor, gaussian_diffusion.py:1504-1515)."""
    out = jnp.take(table, t, axis=0).astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def make_schedule(betas: np.ndarray) -> DiffusionSchedule:
    """Build all coefficient tables from a 1-D beta array.

    Host-side float64 throughout (parity with gaussian_diffusion.py:350-387),
    cast to float32 on device placement.
    """
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()

    alphas = 1.0 - betas
    acp = np.cumprod(alphas, axis=0)
    acp_prev = np.append(1.0, acp[:-1])
    acp_next = np.append(acp[1:], 0.0)

    posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    large_variance = np.append(posterior_variance[1], betas[1:])

    def dev(x):
        return jnp.asarray(x, dtype=jnp.float32)

    return DiffusionSchedule(
        betas=dev(betas),
        alphas_cumprod=dev(acp),
        alphas_cumprod_prev=dev(acp_prev),
        alphas_cumprod_next=dev(acp_next),
        sqrt_alphas_cumprod=dev(np.sqrt(acp)),
        sqrt_one_minus_alphas_cumprod=dev(np.sqrt(1.0 - acp)),
        log_one_minus_alphas_cumprod=dev(np.log(1.0 - acp)),
        sqrt_recip_alphas_cumprod=dev(np.sqrt(1.0 / acp)),
        sqrt_recipm1_alphas_cumprod=dev(np.sqrt(1.0 / acp - 1.0)),
        posterior_variance=dev(posterior_variance),
        posterior_log_variance_clipped=dev(posterior_log_variance_clipped),
        posterior_mean_coef1=dev(betas * np.sqrt(acp_prev) / (1.0 - acp)),
        posterior_mean_coef2=dev((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        large_variance=dev(large_variance),
        log_large_variance=dev(np.log(large_variance)),
    )
