"""Variational-lower-bound terms + learned-variance support.

Completes the diffusion core's loss surface (reference
models/gaussian_diffusion.py:1284-1501): gaussian KL, the discretized
gaussian likelihood used for the t=0 term, per-timestep VLB terms, and the
learned-range variance interpolation (``ModelVarType.LEARNED_RANGE``) for
model outputs that carry 2C channels.

All functions are pure jnp and jit-safe; the shipped DiffSHEG configs train
with epsilon-MSE + fixed-small variance, so these terms are available for
the ``kl`` / ``rescaled_kl`` loss types and hybrid objectives rather than on
the default path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from diffsheg_tpu.diffusion.schedule import DiffusionSchedule, _gather


def normal_kl(mean1, logvar1, mean2, logvar2) -> jax.Array:
    """KL(N(mean1, e^logvar1) || N(mean2, e^logvar2)), elementwise in nats
    (reference gaussian_diffusion.py:1284-1305)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x: jax.Array) -> jax.Array:
    """Tanh-based CDF approximation (reference :1442-1448)."""
    return 0.5 * (1.0 + jnp.tanh(
        jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, means, log_scales) -> jax.Array:
    """Log-likelihood of data in [-1, 1] discretized to 255 bins under a
    gaussian (reference :1451-1501)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, 1e-12))),
    )


def learned_range_logvar(
    sched: DiffusionSchedule, var_raw: jax.Array, t: jax.Array
) -> jax.Array:
    """Interpolate log-variance between the posterior (min) and beta (max)
    from a [-1, 1] model output (reference :556-566)."""
    min_log = _gather(sched.posterior_log_variance_clipped, t, var_raw.ndim)
    max_log = _gather(jnp.log(sched.betas), t, var_raw.ndim)
    frac = (var_raw + 1.0) / 2.0
    return frac * max_log + (1.0 - frac) * min_log


def split_learned_variance(model_out: jax.Array
                           ) -> Tuple[jax.Array, jax.Array]:
    """Split a 2C-channel model output into (mean-part, raw-variance)."""
    C = model_out.shape[-1] // 2
    return model_out[..., :C], model_out[..., C:]


def vlb_term(
    sched: DiffusionSchedule,
    x_start: jax.Array,
    x_t: jax.Array,
    t: jax.Array,
    pred_mean: jax.Array,
    pred_logvar: jax.Array,
) -> jax.Array:
    """Per-sample L_{t-1} in bits: KL(q(x_{t-1}|x_t,x_0) || p) for t>0 and
    the discretized decoder NLL at t=0 (reference :1308-1349)."""
    true_mean = sched.q_posterior_mean(x_start, x_t, t)
    true_logvar = _gather(sched.posterior_log_variance_clipped, t, x_t.ndim)
    kl = normal_kl(true_mean, true_logvar, pred_mean, pred_logvar)
    kl = kl.reshape(kl.shape[0], -1).mean(axis=1) / jnp.log(2.0)

    nll = -discretized_gaussian_log_likelihood(
        x_start, pred_mean, 0.5 * pred_logvar)
    nll = nll.reshape(nll.shape[0], -1).mean(axis=1) / jnp.log(2.0)

    return jnp.where(t == 0, nll, kl)


def vb_term_from_output(
    sched: DiffusionSchedule,
    x_start: jax.Array,
    x_t: jax.Array,
    t: jax.Array,
    model_out: jax.Array,      # (B, T, 2C) mean-part ++ raw-variance
    mean_type: str = "epsilon",
    var_type: str = "learned_range",
    clip_denoised: bool = False,
    freeze_mean: bool = False,
) -> jax.Array:
    """Per-sample VLB term (bits) straight from a 2C-channel model output.

    Composes the reference's ``_vb_terms_bpd`` -> ``p_mean_variance`` chain
    (gaussian_diffusion.py:1308-1349, :513-566) into one pure function.
    ``freeze_mean`` reproduces the hybrid-loss trick of detaching the mean
    half so the VLB only trains the variance head (:1366-1374
    ``frozen_out = th.cat([model_output.detach(), model_var_values])``).
    """
    mean_part, var_raw = split_learned_variance(model_out)
    if freeze_mean:
        mean_part = jax.lax.stop_gradient(mean_part)

    if var_type == "learned":
        pred_logvar = var_raw
    elif var_type == "learned_range":
        pred_logvar = learned_range_logvar(sched, var_raw, t)
    else:
        raise ValueError(var_type)

    if mean_type == "previous_x":
        # the model output IS the posterior-mean prediction (reference :591-596)
        pred_mean = mean_part
    else:
        if mean_type == "epsilon":
            x0 = sched.predict_xstart_from_eps(x_t, t, mean_part)
        elif mean_type == "start_x":
            x0 = mean_part
        else:
            raise ValueError(mean_type)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        pred_mean = sched.q_posterior_mean(x0, x_t, t)
    return vlb_term(sched, x_start, x_t, t, pred_mean, pred_logvar)


def prior_kl(sched: DiffusionSchedule, x_start: jax.Array) -> jax.Array:
    """L_T: KL(q(x_T | x_0) || N(0, I)) in bits (reference :1354-1368)."""
    T = sched.num_steps - 1
    t = jnp.full((x_start.shape[0],), T, dtype=jnp.int32)
    mean = _gather(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
    logvar = _gather(jnp.log(1.0 - sched.alphas_cumprod), t, x_start.ndim)
    kl = normal_kl(mean, logvar, jnp.zeros_like(mean), jnp.zeros_like(logvar))
    return kl.reshape(kl.shape[0], -1).mean(axis=1) / jnp.log(2.0)
