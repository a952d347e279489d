"""Fused DDIM+RePaint step math (Pallas TPU).

The serving sampler's per-step cost splits roughly half/half between the
denoiser forward and the *step machinery* around it — pred-xstart, the
DDIM update (reference gaussian_diffusion.py:1009-1032), the RePaint
overlap projection + blend (:1034-1056) — a chain of ~20 tiny elementwise
HLOs over a (B, 34, 192) tensor whose fixed per-op costs dominate at
serving shapes (each ~2-5 us on a latency-bound chip).  This module fuses
the whole chain into ONE Pallas program per batch row.

Scope (the shipped serving configuration): ``mean_type='epsilon'``,
``clip_denoised=False``, ``eta=0``.  Under those, the DDIM update
simplifies algebraically — the reconstructed eps equals the model output:

    x0   = r * x - rm1 * eps_out          (r = sqrt(1/ab), rm1 = sqrt(1/ab-1))
    eps' = (sqrt(1/ab) x - x0) / sqrt(1/ab-1) == eps_out
    mean = sqrt(ab_prev) x0 + sqrt(1-ab_prev) eps'

so the kernel computes ``mean`` directly from (x, eps_out) and two scalar
tables, then applies the projection:

    weighed_gt = sqrt(ab_prev) gt + sqrt(1-ab_prev) gt_noise
    head       = prev_tail if (same_overlap_noisy and valid) else weighed_gt
    head       = blend(head, mean) when sqrt(1-ab_prev) < 0.2 (addBlend)
    x_new      = concat([head, mean[ov:]])

Per-step scalars (ab_prev, r, rm1, prev_valid) ride in SMEM; they are
gathered from the schedule tables ONCE before the sampler scan (the
per-row ``_gather`` broadcasts the same scalar B times).

The jnp composition (`ddim_repaint_step_reference`) is the numerics
oracle; dispatch mirrors ops/linear_attention.py (kernel on TPU, oracle
elsewhere; `DIFFSHEG_NO_PALLAS=1` kill-switch).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def ddim_repaint_step_reference(
    x: jax.Array,                 # (B, T, C) current sample
    eps_out: jax.Array,           # (B, T, C) model epsilon prediction
    scal: jax.Array,              # (4,) [ab_prev, r, rm1, prev_valid] f32
    gt: Optional[jax.Array],      # (B, T, C) outpainting GT or None
    gt_noise: Optional[jax.Array],  # (B, T, C)
    prev_tail: Optional[jax.Array],  # (B, ov, C) saved noisy tail or None
    overlap_len: int,
    add_blend: bool,
) -> jax.Array:
    """Pure-jnp composition — oracle and non-TPU path."""
    ab_prev, r, rm1, prev_valid = scal[0], scal[1], scal[2], scal[3]
    sqrt_ab_prev = jnp.sqrt(ab_prev)
    noise_w = jnp.sqrt(1.0 - ab_prev)
    x0 = r * x - rm1 * eps_out
    mean = sqrt_ab_prev * x0 + noise_w * eps_out
    if gt is None:
        return mean
    ov = overlap_len
    weighed_gt = sqrt_ab_prev * gt + noise_w * gt_noise
    head = weighed_gt[:, :ov]
    if prev_tail is not None:
        head = jnp.where(prev_valid > 0, prev_tail, head)
    if add_blend:
        w = jnp.linspace(0.0, 1.0, ov).reshape(1, ov, 1)
        blended = head * (1.0 - w) + mean[:, :ov] * w
        head = jnp.where(noise_w < 0.2, blended, head)
    return jnp.concatenate([head, mean[:, ov:]], axis=1)


def _kernel(ov: int, add_blend: bool, has_tail: bool, has_gt: bool,
            scal_ref, x_ref, eps_ref, gt_ref, gtn_ref, tail_ref, o_ref):
    ab_prev = scal_ref[0]
    r = scal_ref[1]
    rm1 = scal_ref[2]
    sqrt_ab_prev = jnp.sqrt(ab_prev)
    noise_w = jnp.sqrt(1.0 - ab_prev)

    x = x_ref[0]
    eps = eps_ref[0]
    x0 = r * x - rm1 * eps
    mean = sqrt_ab_prev * x0 + noise_w * eps
    if not has_gt:
        o_ref[0] = mean
        return
    weighed_gt = sqrt_ab_prev * gt_ref[0] + noise_w * gtn_ref[0]
    head = weighed_gt[:ov]
    if has_tail:
        head = jnp.where(scal_ref[3] > 0, tail_ref[0], head)
    if add_blend:
        # Mosaic iota must be integer-typed; convert after.  max(ov-1,1)
        # matches jnp.linspace(0,1,1)==[0.] at ov=1 (plain ov-1 would be 0/0)
        w = jax.lax.broadcasted_iota(
            jnp.int32, (ov, 1), 0).astype(jnp.float32) / float(max(ov - 1, 1))
        blended = head * (1.0 - w) + mean[:ov] * w
        head = jnp.where(noise_w < 0.2, blended, head)
    o_ref[0] = jnp.concatenate([head, mean[ov:]], axis=0)


def fused_ddim_repaint_step(
    x: jax.Array,
    eps_out: jax.Array,
    scal: jax.Array,
    gt: Optional[jax.Array],
    gt_noise: Optional[jax.Array],
    prev_tail: Optional[jax.Array],
    overlap_len: int,
    add_blend: bool,
    interpret: bool = False,
) -> jax.Array:
    """One Pallas program for the whole post-model step update."""
    B, T, C = x.shape
    has_gt = gt is not None
    has_tail = prev_tail is not None

    def row(shape):
        return pl.BlockSpec(
            (1,) + tuple(shape[1:]),
            lambda b: (b,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM)

    operands = [x.astype(jnp.float32), eps_out.astype(jnp.float32)]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        row(x.shape), row(x.shape),
    ]
    if has_gt:
        operands += [gt.astype(jnp.float32), gt_noise.astype(jnp.float32)]
        in_specs += [row(x.shape), row(x.shape)]
    else:  # placeholders keep the kernel arity fixed
        zero = jnp.zeros((B, 1, C), jnp.float32)
        operands += [zero, zero]
        in_specs += [row(zero.shape), row(zero.shape)]
    if has_tail:
        operands.append(prev_tail.astype(jnp.float32))
        in_specs.append(row(prev_tail.shape))
    else:
        zt = jnp.zeros((B, 1, C), jnp.float32)
        operands.append(zt)
        in_specs.append(row(zt.shape))

    return pl.pallas_call(
        functools.partial(_kernel, overlap_len, add_blend, has_tail, has_gt),
        grid=(B,),
        in_specs=in_specs,
        out_specs=row(x.shape),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        interpret=interpret,
    )(scal.astype(jnp.float32), *operands)


def supports_fused_step() -> bool:
    """Kernel path available?  One shared Pallas dispatch policy
    (kill-switch + backend probe) lives in ops/linear_attention.py."""
    from diffsheg_tpu.ops.linear_attention import supports_pallas
    return supports_pallas()


def ddim_repaint_step(
    x: jax.Array,
    eps_out: jax.Array,
    scal: jax.Array,
    gt: Optional[jax.Array],
    gt_noise: Optional[jax.Array],
    prev_tail: Optional[jax.Array],
    overlap_len: int,
    add_blend: bool,
    use_fused: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    if use_fused is None:
        use_fused = supports_fused_step()
    elif use_fused:
        # the global kill-switch overrides an explicit fused_step='on'
        # (serving escape hatch for Mosaic regressions; bench.py --check
        # relies on it to A/B every Pallas kernel at once)
        import os
        if os.environ.get("DIFFSHEG_NO_PALLAS"):
            use_fused = False
    if use_fused:
        return fused_ddim_repaint_step(
            x, eps_out, scal, gt, gt_noise, prev_tail, overlap_len,
            add_blend, interpret=interpret)
    return ddim_repaint_step_reference(
        x, eps_out, scal, gt, gt_noise, prev_tail, overlap_len, add_blend)
