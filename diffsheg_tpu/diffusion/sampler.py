"""Reverse-process samplers as single compiled scans.

The reference runs its DDIM/RePaint loop in host Python with per-step CUDA
launches (models/gaussian_diffusion.py:976-1278).  Here an entire window
generation — all denoise and re-noise transitions, including the RePaint
outpainting projection and cross-fade — is ONE ``lax.scan`` over a static
:class:`StepProgram`, so XLA compiles the whole sampler into a single
executable with no host round-trips.  This is where the TPU throughput comes
from: the model is small, so the win is eliminating launch/dispatch overhead
and letting XLA overlap and fuse across steps.

Behavioural parity map:
  - DDIM update (eta=0 default) ............ gaussian_diffusion.py:976-1032
  - RePaint projection + addBlend .......... :1034-1063
  - undo / re-noise ........................ :464-473, :1273-1278
  - ancestral p_sample ..................... :684-774
  - plain vs harmonize program selection ... :1106-1159
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diffsheg_tpu.diffusion.jump import StepProgram
from diffsheg_tpu.diffusion.schedule import DiffusionSchedule, _gather

# denoise_fn(x, t) -> model output, where t is (B,) int32 in the *respaced*
# index space.  The closure owns conditioning, timestep_map remapping and CFG.
DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class RepaintSpec:
    """Static outpainting configuration for one window.

    ``overlap_len`` frames at the window head are projected toward a noised
    version of ``gt`` every denoise step; ``add_blend`` linearly cross-fades
    the projection with the free sample once the noise level drops below 0.2
    (reference gaussian_diffusion.py:1036-1056).
    """

    overlap_len: int
    add_blend: bool = True
    same_overlap_noisy: bool = False


class SampleState(NamedTuple):
    x: jax.Array
    rng: jax.Array
    saved_tails: jax.Array  # (T_max+1, B, overlap, C) for same_overlap_noisy


def split_model_output(
    model_out: jax.Array, var_type: str
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Split a learned-variance model output into (mean-part, raw-variance).

    For ``learned``/``learned_range`` the model carries 2C channels
    (reference gaussian_diffusion.py:549-552 ``th.split(model_output, C)``,
    channel-last here); fixed variances pass through untouched.
    """
    if var_type in ("learned", "learned_range"):
        C = model_out.shape[-1] // 2
        return model_out[..., :C], model_out[..., C:]
    return model_out, None


def model_log_variance(
    sched: DiffusionSchedule, var_type: str, var_raw: Optional[jax.Array],
    t: jax.Array, ndim: int,
) -> jax.Array:
    """p(x_{t-1}|x_t) log-variance per ModelVarType
    (reference gaussian_diffusion.py:549-579)."""
    if var_type == "learned":
        return var_raw
    if var_type == "learned_range":
        from diffsheg_tpu.diffusion.vlb import learned_range_logvar
        return learned_range_logvar(sched, var_raw, t)
    if var_type == "fixed_small":
        return _gather(sched.posterior_log_variance_clipped, t, ndim)
    if var_type == "fixed_large":
        return _gather(sched.log_large_variance, t, ndim)
    raise ValueError(var_type)


def _pred_xstart(
    sched: DiffusionSchedule, mean_type: str, x: jax.Array, t: jax.Array,
    model_out: jax.Array, clip_denoised: bool,
) -> jax.Array:
    if mean_type == "epsilon":
        x0 = sched.predict_xstart_from_eps(x, t, model_out)
    elif mean_type == "start_x":
        x0 = model_out
    elif mean_type == "previous_x":
        x0 = sched.predict_xstart_from_xprev(x, t, model_out)
    else:
        raise ValueError(mean_type)
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)
    return x0


def ddim_update(
    sched: DiffusionSchedule,
    x: jax.Array,
    t: jax.Array,
    x0: jax.Array,
    noise: jax.Array,
    eta: float = 0.0,
) -> jax.Array:
    """DDIM eq. 12 step t -> t-1 (reference gaussian_diffusion.py:1009-1032)."""
    ab = _gather(sched.alphas_cumprod, t, x.ndim)
    ab_prev = _gather(sched.alphas_cumprod_prev, t, x.ndim)
    eps = (jnp.sqrt(1.0 / ab) * x - x0) / jnp.sqrt(1.0 / ab - 1.0)
    sigma = (
        eta * jnp.sqrt((1.0 - ab_prev) / (1.0 - ab)) * jnp.sqrt(1.0 - ab / ab_prev)
    )
    mean = x0 * jnp.sqrt(ab_prev) + jnp.sqrt(1.0 - ab_prev - sigma ** 2) * eps
    nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    return mean + nonzero * sigma * noise


def repaint_project(
    sched: DiffusionSchedule,
    spec: RepaintSpec,
    x: jax.Array,            # sample after the DDIM update, (B, T, C)
    t: jax.Array,            # (B,) current timestep (pre-update level)
    gt: jax.Array,           # (B, T, C) ground-truth (only head frames used)
    noise: jax.Array,        # (B, T, C)
    prev_tail: Optional[jax.Array] = None,  # (B, overlap, C) saved noisy tail
    prev_tail_valid: Optional[jax.Array] = None,  # scalar bool (traced)
) -> jax.Array:
    """Project the overlap frames toward noised GT (gaussian_diffusion.py:1034-1056)."""
    ov = spec.overlap_len
    ab_prev = _gather(sched.alphas_cumprod_prev, t, x.ndim)
    noise_w = jnp.sqrt(1.0 - ab_prev)

    weighed_gt = jnp.sqrt(ab_prev) * gt + noise_w * noise
    if prev_tail is not None:
        head = prev_tail
        if prev_tail_valid is not None:
            # dynamic validity lets a scanned window program handle both the
            # first continuation window (no saved tails yet) and later ones
            head = jnp.where(prev_tail_valid, prev_tail, weighed_gt[:, :ov])
        weighed_gt = weighed_gt.at[:, :ov].set(head)

    head_gt = weighed_gt[:, :ov]
    if spec.add_blend:
        w = jnp.linspace(0.0, 1.0, ov).reshape(1, ov, 1)
        blended = head_gt * (1.0 - w) + x[:, :ov] * w
        # scalar noise level (shared across batch rows, as in the reference
        # which tests noise_weight[0,0,0])
        low_noise = noise_w.reshape(noise_w.shape[0], -1)[0, 0] < 0.2
        head_gt = jnp.where(low_noise, blended, head_gt)

    return x.at[:, :ov].set(head_gt)


def ddim_sample_program(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    program: StepProgram,
    noise: jax.Array,
    rng: jax.Array,
    mean_type: str = "epsilon",
    var_type: str = "fixed_small",
    clip_denoised: bool = False,
    eta: float = 0.0,
    repaint: Optional[RepaintSpec] = None,
    gt: Optional[jax.Array] = None,
    prev_saved_tails: Optional[jax.Array] = None,
    prev_tails_valid: Optional[jax.Array] = None,
    unroll: int = 1,
    fused_step: str = "none",
    fused_interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run a full reverse program and return ``(sample, saved_tails)``.

    ``saved_tails`` is meaningful only under ``same_overlap_noisy``: per
    timestep, the noisy overlap tail of this window, consumed by the next
    window's projection (reference gaussian_diffusion.py:1040-1042,1058-1060).

    ``fused_step`` routes the post-model step math (pred-xstart + DDIM
    update + RePaint projection) through ops/step_math.py with the
    schedule scalars gathered once before the scan and no dead-noise RNG
    — applicable to the shipped serving configuration (epsilon / no clip
    / eta=0); other configurations silently use the general composition.
    Modes: 'none' (general path), 'jnp' (streamlined jnp composition —
    XLA still fuses it with neighbours), 'pallas' (one kernel per step —
    measured SLOWER end-to-end than 'jnp' on v5e because the opaque call
    blocks cross-op fusion; kept for kernel experiments).
    """
    B = noise.shape[0]
    do_repaint = repaint is not None and repaint.overlap_len > 0 and gt is not None
    track_tails = do_repaint and repaint.same_overlap_noisy
    n_levels = sched.num_steps + 1
    ov = repaint.overlap_len if do_repaint else 1
    tails0 = jnp.zeros((n_levels, B, ov, noise.shape[-1]), dtype=noise.dtype)
    use_prev = track_tails and prev_saved_tails is not None
    prev_tails = prev_saved_tails if use_prev else tails0

    use_fast = (fused_step != "none" and mean_type == "epsilon"
                and not clip_denoised and eta == 0.0)
    if use_fast:
        from diffsheg_tpu.ops.step_math import ddim_repaint_step
        valid = (prev_tails_valid if use_prev and prev_tails_valid is not None
                 else jnp.asarray(use_prev))
        # per-step schedule scalars, gathered ONCE for the whole program
        # (the in-step _gather would broadcast the same scalar B times at
        # every level)
        scal_all = jnp.stack([
            jnp.take(sched.alphas_cumprod_prev, program.t),
            jnp.take(sched.sqrt_recip_alphas_cumprod, program.t),
            jnp.take(sched.sqrt_recipm1_alphas_cumprod, program.t),
            jnp.broadcast_to(jnp.asarray(valid, jnp.float32).reshape(()),
                             program.t.shape),
        ], axis=1).astype(jnp.float32)
    else:
        scal_all = jnp.zeros((program.t.shape[0], 4), jnp.float32)

    def step(state: SampleState, prog) -> Tuple[SampleState, None]:
        t_scalar, is_denoise, scal = prog
        x, key, tails = state
        key, k_model_noise, k_gt, k_undo = jax.random.split(key, 4)
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)

        def denoise_branch(operand):
            x, tails = operand
            # learned-variance outputs carry 2C channels; the variance half is
            # unused by the eta=0 DDIM update (the reference's ddim_sample
            # reads only pred_xstart, gaussian_diffusion.py:1005-1032) but the
            # mean half must be split out before the eps math (:549-552).
            model_out, _ = split_model_output(denoise_fn(x, t), var_type)
            if use_fast:
                prev_tail = (jnp.take(prev_tails, t_scalar, axis=0)
                             if use_prev else None)
                gt_noise = (jax.random.normal(k_gt, x.shape)
                            if do_repaint else None)
                x_new = ddim_repaint_step(
                    x, model_out, scal,
                    gt if do_repaint else None, gt_noise, prev_tail,
                    ov if do_repaint else 0,
                    repaint.add_blend if do_repaint else False,
                    use_fused=fused_step == "pallas",
                    interpret=fused_interpret,
                ).astype(x.dtype)
            else:
                x0 = _pred_xstart(sched, mean_type, x, t, model_out,
                                  clip_denoised)
                x_new = ddim_update(
                    sched, x, t, x0,
                    jax.random.normal(k_model_noise, x.shape), eta
                )
                if do_repaint:
                    prev_tail = (
                        jnp.take(prev_tails, t_scalar, axis=0)
                        if use_prev else None
                    )
                    x_new = repaint_project(
                        sched, repaint, x_new, t, gt,
                        jax.random.normal(k_gt, x.shape), prev_tail,
                        prev_tails_valid if use_prev else None,
                    )
            if do_repaint and track_tails:
                tails = tails.at[t_scalar].set(x_new[:, -repaint.overlap_len:])
            return x_new, tails

        def undo_branch(operand):
            # The reference records noisy tails only on denoise steps
            # (gaussian_diffusion.py:1058-1060 lives inside ddim_sample).
            x, tails = operand
            x_new = sched.undo(x, t, jax.random.normal(k_undo, x.shape))
            return x_new, tails

        x, tails = jax.lax.cond(is_denoise, denoise_branch, undo_branch, (x, tails))
        return SampleState(x, key, tails), None

    init = SampleState(noise, rng, tails0)
    final, _ = jax.lax.scan(step, init, (program.t, program.denoise, scal_all),
                            unroll=unroll)
    return final.x, final.saved_tails


def ancestral_sample_program(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    noise: jax.Array,
    rng: jax.Array,
    mean_type: str = "epsilon",
    var_type: str = "fixed_small",
    clip_denoised: bool = False,
    program: Optional[StepProgram] = None,
    repaint: Optional[RepaintSpec] = None,
    gt: Optional[jax.Array] = None,
) -> jax.Array:
    """Ancestral sampling with the reference's full ``p_sample`` surface.

    - plain path (``program=None``): every timestep descending
      (reference p_sample_loop_progressive, gaussian_diffusion.py:922-974);
    - ``var_type`` covers all four ModelVarTypes — ``learned``/
      ``learned_range`` split a 2C model output and use the predicted
      log-variance in the transition noise (:549-566, :773);
    - ``repaint`` + ``gt`` enable the inpaint projection: from the second
      denoise step on, the overlap head of ``x`` is replaced by noised GT
      *before* the model call (:729-745 — note this differs from the DDIM
      path, which projects after the update);
    - a jump ``program`` (e.g. from ``jump_schedule_paper``) runs the
      harmonize loop: undo transitions re-noise with beta at ``t+1``
      (p_sample_loop_progressive_harmonize :905-910 passes
      ``t_last + t_shift``).
    """
    B = noise.shape[0]
    if program is None:
        program = StepProgram(
            t=jnp.arange(sched.num_steps - 1, -1, -1, dtype=jnp.int32),
            denoise=jnp.ones((sched.num_steps,), dtype=bool),
        )
    do_repaint = repaint is not None and repaint.overlap_len > 0 and gt is not None

    def step(carry, prog):
        x, key, started = carry
        t_scalar, is_denoise = prog
        key, k_gt, k_trans, k_undo = jax.random.split(key, 4)
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)

        def denoise_branch(x):
            if do_repaint:
                # project BEFORE the model call, but only once a pred_xstart
                # exists (the reference gates on ``pred_xstart is not None``,
                # :729 — i.e. every denoise step after the first)
                ab = _gather(sched.alphas_cumprod, t, x.ndim)
                weighed_gt = (jnp.sqrt(ab) * gt
                              + jnp.sqrt(1.0 - ab)
                              * jax.random.normal(k_gt, x.shape))
                ov = repaint.overlap_len
                head = jnp.where(started, weighed_gt[:, :ov], x[:, :ov])
                x = x.at[:, :ov].set(head)
            out, var_raw = split_model_output(denoise_fn(x, t), var_type)
            x0 = _pred_xstart(sched, mean_type, x, t, out, clip_denoised)
            mean = (out if mean_type == "previous_x"
                    else sched.q_posterior_mean(x0, x, t))
            log_var = model_log_variance(sched, var_type, var_raw, t, x.ndim)
            nonzero = (t != 0).astype(x.dtype).reshape(
                (-1,) + (1,) * (x.ndim - 1))
            return mean + nonzero * jnp.exp(0.5 * log_var) \
                * jax.random.normal(k_trans, x.shape)

        def undo_branch(x):
            return sched.undo(x, t + 1, jax.random.normal(k_undo, x.shape))

        x = jax.lax.cond(is_denoise, denoise_branch, undo_branch, x)
        return (x, key, started | is_denoise), None

    started0 = jnp.zeros((), dtype=bool)
    (x, _, _), _ = jax.lax.scan(
        step, (noise, rng, started0), (program.t, program.denoise))
    return x
