"""Single-window generation: model + schedule + step program, jit-compiled.

``WindowGenerator`` owns the two compiled executables a streaming session
needs (reference trainers/ddpm_beat_trainer.py:185-220 dispatch equivalent):

  - the *plain* program (every respaced step) for the first window;
  - the *harmonize* program (jump schedule from 60% depth) for continuation
    windows, with the RePaint overlap projection folded into the scan.

Model variables are traced arguments (donated weights stay in HBM between
calls); only the small coefficient tables and the step program are baked into
the executable as constants.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from diffsheg_tpu.config import Config
from diffsheg_tpu.diffusion.jump import (
    jump_schedule_ddim,
    make_step_program,
    plain_program,
)
from diffsheg_tpu.diffusion.respace import make_respaced_schedule, space_timesteps
from diffsheg_tpu.diffusion.sampler import RepaintSpec, ddim_sample_program
from diffsheg_tpu.diffusion.schedule import (
    get_named_beta_schedule,
    make_schedule,
    _gather,
)
from diffsheg_tpu.models.factory import (ablate_inputs,
                                         build_denoiser,
                                         denoised_channels)


class WindowGenerator:
    """Compiled window-level sampling for a UniDiffuser checkpoint."""

    def __init__(self, cfg: Config, variables: Dict[str, Any]):
        self.cfg = cfg
        # inference-time reduced precision: store the weights IN the compute
        # dtype so the sampler runs cast-free (bf16 params measured 1.47x
        # faster than f32 on TPU v5e; per-call f32->bf16 casts previously ate
        # the entire win).  Training keeps f32 params regardless.
        dtype = jnp.dtype(cfg.model.compute_dtype)
        if dtype != jnp.float32:
            variables = jax.tree.map(
                lambda x: x.astype(dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                variables)
        self.variables = variables
        self.model = build_denoiser(cfg.model)

        d = cfg.diffusion
        base_betas = get_named_beta_schedule(d.beta_schedule, d.num_steps)
        self.base_schedule = make_schedule(base_betas)
        if d.respacing:
            self.schedule, self.timestep_map = make_respaced_schedule(
                base_betas, space_timesteps(d.num_steps, d.respacing)
            )
        else:
            self.schedule = self.base_schedule
            self.timestep_map = jnp.arange(d.num_steps, dtype=jnp.int32)

        n = self.schedule.num_steps
        self._plain = plain_program(n)
        jl, jns = (1, 1) if d.no_resample else (d.jump_length, d.jump_n_sample)
        self._harmonize = make_step_program(jump_schedule_ddim(n, jl, jns))

        model, sched, tmap = self.model, self.schedule, self.timestep_map
        mcfg, stream, diff = cfg.model, cfg.stream, cfg.diffusion
        spec = RepaintSpec(
            overlap_len=stream.overlap_len,
            add_blend=stream.add_blend,
            same_overlap_noisy=stream.same_overlap_noisy,
        )
        repaint_prog = self._plain if stream.no_repaint else self._harmonize

        def make_denoise_fn(variables, mel, pid, hubert):
            mel, pid = ablate_inputs(mcfg, mel, pid)
            def fn(x: jax.Array, t: jax.Array) -> jax.Array:
                # sqrt-alpha pair at the respaced level, broadcast (B,1,1)
                # (reference gaussian_diffusion.py:527-532).
                sr = _gather(sched.sqrt_recip_alphas_cumprod, t, 3)
                srm1 = _gather(sched.sqrt_recipm1_alphas_cumprod, t, 3)
                return model.apply(
                    variables, x, jnp.take(tmap, t), (sr, srm1), mel, pid,
                    hubert=hubert, train=False,
                    cfg_inference=mcfg.uses_cfg_at_inference,
                )
            return fn

        def sample_plain(variables, mel, pid, hubert, rng):
            B, T = mel.shape[0], mel.shape[1]
            rng, k = jax.random.split(rng)
            noise = jax.random.normal(k, (B, T, denoised_channels(mcfg)))
            x, _ = ddim_sample_program(
                sched, make_denoise_fn(variables, mel, pid, hubert),
                self._plain, noise, rng,
                mean_type=diff.mean_type, clip_denoised=diff.clip_denoised,
                unroll=diff.scan_unroll,
            )
            return x

        def sample_repaint(variables, mel, pid, hubert, gt, prev_tails, rng,
                           prev_tails_valid=None):
            B, T = mel.shape[0], mel.shape[1]
            rng, k = jax.random.split(rng)
            noise = jax.random.normal(k, (B, T, denoised_channels(mcfg)))
            return ddim_sample_program(
                sched, make_denoise_fn(variables, mel, pid, hubert),
                repaint_prog, noise, rng,
                mean_type=diff.mean_type, clip_denoised=diff.clip_denoised,
                repaint=spec, gt=gt, prev_saved_tails=prev_tails,
                prev_tails_valid=prev_tails_valid,
                unroll=diff.scan_unroll,
            )

        self._jit_plain = jax.jit(sample_plain)
        self._jit_repaint = jax.jit(sample_repaint)
        # raw (unjitted) callables for composition into larger programs
        # (the fully-fused streamer traces these inside one jit)
        self.sample_plain_fn = sample_plain
        self.sample_repaint_fn = sample_repaint

    # -- public API -------------------------------------------------------
    def generate(
        self,
        mel: jax.Array,                       # (B, T, n_mels)
        person_id: jax.Array,                 # (B, style_dim)
        rng: jax.Array,
        hubert: Optional[jax.Array] = None,   # (B, T, hubert_dim)
        gt_head: Optional[jax.Array] = None,  # (B, overlap, C) previous tail
        prev_saved_tails: Optional[jax.Array] = None,
    ):
        """Generate one window.

        ``gt_head=None`` runs the plain program (first window); otherwise the
        harmonize program pins the head frames toward ``gt_head``.  Returns
        the sample, plus the saved-tail stack when ``same_overlap_noisy``.
        """
        if self.cfg.model.add_hubert and hubert is None:
            raise ValueError("model config requires hubert features")
        if gt_head is None:
            return self._jit_plain(self.variables, mel, person_id, hubert, rng)
        C = denoised_channels(self.cfg.model)
        gt = jnp.zeros((mel.shape[0], mel.shape[1], C), dtype=jnp.float32)
        gt = gt.at[:, : self.cfg.stream.overlap_len].set(gt_head)
        x, tails = self._jit_repaint(
            self.variables, mel, person_id, hubert, gt, prev_saved_tails, rng
        )
        if self.cfg.stream.same_overlap_noisy:
            return x, tails
        return x

    @property
    def num_model_calls_plain(self) -> int:
        return self._plain.num_model_calls

    @property
    def num_model_calls_repaint(self) -> int:
        return self._harmonize.num_model_calls
