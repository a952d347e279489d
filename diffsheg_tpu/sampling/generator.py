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
from diffsheg_tpu.diffusion.sampler import (
    RepaintSpec,
    ancestral_sample_program,
    ddim_sample_program,
)
from diffsheg_tpu.diffusion.schedule import (
    get_named_beta_schedule,
    make_schedule,
    _gather,
)
from diffsheg_tpu.models.factory import (ablate_inputs,
                                         build_denoiser,
                                         denoised_channels)
from diffsheg_tpu.models.fast_forward import (extract_fast_params,
                                              fast_unidiffuser_step,
                                              supports_fast_forward)
from diffsheg_tpu.models.level_cache import (build_audio_cache,
                                             build_level_cache,
                                             build_static_cache,
                                             gather_level,
                                             supports_level_cache)
from diffsheg_tpu.models.unidiffuser import UniDiffuser


class WindowGenerator:
    """Compiled window-level sampling for a UniDiffuser checkpoint."""

    def __init__(self, cfg: Config, variables: Dict[str, Any]):
        from diffsheg_tpu.config import check_variance_coupling
        check_variance_coupling(cfg)
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

        # reverse-process family: DDIM (shipped) or ancestral p_sample
        # (reference p_sample_loop/_harmonize, gaussian_diffusion.py:684-920)
        sampler = getattr(diff, "sampler", "ddim")
        if sampler not in ("ddim", "ancestral"):
            raise ValueError(
                f"diffusion.sampler={sampler!r}: valid samplers are "
                "'ddim', 'ancestral'")
        use_ancestral = sampler == "ancestral"
        if use_ancestral and stream.same_overlap_noisy:
            raise ValueError(
                "diffusion.sampler='ancestral' does not support "
                "stream.same_overlap_noisy — the reference's p_sample "
                "inpaint (gaussian_diffusion.py:729-745) has no noisy-"
                "overlap reuse; it is a ddim_sample feature (:1034-1060)")

        # Timestep-level cache (models/level_cache.py): precompute every
        # x-independent conditioning tensor for all respaced levels before
        # the sampler scan, so ~60% of the weights stream from HBM once per
        # window instead of once per step.  Only for the joint UniDiffuser
        # at sampling-friendly step counts; the uncached closure is the
        # general path.
        use_cache = (
            getattr(diff, "level_cache", True)
            and isinstance(self.model, UniDiffuser)
            and supports_level_cache(mcfg)
            and self.schedule.num_steps <= 64
        )
        self._use_level_cache = use_cache
        # whole-layer Pallas kernel (ops/fused_layer.py): consumes the
        # level cache, so it requires it.  'auto' enables it off-CPU;
        # 'on' forces it everywhere (interpret mode on CPU, for tests).
        fused_mode = getattr(diff, "fused_layer", "auto")
        # Mosaic lowering exists only on TPU backends (the axon remote
        # plugin also reports "tpu"); 'on' forces interpret mode elsewhere.
        on_tpu = jax.default_backend() == "tpu"
        use_fast = (
            use_cache
            and supports_fast_forward(mcfg)
            and (fused_mode in ("on", "chain")
                 or (fused_mode == "auto" and on_tpu))
        )
        self._use_fused_layer = use_fast
        fast_chain = fused_mode == "chain"
        fast_interpret = not on_tpu
        # weight-only int8/int4 for the fused transformer stack (opt-in,
        # approximate — diffusion.quantize; PERF.md records the drift)
        fast_quant = getattr(diff, "quantize", "none")
        if fast_quant not in ("none", "int8", "int4"):
            raise ValueError(
                f"diffusion.quantize={fast_quant!r}: valid values are "
                "'none', 'int8', 'int4'")
        if fast_quant != "none" and not use_fast:
            raise ValueError(
                "diffusion.quantize requires the fused-layer fast path "
                "(diffusion.level_cache=True and fused_layer 'auto' on "
                "TPU / 'on' / 'chain'); the Flax path has no quantized "
                "engine")
        # streamlined step math (ops/step_math.py): scalar tables hoisted
        # out of the scan, dead eta=0 noise elided, algebraic eps identity.
        # 'auto' -> the jnp composition on TPU (measured faster than both
        # the general path and the opaque per-step Pallas kernel, which
        # blocks cross-op fusion); 'jnp'/'on'(pallas)/'off' force modes.
        step_mode = getattr(diff, "fused_step", "auto")
        use_fused_step = {
            "off": "none",
            "auto": "jnp" if on_tpu else "none",
            "jnp": "jnp",
            "on": "pallas",
        }.get(step_mode, "none")
        self._use_fused_step = use_fused_step

        def build_cache(variables, mel, pid, hubert):
            """Leveled conditioning cache for one window (None when the
            cache does not apply).  Traced — call inside jit."""
            if not use_cache:
                return None
            mel, pid = ablate_inputs(mcfg, mel, pid)
            return build_level_cache(mcfg, variables, tmap, mel, pid, hubert)

        def cache_static(variables, pid):
            """Window-independent cache part (stylization mods)."""
            if not use_cache:
                return None
            _, pid = ablate_inputs(mcfg, None, pid)
            return build_static_cache(mcfg, variables, tmap, pid)

        def cache_audio(variables, mel, hubert):
            """Audio cache part; mel (N, T, A) may fold windows into N so
            a streamer computes every window's frontend in one batch."""
            if not use_cache:
                return None
            mel, _ = ablate_inputs(mcfg, mel, None)
            return build_audio_cache(mcfg, variables, tmap, mel, hubert)

        def make_fast(variables, T, has_hubert):
            """Kernel-ready weights for the fast path (None when off).
            Traced; a streamer calls this ONCE per stream, outside the
            window scan, so the pad/cast of every layer's weights is
            loop-invariant."""
            if not use_fast:
                return None
            return extract_fast_params(mcfg, variables, T, has_hubert,
                                       quant=fast_quant)

        def make_denoise_fn(variables, mel, pid, hubert, cache=None,
                            fast=None, word=None, emo=None):
            mel, pid = ablate_inputs(mcfg, mel, pid)
            if cache is None:
                fast = None  # the fast path consumes the cache
            elif fast is None and use_fast:
                fast = extract_fast_params(mcfg, variables, mel.shape[1],
                                           hubert is not None,
                                           quant=fast_quant)
            # text/emo-conditioned checkpoints need the label inputs for a
            # structurally consistent apply (null_cond_emb width includes
            # word_f/emotion_f); with no labels available at sampling time
            # (e.g. custom audio) zeros = the training sentinel's clamp
            B_, T_ = mel.shape[0], mel.shape[1]
            if mcfg.add_text_cond and word is None:
                word = jnp.zeros((B_, T_), dtype=jnp.int32)
            if mcfg.add_emo_cond and emo is None:
                emo = jnp.zeros((B_, T_), dtype=jnp.int32)
            def fn(x: jax.Array, t: jax.Array) -> jax.Array:
                # sqrt-alpha pair at the respaced level, broadcast (B,1,1)
                # (reference gaussian_diffusion.py:527-532).
                sr = _gather(sched.sqrt_recip_alphas_cumprod, t, 3)
                srm1 = _gather(sched.sqrt_recipm1_alphas_cumprod, t, 3)
                if fast is not None:
                    # all rows of t share one program level per scan step
                    return fast_unidiffuser_step(
                        mcfg, fast, x, (sr, srm1), gather_level(cache, t[0]),
                        cfg_inference=mcfg.uses_cfg_at_inference,
                        interpret=fast_interpret, chain=fast_chain)
                kw = {}
                if cache is not None:
                    kw["cache"] = gather_level(cache, t[0])
                if word is not None:
                    kw["word"] = word
                if emo is not None:
                    kw["emo"] = emo
                return model.apply(
                    variables, x, jnp.take(tmap, t), (sr, srm1), mel, pid,
                    hubert=hubert, train=False,
                    cfg_inference=mcfg.uses_cfg_at_inference, **kw,
                )
            return fn

        def sample_plain(variables, mel, pid, hubert, rng, cache=None,
                         fast=None):
            B, T = mel.shape[0], mel.shape[1]
            rng, k = jax.random.split(rng)
            noise = jax.random.normal(k, (B, T, denoised_channels(mcfg)))
            fn = make_denoise_fn(variables, mel, pid, hubert, cache, fast)
            if use_ancestral:
                return ancestral_sample_program(
                    sched, fn, noise, rng,
                    mean_type=diff.mean_type, var_type=diff.var_type,
                    clip_denoised=diff.clip_denoised, program=self._plain,
                )
            x, _ = ddim_sample_program(
                sched, fn,
                self._plain, noise, rng,
                mean_type=diff.mean_type, var_type=diff.var_type,
                clip_denoised=diff.clip_denoised,
                unroll=diff.scan_unroll,
                fused_step=use_fused_step, fused_interpret=fast_interpret,
            )
            return x

        def sample_repaint(variables, mel, pid, hubert, gt, prev_tails, rng,
                           prev_tails_valid=None, cache=None, fast=None):
            B, T = mel.shape[0], mel.shape[1]
            rng, k = jax.random.split(rng)
            noise = jax.random.normal(k, (B, T, denoised_channels(mcfg)))
            fn = make_denoise_fn(variables, mel, pid, hubert, cache, fast)
            if use_ancestral:
                x = ancestral_sample_program(
                    sched, fn, noise, rng,
                    mean_type=diff.mean_type, var_type=diff.var_type,
                    clip_denoised=diff.clip_denoised, program=repaint_prog,
                    repaint=spec, gt=gt,
                )
                # no noisy-overlap tails on this path (see the ctor check);
                # keep the (levels, B, ov, C) carry shape for the streamer
                tails = jnp.zeros(
                    (sched.num_steps + 1, B, spec.overlap_len,
                     noise.shape[-1]), noise.dtype)
                return x, tails
            return ddim_sample_program(
                sched, fn,
                repaint_prog, noise, rng,
                mean_type=diff.mean_type, var_type=diff.var_type,
                clip_denoised=diff.clip_denoised,
                repaint=spec, gt=gt, prev_saved_tails=prev_tails,
                prev_tails_valid=prev_tails_valid,
                unroll=diff.scan_unroll,
                fused_step=use_fused_step, fused_interpret=fast_interpret,
            )

        def plain_auto(variables, mel, pid, hubert, rng):
            return sample_plain(variables, mel, pid, hubert, rng,
                                cache=build_cache(variables, mel, pid, hubert))

        def repaint_auto(variables, mel, pid, hubert, gt, prev_tails, rng,
                         prev_tails_valid=None):
            return sample_repaint(
                variables, mel, pid, hubert, gt, prev_tails, rng,
                prev_tails_valid=prev_tails_valid,
                cache=build_cache(variables, mel, pid, hubert))

        self._jit_plain = jax.jit(plain_auto)
        self._jit_repaint = jax.jit(repaint_auto)
        # raw (unjitted) callables for composition into larger programs
        # (the fully-fused streamer traces these inside one jit; it builds
        # the caches itself so the static part is shared across windows and
        # the audio part batches over ALL windows in one shot)
        self.sample_plain_fn = sample_plain
        self.sample_repaint_fn = sample_repaint
        self.build_cache_fn = build_cache
        self.cache_static_fn = cache_static
        self.cache_audio_fn = cache_audio
        self.make_fast_fn = make_fast

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
