"""Data-parallel training step.

Replaces the reference's DDP loop (runner.py:239-264 +
trainers/ddpm_beat_trainer.py:135-269): one jitted step over a
``jax.sharding`` mesh.  The batch is sharded on the ``data`` axis, parameters
and optimizer state are replicated, and GSPMD inserts the gradient reduction
over ICI — the explicit NCCL all-reduce disappears into the compiler.

Optimisation matches the reference exactly: Adam(2e-4) with global-norm
gradient clipping at 0.5 applied before the update
(ddpm_beat_trainer.py:126-128,343).
"""

from __future__ import annotations


from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffsheg_tpu.config import Config
from diffsheg_tpu.diffusion.losses import LossTerms, diffusion_loss
from diffsheg_tpu.diffusion.schedule import DiffusionSchedule, _gather
from diffsheg_tpu.models.factory import ablate_inputs, build_denoiser


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # loss-second-moment sampler history (empty tuple when uniform)
    t_state: Any = ()


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    # the lr lives in the optimizer state (inject_hyperparams) so it is
    # checkpointed and restored on resume, exactly like the reference's
    # saved Adam param_groups; --reset_lr then forces it back to train.lr
    # (reference train_options.py:15, ddpm_beat_trainer.py:352-354)
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.inject_hyperparams(optax.adam)(learning_rate=cfg.train.lr),
    )


def reset_learning_rate(opt_state, lr: float):
    """Overwrite the checkpointed lr (the --reset_lr behaviour)."""
    clip_state, inner = opt_state
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.asarray(
        hp["learning_rate"]).dtype)
    return (clip_state, inner._replace(hyperparams=hp))


def current_learning_rate(opt_state) -> float:
    return float(opt_state[1].hyperparams["learning_rate"])


def create_train_state(cfg: Config, variables: Dict[str, Any],
                       mesh: Optional[Mesh] = None) -> TrainState:
    """Build the train state; with a 2-axis mesh, parameters and optimizer
    moments are FSDP-sharded over the second (``fsdp``) axis — XLA inserts
    the all-gather/reduce-scatter pair (ZeRO-3) around the jitted step."""
    tx = make_optimizer(cfg)
    params = variables["params"]
    opt_state = tx.init(params)
    t_state = ()
    if cfg.train.timestep_sampler == "loss-second-moment":
        from diffsheg_tpu.diffusion.timestep_sampler import LossAwareState
        t_state = LossAwareState.create(cfg.diffusion.num_steps)
    if mesh is not None and len(mesh.axis_names) > 1 \
            and mesh.shape[mesh.axis_names[1]] > 1:
        from diffsheg_tpu.parallel.mesh import shard_params_fsdp
        params = shard_params_fsdp(mesh, params)
        opt_state = shard_params_fsdp(mesh, opt_state)
    state = TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt_state,
        t_state=t_state,
    )
    if mesh is not None and jax.process_count() > 1:
        # multi-process: every leaf must be a *global* array (replicated —
        # each process initialises identically from the same seed); a jitted
        # step over a global mesh rejects host-local arrays
        from diffsheg_tpu.parallel.mesh import to_global_replicated
        state = to_global_replicated(mesh, state)
    return state


def make_train_step(
    cfg: Config,
    sched: DiffusionSchedule,
    mesh: Optional[Mesh] = None,
    vel_loss_active: bool = True,
    inject_randoms: bool = False,
    frontend=None,
):
    """Build the jitted train step.

    Batch dict fields: ``motion`` (B,T,C), ``mel`` (B,T,A), ``pid`` (B,S),
    optional ``hubert`` (B,T,1024), optional ``sem`` (B,T).

    ``inject_randoms`` changes the signature to ``step(state, batch, t,
    noise)`` with caller-supplied timesteps and diffusion noise — used by the
    reference-lockstep training-parity tests to run both frameworks on
    identical randomness.

    ``frontend`` (audio/frontend.py::make_speech_frontend) moves the speech
    feature extraction INSIDE the compiled step: the batch then carries raw
    ``wave16`` (B, S) audio instead of ``mel``/``hubert`` — ~1.9x fewer
    host->device bytes than shipping 1024-d features (the reference extracts
    HuBERT on the host, ddpm_beat_trainer.py:1429-1475).  NOTE the
    production Trainer does NOT fuse: it runs the frontend as its own jit
    feeding this step (XLA compiled the fused program pathologically —
    >25 min at batch 256 on v5e vs ~80 s for the separate programs); the
    fused variant stays for the step-level equality tests.
    """
    from diffsheg_tpu.config import check_variance_coupling
    check_variance_coupling(cfg)
    model = build_denoiser(cfg.model)
    tx = make_optimizer(cfg)

    use_loss_aware = cfg.train.timestep_sampler == "loss-second-moment"

    def loss_fn(params, batch_stats, batch, t, noise, t_weights, rng_drop):
        x_start = batch["motion"]
        x_t = sched.q_sample(x_start, t, noise)
        sr = _gather(sched.sqrt_recip_alphas_cumprod, t, 3)
        srm1 = _gather(sched.sqrt_recipm1_alphas_cumprod, t, 3)
        variables = {"params": params, "batch_stats": batch_stats}
        mel, pid = ablate_inputs(cfg.model, batch["mel"], batch["pid"])
        extra = {}
        if cfg.model.branch_mode == "exp_condition_gesture":
            extra["exp_cond"] = batch["exp_cond"]
        if cfg.model.add_text_cond:
            extra["word"] = batch["word"]
        if cfg.model.add_emo_cond:
            extra["emo"] = batch["emo"]
        out, mutated = model.apply(
            variables, x_t, t, (sr, srm1), mel, pid,
            hubert=batch.get("hubert"), train=True, mutable=["batch_stats"],
            rngs={"dropout": rng_drop},
            **extra,
        )
        # learned-variance models emit 2C channels; the variance half feeds
        # the hybrid VLB term (gaussian_diffusion.py:1363-1374)
        var_out = None
        if cfg.model.learned_variance:
            from diffsheg_tpu.diffusion.sampler import split_model_output
            out, var_out = split_model_output(out, cfg.diffusion.var_type)
        terms = diffusion_loss(
            sched, out, x_start, x_t, t, noise, cfg.train,
            sem_score=batch.get("sem"), vel_loss_active=vel_loss_active,
            t_weights=t_weights if use_loss_aware else None,
            var_out=var_out, var_type=cfg.diffusion.var_type,
            mean_type=cfg.diffusion.mean_type,
        )
        # per-sample eps loss feeds the sampler's history
        per_sample = ((out - noise) ** 2).mean(axis=(1, 2))
        return terms.total, (terms, mutated["batch_stats"], per_sample)

    def step_fn(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array,
                t_in: Optional[jax.Array] = None,
                noise_in: Optional[jax.Array] = None,
                ) -> Tuple[TrainState, LossTerms]:
        B = batch["motion"].shape[0]
        rng = jax.random.fold_in(rng, state.step)
        rng_t, rng_n, rng_drop = jax.random.split(rng, 3)
        if t_in is not None:
            t, t_weights = t_in, jnp.ones((B,))
        elif use_loss_aware:
            from diffsheg_tpu.diffusion.timestep_sampler import (
                sample_loss_aware)
            t, t_weights = sample_loss_aware(rng_t, B, state.t_state)
        else:
            t = jax.random.randint(rng_t, (B,), 0, sched.num_steps)
            t_weights = jnp.ones((B,))
        noise = (noise_in if noise_in is not None
                 else jax.random.normal(rng_n, batch["motion"].shape))

        if mesh is not None:
            constraint = NamedSharding(mesh, P(mesh.axis_names[0]))
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P(mesh.axis_names[0],
                                             *([None] * (x.ndim - 1))))),
                batch,
            )
            t = jax.lax.with_sharding_constraint(t, constraint)
            noise = jax.lax.with_sharding_constraint(
                noise, NamedSharding(mesh, P(mesh.axis_names[0], None, None)))

        if frontend is not None:
            batch = frontend(batch)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (terms, new_bs, per_sample)), grads = grad_fn(
            state.params, state.batch_stats, batch, t, noise, t_weights,
            rng_drop)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_t_state = state.t_state
        if use_loss_aware:
            from diffsheg_tpu.diffusion.timestep_sampler import (
                update_loss_history)
            new_t_state = update_loss_history(state.t_state, t, per_sample)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            t_state=new_t_state,
        )
        return new_state, terms

    if inject_randoms:
        def injected(state, batch, t, noise):
            return step_fn(state, batch, jax.random.PRNGKey(0),
                           t_in=t, noise_in=noise)
        return jax.jit(injected, donate_argnums=(0,))
    return jax.jit(step_fn, donate_argnums=(0,))
