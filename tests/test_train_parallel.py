"""Training step + data-parallel mesh tests (8 virtual CPU devices)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffsheg_tpu.config import beat_config
from diffsheg_tpu.diffusion.schedule import get_named_beta_schedule, make_schedule
from diffsheg_tpu.diffusion.timestep_sampler import (
    LossAwareState,
    sample_loss_aware,
    sample_uniform,
    update_loss_history,
)
from diffsheg_tpu.models.unidiffuser import init_unidiffuser
from diffsheg_tpu.parallel.mesh import make_mesh, shard_batch
from diffsheg_tpu.train.step import create_train_state, make_train_step


def tiny_cfg():
    cfg = beat_config()
    return cfg.replace(model=dataclasses.replace(
        cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
        hubert_latent_dim=16))


def make_batch(cfg, B, T, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 4)
    return {
        "motion": jax.random.normal(ks[0], (B, T, cfg.model.motion_dim)) * 0.5,
        "mel": jax.random.normal(ks[1], (B, T, cfg.model.audio_dim)),
        "pid": jax.nn.one_hot(jnp.arange(B) % cfg.model.style_dim,
                              cfg.model.style_dim),
        "hubert": jax.random.normal(ks[2], (B, T, cfg.model.hubert_dim)) * 0.1,
        "sem": jnp.abs(jax.random.normal(ks[3], (B, T))),
    }


class TestTrainStep:
    def test_loss_decreases_on_repeated_batch(self):
        cfg = tiny_cfg()
        _, variables = init_unidiffuser(cfg.model, 8, jax.random.PRNGKey(0))
        sched = make_schedule(get_named_beta_schedule("linear", 1000))
        step = make_train_step(cfg, sched)
        state = create_train_state(cfg, variables)
        batch = make_batch(cfg, 4, 8)
        rng = jax.random.PRNGKey(42)
        # The step folds rng with state.step, so different steps draw
        # different (t, noise) and raw losses are not comparable across
        # steps.  Probe deterministically instead: loss on the *same*
        # (t, noise) (step counter pinned to 0) before vs after training.
        def probe_loss(st):
            # the step donates its input state; probe on a copy
            cp = jax.tree.map(jnp.copy, st)._replace(
                step=jnp.zeros((), jnp.int32))
            _, terms = step(cp, batch, rng)
            return float(terms.total)

        first_loss = probe_loss(state)
        losses = []
        for _ in range(8):
            state, terms = step(state, batch, rng)
            losses.append(float(terms.total))
        final_loss = probe_loss(state)
        assert all(np.isfinite(losses))
        assert final_loss < first_loss

    def test_step_counter_and_param_change(self):
        cfg = tiny_cfg()
        _, variables = init_unidiffuser(cfg.model, 8, jax.random.PRNGKey(0))
        sched = make_schedule(get_named_beta_schedule("linear", 1000))
        step = make_train_step(cfg, sched)
        state = create_train_state(cfg, variables)
        p0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
        state, _ = step(state, make_batch(cfg, 4, 8), jax.random.PRNGKey(0))
        assert int(state.step) == 1
        changed = jax.tree.map(
            lambda a, b: not np.allclose(a, np.asarray(b)), p0, state.params)
        assert any(jax.tree.leaves(changed))


class TestDataParallel:
    def test_eight_device_mesh_step(self):
        assert jax.device_count() >= 8, "conftest must provide 8 cpu devices"
        cfg = tiny_cfg()
        mesh = make_mesh(cfg.mesh, devices=jax.devices()[:8])
        _, variables = init_unidiffuser(cfg.model, 8, jax.random.PRNGKey(0))
        sched = make_schedule(get_named_beta_schedule("linear", 1000))
        with mesh:
            state = create_train_state(cfg, variables)
            step = make_train_step(cfg, sched, mesh=mesh)
            batch = shard_batch(mesh, make_batch(cfg, 16, 8))
            state, terms = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(terms.total))
        assert int(state.step) == 1

    def test_sharded_matches_single_device(self):
        # Same data, same rng: the mesh step must agree with the unsharded
        # step (GSPMD reduction == serial computation).
        cfg = tiny_cfg()
        _, variables = init_unidiffuser(cfg.model, 8, jax.random.PRNGKey(0))
        sched = make_schedule(get_named_beta_schedule("linear", 1000))
        batch = make_batch(cfg, 8, 8)
        rng = jax.random.PRNGKey(7)

        # the step donates its input state, so each run gets its own copy
        step1 = make_train_step(cfg, sched)
        s1 = create_train_state(cfg, jax.tree.map(jnp.copy, variables))
        s1, t1 = step1(s1, batch, rng)

        mesh = make_mesh(cfg.mesh, devices=jax.devices()[:8])
        with mesh:
            step8 = make_train_step(cfg, sched, mesh=mesh)
            s8 = create_train_state(cfg, jax.tree.map(jnp.copy, variables))
            s8, t8 = step8(s8, shard_batch(mesh, batch), rng)

        assert float(t1.total) == pytest.approx(float(t8.total), rel=1e-4)

    @pytest.mark.slow  # >60s-class on one CPU core; core tier covers the same path via smaller tests
    def test_dryrun_multichip_entry(self):
        import importlib.util, pathlib
        spec = importlib.util.spec_from_file_location(
            "graft_entry",
            pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)


class TestTimestepSamplers:
    def test_uniform_range(self):
        t, w = sample_uniform(jax.random.PRNGKey(0), 1000, 25)
        assert int(t.min()) >= 0 and int(t.max()) < 25
        np.testing.assert_array_equal(np.asarray(w), 1.0)

    def test_loss_aware_uniform_until_warm(self):
        state = LossAwareState.create(10, history_per_term=4)
        t, w = sample_loss_aware(jax.random.PRNGKey(0), 2000, state)
        # cold history -> uniform: all timesteps hit, weights == 1
        assert len(np.unique(np.asarray(t))) == 10
        np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-5)

    def test_loss_aware_prefers_high_loss_after_warm(self):
        state = LossAwareState.create(4, history_per_term=2)
        # warm up: timestep 3 has much higher loss
        for _ in range(2):
            state = update_loss_history(
                state, jnp.array([0, 1, 2, 3]), jnp.array([0.1, 0.1, 0.1, 10.0]))
        assert bool(state.warmed_up)
        t, _ = sample_loss_aware(jax.random.PRNGKey(1), 4000, state)
        frac3 = float((t == 3).mean())
        assert frac3 > 0.5

    def test_history_fifo(self):
        state = LossAwareState.create(2, history_per_term=2)
        for v in (1.0, 2.0, 3.0):
            state = update_loss_history(state, jnp.array([0]), jnp.array([v]))
        np.testing.assert_allclose(np.asarray(state.history[0]), [2.0, 3.0])


class TestFsdp:
    def test_fsdp_mesh_step_matches_dp(self):
        """data x fsdp (4x2) step must agree with pure-dp: FSDP only changes
        placement, not math."""
        cfg = tiny_cfg()
        _, variables = init_unidiffuser(cfg.model, 8, jax.random.PRNGKey(0))
        sched = make_schedule(get_named_beta_schedule("linear", 1000))
        batch = make_batch(cfg, 8, 8)
        rng = jax.random.PRNGKey(3)

        step1 = make_train_step(cfg, sched)
        s1 = create_train_state(cfg, jax.tree.map(jnp.copy, variables))
        s1, t1 = step1(s1, batch, rng)

        fcfg = dataclasses.replace(cfg.mesh, fsdp_parallel=2)
        mesh = make_mesh(fcfg, devices=jax.devices()[:8])
        with mesh:
            stepf = make_train_step(cfg, sched, mesh=mesh)
            sf = create_train_state(cfg, jax.tree.map(jnp.copy, variables),
                                    mesh=mesh)
            sf, tf = stepf(sf, shard_batch(mesh, batch), rng)

        assert float(t1.total) == pytest.approx(float(tf.total), rel=1e-4)
        # at least one parameter leaf is actually sharded over fsdp
        import numpy as _np
        from diffsheg_tpu.parallel.mesh import fsdp_sharding
        sharded = [
            x for x in jax.tree.leaves(sf.params)
            if hasattr(x, "sharding") and
            any(s is not None for s in getattr(x.sharding, "spec", ()))
        ]
        assert sharded, "no parameter was fsdp-sharded"

    @pytest.mark.slow  # >60s-class on one CPU core; core tier covers the same path via smaller tests
    def test_dryrun_entry_uses_two_axis_mesh(self):
        import importlib.util, pathlib
        spec = importlib.util.spec_from_file_location(
            "graft_entry2",
            pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)  # 4x2 mesh path


class TestLossAwareTraining:
    def test_loss_aware_step_runs_and_updates_history(self):
        cfg = tiny_cfg()
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, timestep_sampler="loss-second-moment"))
        _, variables = init_unidiffuser(cfg.model, 8, jax.random.PRNGKey(0))
        sched = make_schedule(get_named_beta_schedule("linear", 1000))
        step = make_train_step(cfg, sched)
        state = create_train_state(cfg, variables)
        assert state.t_state.history.shape == (1000, 10)
        batch = make_batch(cfg, 4, 8)
        state, terms = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(terms.total))
        # 4 sampled timesteps recorded
        assert int(np.asarray(state.t_state.counts).sum()) == 4
        state, _ = step(state, batch, jax.random.PRNGKey(0))
        assert int(np.asarray(state.t_state.counts).sum()) == 8

    def test_uniform_state_is_empty(self):
        cfg = tiny_cfg()
        _, variables = init_unidiffuser(cfg.model, 8, jax.random.PRNGKey(0))
        state = create_train_state(cfg, variables)
        assert state.t_state == ()


class TestShardedInference:
    def test_batch_sharded_sampling_matches_single_device(self):
        """Serving scales the same way training does: shard the batch axis
        over the mesh and let GSPMD partition the compiled sampler.  The
        sharded run must be value-identical to the single-device run."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from diffsheg_tpu.sampling.generator import WindowGenerator

        cfg = tiny_cfg()
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(0))
        gen = WindowGenerator(cfg, variables)
        B, T = 8, cfg.data.n_poses
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        mel = jax.random.normal(ks[0], (B, T, cfg.model.audio_dim))
        pid = jax.nn.one_hot(jnp.arange(B) % cfg.model.style_dim,
                             cfg.model.style_dim)
        hub = jax.random.normal(ks[1], (B, T, cfg.model.hubert_dim))
        rng = jax.random.PRNGKey(2)

        ref = np.asarray(gen.generate(mel, pid, rng, hub))

        mesh = make_mesh(cfg.mesh, devices=jax.devices()[:8])
        sh = NamedSharding(mesh, P("data"))
        out = gen.generate(jax.device_put(mel, sh), jax.device_put(pid, sh),
                           rng, jax.device_put(hub, sh))
        # partitioned executables tile/schedule float ops differently; the
        # 25-step denoise chain amplifies that to ~1e-4 relative
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-2,
                                   rtol=1e-3)


def test_remat_training_is_bit_identical():
    """model.remat recomputes layer activations in the backward pass
    (nn.remat over DiffusionTransformerLayer) — pure memory/FLOPs trade,
    so one injected-randoms train step must match the stored-activation
    step exactly."""
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    from diffsheg_tpu.config import (Config, DiffusionConfig, ModelConfig,
                                     TrainConfig)
    from diffsheg_tpu.diffusion.schedule import (get_named_beta_schedule,
                                                 make_schedule)
    from diffsheg_tpu.models.factory import init_denoiser
    from diffsheg_tpu.train.step import create_train_state, make_train_step

    def one_step(remat):
        cfg = Config(
            model=ModelConfig(
                pose_dim=8, expression_dim=4, latent_dim=32, num_layers=2,
                num_heads=4, ff_size=64, audio_dim=16, aud_latent_dim=16,
                style_dim=4, add_hubert=False, encode_hubert=False,
                remat=remat),
            diffusion=DiffusionConfig(num_steps=50, respacing=""),
            train=TrainConfig(batch_size=8, use_sem_weighting=False, seed=0))
        _, variables = init_denoiser(cfg.model, 6, jax.random.PRNGKey(0))
        sched = make_schedule(get_named_beta_schedule("linear", 50))
        state = create_train_state(cfg, variables)
        step = make_train_step(cfg, sched, inject_randoms=True)
        rs = np.random.RandomState(0)
        batch = {"motion": jnp.asarray(rs.randn(8, 6, 12), jnp.float32),
                 "mel": jnp.asarray(rs.randn(8, 6, 16), jnp.float32),
                 "pid": jnp.eye(4)[jnp.arange(8) % 4]}
        t = jnp.asarray(rs.randint(0, 50, 8), jnp.int32)
        noise = jnp.asarray(rs.randn(8, 6, 12), jnp.float32)
        state, terms = step(state, batch, t, noise)
        pnorm = sum(jnp.abs(x).sum() for x in jax.tree.leaves(state.params))
        return float(terms.total), float(pnorm)

    plain = one_step(False)
    remat = one_step(True)
    np.testing.assert_allclose(plain, remat, rtol=1e-6)
