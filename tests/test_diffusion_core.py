"""Golden-value tests for the diffusion math core.

Oracles are independent numpy implementations of the published closed forms
(DDPM/DDIM papers), evaluated in float64 — not a translation of any framework.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffsheg_tpu.diffusion import (
    get_named_beta_schedule,
    make_schedule,
    make_respaced_schedule,
    space_timesteps,
    jump_schedule,
    jump_schedule_ddim,
    make_step_program,
    plain_program,
)


class TestBetaSchedules:
    def test_linear_endpoints_1000(self):
        betas = get_named_beta_schedule("linear", 1000)
        assert betas.shape == (1000,)
        assert betas[0] == pytest.approx(1e-4)
        assert betas[-1] == pytest.approx(0.02)
        assert np.all(np.diff(betas) > 0)

    def test_linear_scale_invariance(self):
        # The schedule rescales so fewer steps get proportionally larger betas.
        betas = get_named_beta_schedule("linear", 100)
        assert betas[0] == pytest.approx(1e-3)
        assert betas[-1] == pytest.approx(0.2)

    def test_cosine_bounded(self):
        betas = get_named_beta_schedule("cosine", 1000)
        assert betas.shape == (1000,)
        assert np.all(betas > 0) and np.all(betas <= 0.999)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_named_beta_schedule("quadratic", 10)


class TestScheduleTables:
    def setup_method(self):
        self.betas = get_named_beta_schedule("linear", 1000)
        self.sched = make_schedule(self.betas)

    def test_tables_against_numpy_float64(self):
        alphas = 1.0 - self.betas
        acp = np.cumprod(alphas)
        np.testing.assert_allclose(
            np.asarray(self.sched.alphas_cumprod), acp, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(self.sched.sqrt_recipm1_alphas_cumprod),
            np.sqrt(1.0 / acp - 1.0), rtol=1e-5)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = self.betas * (1 - acp_prev) / (1 - acp)
        np.testing.assert_allclose(
            np.asarray(self.sched.posterior_variance), post_var, rtol=1e-6)
        # clipped log variance: index 0 replaced by index 1
        expect = np.log(np.append(post_var[1], post_var[1:]))
        np.testing.assert_allclose(
            np.asarray(self.sched.posterior_log_variance_clipped), expect,
            rtol=1e-5)

    def test_q_sample_identity_roundtrip(self):
        # predict_xstart_from_eps(q_sample(x0, t, eps), t, eps) == x0
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (4, 34, 192))
        eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
        t = jnp.array([0, 10, 500, 999])
        x_t = self.sched.q_sample(x0, t, eps)
        x0_hat = self.sched.predict_xstart_from_eps(x_t, t, eps)
        np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0),
                                   atol=2e-3)

    def test_predict_eps_roundtrip(self):
        key = jax.random.PRNGKey(7)
        x0 = jax.random.normal(key, (2, 8, 16))
        eps = jax.random.normal(jax.random.fold_in(key, 3), x0.shape)
        t = jnp.array([250, 750])
        x_t = self.sched.q_sample(x0, t, eps)
        eps_hat = self.sched.predict_eps_from_xstart(x_t, t, x0)
        np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps),
                                   atol=1e-3)

    def test_posterior_mean_at_t0_like(self):
        # Posterior mean coefficients sum: coef1 + coef2*sqrt(acp/acp) ~ known identity:
        # for x_start == x_t == x, posterior mean ≈ x at small t.
        x = jnp.ones((1, 2, 3))
        t = jnp.array([1])
        m = self.sched.q_posterior_mean(x, x, t)
        np.testing.assert_allclose(np.asarray(m), 1.0, atol=1e-2)

    def test_undo_matches_formula(self):
        x = jnp.ones((1, 4, 4))
        noise = jnp.full((1, 4, 4), 0.5)
        t = jnp.array([100])
        out = self.sched.undo(x, t, noise)
        beta = float(self.betas[100])
        expect = np.sqrt(1 - beta) * 1.0 + np.sqrt(beta) * 0.5
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


class TestRespacing:
    def test_ddim25_selects_stride40(self):
        steps = space_timesteps(1000, "ddim25")
        assert steps == set(range(0, 1000, 40))

    def test_ddim_impossible_raises(self):
        with pytest.raises(ValueError):
            space_timesteps(10, "ddim7")  # no integer stride of 10 yields 7 steps

    def test_section_counts(self):
        # 300 steps, sections [10, 15, 20] — the reference docstring example.
        steps = space_timesteps(300, [10, 15, 20])
        assert len(steps) == 45
        assert min(steps) == 0 and max(steps) < 300

    def test_respaced_alphas_cumprod_match_base_subsequence(self):
        # Respacing preserves alpha-bar at the retained steps exactly.
        base = get_named_beta_schedule("linear", 1000)
        use = space_timesteps(1000, "ddim25")
        sched, tmap = make_respaced_schedule(base, use)
        assert sched.num_steps == 25
        base_acp = np.cumprod(1.0 - base)
        np.testing.assert_allclose(
            np.asarray(sched.alphas_cumprod),
            base_acp[np.asarray(tmap)], rtol=1e-6)

    def test_timestep_map_is_sorted_stride(self):
        base = get_named_beta_schedule("linear", 1000)
        _, tmap = make_respaced_schedule(base, space_timesteps(1000, "ddim25"))
        np.testing.assert_array_equal(np.asarray(tmap), np.arange(0, 1000, 40))


class TestJumpSchedules:
    def test_walk_is_unit_steps(self):
        # the walk starts at t_T - 1 (reference scheduler.py:192-196)
        ts = jump_schedule_ddim(25, jump_length=3, jump_n_sample=5)
        assert ts[0] == 14 and ts[-1] == -1
        for a, b in zip(ts[:-1], ts[1:]):
            assert abs(a - b) == 1

    def test_default_counts(self):
        # t_T=15: base descent 14..0 plus the final 0->-1 = 15 denoise
        # transitions; jump sites {0,3,6,9} each revisited 4 extra times with
        # 3 undo + 3 denoise per excursion: denoise = 15 + 48 = 63, undo = 48.
        ts = jump_schedule_ddim(25, jump_length=3, jump_n_sample=5)
        prog = make_step_program(ts)
        assert prog.num_transitions == 111
        assert prog.num_model_calls == 63

    def test_fast_counts(self):
        # jump_n_sample=2: denoise = 15 + 4*1*3 = 27, undo = 12.
        prog = make_step_program(jump_schedule_ddim(25, 3, 2))
        assert prog.num_transitions == 39
        assert prog.num_model_calls == 27

    def test_no_resample_is_plain_descent(self):
        ts = jump_schedule_ddim(25, jump_length=1, jump_n_sample=1)
        assert ts == list(range(14, -2, -1))

    def test_non25_respacing_truncates_to_60pct(self):
        ts = jump_schedule_ddim(50, 1, 1)
        assert ts[0] == 29  # walk starts at t_T - 1 = 30 - 1

    def test_generic_t_T(self):
        ts = jump_schedule(10, jump_length=2, jump_n_sample=3)
        assert ts[0] == 9 and ts[-1] == -1
        for a, b in zip(ts[:-1], ts[1:]):
            assert abs(a - b) == 1

    def test_plain_program(self):
        prog = plain_program(25)
        np.testing.assert_array_equal(np.asarray(prog.t), np.arange(24, -1, -1))
        assert bool(prog.denoise.all())

    def test_program_semantics(self):
        # For each denoise transition t decreases by 1; undo increases by 1.
        ts = jump_schedule_ddim(25, 3, 5)
        prog = make_step_program(ts)
        t = np.asarray(prog.t)
        den = np.asarray(prog.denoise)
        cur = ts[0]
        for i in range(len(t)):
            assert t[i] == cur
            cur = cur - 1 if den[i] else cur + 1
        assert cur == -1


class TestGenericJumpSchedule:
    """generic_jump_schedule: the reference's full get_schedule_jump knob
    set (jump2/jump3/start_resampling/n_sample — defaulted-dead in every
    shipped config, reference models/scheduler.py:70-148)."""

    def test_defaults_degenerate_to_single_level(self):
        from diffsheg_tpu.diffusion.jump import (generic_jump_schedule,
                                                 jump_schedule)
        for t_T, L, N in [(15, 3, 5), (15, 1, 2), (10, 2, 3), (250, 10, 10)]:
            assert generic_jump_schedule(
                t_T, jump_length=L, jump_n_sample=N) == \
                jump_schedule(t_T, L, N)

    @pytest.mark.parametrize("kw", [
        dict(n_sample=3),
        dict(jump_length=3, jump_n_sample=2, jump2_length=6,
             jump2_n_sample=2),
        dict(jump_length=2, jump_n_sample=2, jump2_length=4,
             jump2_n_sample=2, jump3_length=8, jump3_n_sample=2),
        dict(jump_length=3, jump_n_sample=4, start_resampling=8),
        dict(n_sample=2, jump_length=5, jump_n_sample=3,
             start_resampling=10),
    ])
    def test_matches_reference_oracle(self, kw):
        """Walk-for-walk equality with the reference's own generator,
        imported from the mounted tree (pure Python, no torch)."""
        import importlib.util
        path = "/root/reference/models/scheduler.py"
        if not os.path.exists(path):
            pytest.skip("reference tree not mounted")
        spec = importlib.util.spec_from_file_location("_ref_sched", path)
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)

        from diffsheg_tpu.diffusion.jump import generic_jump_schedule
        t_T = 15
        ours = generic_jump_schedule(t_T, **kw)
        theirs = ref.get_schedule_jump(
            t_T,
            n_sample=kw.get("n_sample", 1),
            jump_length=kw.get("jump_length", 1),
            jump_n_sample=kw.get("jump_n_sample", 1),
            jump2_length=kw.get("jump2_length", 1),
            jump2_n_sample=kw.get("jump2_n_sample", 1),
            jump3_length=kw.get("jump3_length", 1),
            jump3_n_sample=kw.get("jump3_n_sample", 1),
            start_resampling=kw.get("start_resampling", 10 ** 8),
        )
        assert ours == theirs

    def test_compiles_to_program(self):
        from diffsheg_tpu.diffusion.jump import generic_jump_schedule
        ts = generic_jump_schedule(15, jump_length=3, jump_n_sample=2,
                                   jump2_length=6, jump2_n_sample=2)
        prog = make_step_program(ts)
        assert prog.num_transitions == len(ts) - 1
        # walk semantics hold end-to-end
        cur = ts[0]
        den = np.asarray(prog.denoise)
        for i, t in enumerate(np.asarray(prog.t)):
            assert t == cur
            cur = cur - 1 if den[i] else cur + 1
        assert cur == -1


class TestVlb:
    def _sched(self):
        from diffsheg_tpu.diffusion.schedule import (get_named_beta_schedule,
                                                     make_schedule)
        return make_schedule(get_named_beta_schedule("linear", 100))

    def test_normal_kl_zero_and_closed_form(self):
        import jax.numpy as jnp
        from diffsheg_tpu.diffusion.vlb import normal_kl
        z = jnp.zeros((4,))
        np.testing.assert_allclose(np.asarray(normal_kl(z, z, z, z)), 0.0,
                                   atol=1e-7)
        # KL(N(mu,1) || N(0,1)) = mu^2/2
        mu = jnp.asarray([1.5])
        got = normal_kl(mu, jnp.zeros(1), jnp.zeros(1), jnp.zeros(1))
        np.testing.assert_allclose(np.asarray(got), 1.5 ** 2 / 2, rtol=1e-6)

    def test_discretized_ll_is_normalized(self):
        import jax.numpy as jnp
        from diffsheg_tpu.diffusion.vlb import (
            discretized_gaussian_log_likelihood)
        # total probability over the 255-bin grid ~ 1
        xs = jnp.linspace(-1.0, 1.0, 256)
        ll = discretized_gaussian_log_likelihood(
            xs, jnp.zeros_like(xs), jnp.full_like(xs, np.log(0.3)))
        total = float(np.exp(np.asarray(ll)).sum())
        assert 0.98 < total < 1.02

    def test_vlb_term_zero_for_true_posterior(self):
        import jax, jax.numpy as jnp
        from diffsheg_tpu.diffusion.schedule import _gather
        from diffsheg_tpu.diffusion.vlb import vlb_term
        sched = self._sched()
        B, T, C = 3, 4, 5
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (B, T, C)) * 0.3
        t = jnp.asarray([10, 50, 99])
        xt = sched.q_sample(x0, t, jax.random.normal(key, x0.shape))
        mean = sched.q_posterior_mean(x0, xt, t)
        logvar = _gather(sched.posterior_log_variance_clipped, t, 3)
        term = vlb_term(sched, x0, xt, t, mean,
                        jnp.broadcast_to(logvar, xt.shape))
        np.testing.assert_allclose(np.asarray(term), 0.0, atol=1e-5)

    def test_prior_kl_small_for_standardized_data(self):
        import jax, jax.numpy as jnp
        from diffsheg_tpu.diffusion.vlb import prior_kl
        sched = self._sched()
        x0 = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4))
        kl = prior_kl(sched, x0)
        assert float(np.asarray(kl).mean()) < 0.1  # bits per dim

    def test_learned_range_endpoints(self):
        import jax.numpy as jnp
        from diffsheg_tpu.diffusion.vlb import learned_range_logvar
        sched = self._sched()
        t = jnp.asarray([50])
        lo = learned_range_logvar(sched, -jnp.ones((1, 2, 2)), t)
        hi = learned_range_logvar(sched, jnp.ones((1, 2, 2)), t)
        np.testing.assert_allclose(
            np.asarray(lo)[0, 0, 0],
            float(sched.posterior_log_variance_clipped[50]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(hi)[0, 0, 0], float(np.log(sched.betas[50])), rtol=1e-5)

    def test_split_learned_variance(self):
        import jax.numpy as jnp
        from diffsheg_tpu.diffusion.vlb import split_learned_variance
        x = jnp.arange(12.0).reshape(1, 2, 6)
        a, b = split_learned_variance(x)
        assert a.shape == b.shape == (1, 2, 3)
        np.testing.assert_array_equal(np.asarray(a[0, 0]), [0, 1, 2])
