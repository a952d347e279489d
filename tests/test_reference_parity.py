"""Numerical parity vs the reference implementation (gated).

When the reference checkout is mounted (at /root/reference or
$DIFFSHEG_REFERENCE), import its diffusion modules and compare our pure-jnp
rebuild against the torch originals: beta schedules, coefficient tables,
q_sample, DDIM updates, respacing maps, and jump schedules.  Skipped
entirely when the reference is absent — the framework is standalone; these
are cross-checks, not dependencies.
"""

import os
import sys

import numpy as np
import pytest

REF = os.environ.get("DIFFSHEG_REFERENCE", "/root/reference")

if not os.path.isdir(os.path.join(REF, "models")):
    pytest.skip("reference checkout not available", allow_module_level=True)

torch = pytest.importorskip("torch")

sys.path.insert(0, REF)
try:
    from models import gaussian_diffusion as ref_gd  # noqa: E402
    from models import respace as ref_respace  # noqa: E402
    from models import scheduler as ref_scheduler  # noqa: E402
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference import failed: {e}", allow_module_level=True)

from diffsheg_tpu.diffusion.jump import jump_schedule_ddim  # noqa: E402
from diffsheg_tpu.diffusion.respace import (  # noqa: E402
    make_respaced_schedule,
    space_timesteps,
)
from diffsheg_tpu.diffusion.sampler import ddim_update  # noqa: E402
from diffsheg_tpu.diffusion.schedule import (  # noqa: E402
    get_named_beta_schedule,
    make_schedule,
)


def _ref_opt():
    """Minimal namespace for the reference's sampler-time flags."""
    from types import SimpleNamespace
    return SimpleNamespace(same_overlap_noisy=False, fix_head_var=False,
                           dataset_name="beat", unidiffuser=False,
                           overlap_len=4, addBlend=True)


def _ref_diffusion(betas):
    return ref_gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=ref_gd.ModelMeanType.EPSILON,
        model_var_type=ref_gd.ModelVarType.FIXED_SMALL,
        loss_type=ref_gd.LossType.MSE,
        opt=_ref_opt(),
    )


class TestSchedules:
    @pytest.mark.parametrize("name", ["linear", "cosine"])
    def test_betas_match(self, name):
        ours = get_named_beta_schedule(name, 1000)
        ref = ref_gd.get_named_beta_schedule(name, 1000)
        np.testing.assert_allclose(ours, ref, rtol=1e-12)

    def test_coefficient_tables_match(self):
        betas = get_named_beta_schedule("linear", 1000)
        ours = make_schedule(betas)
        ref = _ref_diffusion(betas)
        for our_name, ref_name in [
            ("alphas_cumprod", "alphas_cumprod"),
            ("alphas_cumprod_prev", "alphas_cumprod_prev"),
            ("sqrt_alphas_cumprod", "sqrt_alphas_cumprod"),
            ("sqrt_one_minus_alphas_cumprod", "sqrt_one_minus_alphas_cumprod"),
            ("sqrt_recip_alphas_cumprod", "sqrt_recip_alphas_cumprod"),
            ("sqrt_recipm1_alphas_cumprod", "sqrt_recipm1_alphas_cumprod"),
            ("posterior_variance", "posterior_variance"),
            ("posterior_log_variance_clipped",
             "posterior_log_variance_clipped"),
            ("posterior_mean_coef1", "posterior_mean_coef1"),
            ("posterior_mean_coef2", "posterior_mean_coef2"),
        ]:
            np.testing.assert_allclose(
                np.asarray(getattr(ours, our_name)),
                np.asarray(getattr(ref, ref_name)),
                rtol=2e-6, err_msg=our_name)

    def test_q_sample_matches(self):
        betas = get_named_beta_schedule("linear", 1000)
        ours = make_schedule(betas)
        ref = _ref_diffusion(betas)
        rng = np.random.RandomState(0)
        x0 = rng.randn(4, 6, 8).astype(np.float32)
        noise = rng.randn(4, 6, 8).astype(np.float32)
        t = np.asarray([0, 10, 500, 999])
        import jax.numpy as jnp
        got = np.asarray(ours.q_sample(jnp.asarray(x0), jnp.asarray(t),
                                       jnp.asarray(noise)))
        want = ref.q_sample(torch.from_numpy(x0), torch.from_numpy(t),
                            torch.from_numpy(noise)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestRespacing:
    @pytest.mark.parametrize("spec", ["ddim25", "ddim50", "25", "10,10,5"])
    def test_space_timesteps_match(self, spec):
        ours = space_timesteps(1000, spec)
        ref = ref_respace.space_timesteps(1000, spec)
        assert set(ours) == set(ref)

    def test_respaced_betas_match(self):
        base = get_named_beta_schedule("linear", 1000)
        use = space_timesteps(1000, "ddim25")
        ours, tmap = make_respaced_schedule(base, use)
        ref = ref_respace.SpacedDiffusion(
            use_timesteps=use,
            betas=base,
            model_mean_type=ref_gd.ModelMeanType.EPSILON,
            model_var_type=ref_gd.ModelVarType.FIXED_SMALL,
            loss_type=ref_gd.LossType.MSE,
            opt=_ref_opt(),
        )
        np.testing.assert_allclose(np.asarray(ours.betas),
                                   np.asarray(ref.betas), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(tmap),
                                      np.asarray(ref.timestep_map))


class TestJumpSchedules:
    @pytest.mark.parametrize("jl,jns", [(1, 1), (3, 5), (2, 2)])
    def test_cjm_ddim_schedule_matches(self, jl, jns):
        ours = jump_schedule_ddim(25, jump_length=jl, jump_n_sample=jns)
        ref = ref_scheduler.get_schedule_jump_cjm_ddim(
            time_respacing=25, jump_length=jl, jump_n_sample=jns)
        assert list(ours) == list(ref)


class TestDdimUpdate:
    def test_ddim_step_matches_reference_formula(self):
        """One eta=0 DDIM transition against the reference's ddim_sample
        equations (gaussian_diffusion.py:1009-1032), evaluated directly."""
        betas = get_named_beta_schedule("linear", 1000)
        sched = make_schedule(betas)
        ref = _ref_diffusion(betas)
        rng = np.random.RandomState(1)
        x = rng.randn(2, 4, 6).astype(np.float32)
        x0 = (0.5 * rng.randn(2, 4, 6)).astype(np.float32)
        t = np.asarray([100, 700])

        import jax.numpy as jnp
        got = np.asarray(ddim_update(
            sched, jnp.asarray(x), jnp.asarray(t), jnp.asarray(x0),
            jnp.zeros_like(jnp.asarray(x)), eta=0.0))

        # reference formula with torch tables
        tt = torch.from_numpy(t)
        xt = torch.from_numpy(x)
        xs = torch.from_numpy(x0)
        def gather(arr):
            return ref_gd._extract_into_tensor(arr, tt, xt.shape)
        eps = (gather(ref.sqrt_recip_alphas_cumprod) * xt - xs) \
            / gather(ref.sqrt_recipm1_alphas_cumprod)
        ab_prev = gather(ref.alphas_cumprod_prev)
        want = (xs * torch.sqrt(ab_prev)
                + torch.sqrt(1.0 - ab_prev) * eps).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_undo_matches_reference(self):
        betas = get_named_beta_schedule("linear", 1000)
        sched = make_schedule(betas)
        ref = _ref_diffusion(betas)
        rng = np.random.RandomState(2)
        x = rng.randn(2, 3, 4).astype(np.float32)
        noise = rng.randn(2, 3, 4).astype(np.float32)
        t = np.asarray([50, 400])
        import jax.numpy as jnp
        got = np.asarray(sched.undo(jnp.asarray(x), jnp.asarray(t),
                                    jnp.asarray(noise)))
        tt = torch.from_numpy(t)
        xt = torch.from_numpy(x)
        beta = ref_gd._extract_into_tensor(ref.betas, tt, xt.shape)
        want = (torch.sqrt(1.0 - beta) * xt
                + torch.sqrt(beta) * torch.from_numpy(noise)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestFullModelParity:
    """Converted reference UniDiffuser must reproduce the torch forward."""

    def _ref_model_opt(self, P, E):
        from types import SimpleNamespace
        return SimpleNamespace(
            cond_projection="mlp_includeX", cond_residual=True,
            classifier_free=False, null_cond_prob=0.2, cond_scale=1,
            dim_pose=P, expression_dim=E, split_pos=P,
            expression_only=False, gesture_only=False,
            expCondition_gesture_only=None, gesCondition_expression_only=False,
            ExprID_off=False, ExprID_off_uncond=False, no_style=False,
            addTextCond=False, addEmoCond=False,
            addHubert=True, addWav2Vec2=False, expAddHubert=False,
            encode_hubert=True, encode_wav2vec2=False,
            emotion_f=0, word_f=0, higher_dim=0, lower_dim=0,
            model_base="transformer_encoder", separate=None,
            unidiffuser=True, visualize_unify_x0_step=0,
            unify_x0_step_path="",
        )

    def test_forward_matches_reference_torch(self):
        import types
        try:
            import cv2  # noqa: F401
        except ImportError:
            m = types.ModuleType("cv2"); m.norm = None
            sys.modules["cv2"] = m
        from models import transformer as ref_tr

        import dataclasses
        import jax
        import jax.numpy as jnp
        from diffsheg_tpu.compat.torch_ckpt import (
            convert_unidiffuser_state_dict)
        from diffsheg_tpu.config import ModelConfig
        from diffsheg_tpu.models.unidiffuser import UniDiffuser

        P, E, L, H, FF, S, T, B = 21, 11, 64, 4, 128, 6, 16, 2
        opt = self._ref_model_opt(P, E)
        torch.manual_seed(0)
        ref = ref_tr.UniDiffuser(
            opt, input_feats=P + E, audio_dim=128, style_dim=S,
            num_frames=T, latent_dim=L, ff_size=FF, num_layers=2,
            num_heads=H, dropout=0, pe_type="pe_sinu").eval()

        cfg = ModelConfig(
            pose_dim=P, expression_dim=E, latent_dim=L, num_layers=2,
            num_heads=H, ff_size=FF, audio_dim=128, aud_latent_dim=256,
            style_dim=S, pe_type="pe_sinu", add_hubert=True,
            encode_hubert=True, hubert_dim=1024, hubert_latent_dim=128)
        variables = convert_unidiffuser_state_dict(ref.state_dict(), cfg)
        ours = UniDiffuser(cfg)

        rng = np.random.RandomState(0)
        x = rng.randn(B, T, P + E).astype(np.float32)
        mel = rng.randn(B, T, 128).astype(np.float32)
        hubert = (rng.randn(B, T, 1024) * 0.3).astype(np.float32)
        pid = np.eye(S, dtype=np.float32)[[1, 3]]
        t = np.asarray([7, 450])
        sr = np.asarray([1.1, 2.3], dtype=np.float32).reshape(B, 1, 1)
        srm1 = np.asarray([0.4, 2.1], dtype=np.float32).reshape(B, 1, 1)

        with torch.no_grad():
            want = ref(
                torch.from_numpy(x), torch.from_numpy(t),
                (torch.from_numpy(sr), torch.from_numpy(srm1)),
                torch.from_numpy(mel),
                torch.LongTensor([T] * B),
                torch.from_numpy(pid),
                add_cond={"pretrain_aud_feat": torch.from_numpy(hubert)},
                pe_type="pe_sinu",
            ).numpy()

        got = np.asarray(ours.apply(
            variables, jnp.asarray(x), jnp.asarray(t),
            (jnp.asarray(sr), jnp.asarray(srm1)), jnp.asarray(mel),
            jnp.asarray(pid), hubert=jnp.asarray(hubert), train=False))

        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


class TestFullModelParityVariants(TestFullModelParity):
    def _build_pair(self, pe_type="pe_sinu", classifier_free=False,
                    cond_scale=1.0):
        import types
        try:
            import cv2  # noqa: F401
        except ImportError:
            m = types.ModuleType("cv2"); m.norm = None
            sys.modules["cv2"] = m
        from models import transformer as ref_tr
        from diffsheg_tpu.compat.torch_ckpt import (
            convert_unidiffuser_state_dict)
        from diffsheg_tpu.config import ModelConfig
        from diffsheg_tpu.models.unidiffuser import UniDiffuser

        P, E, L, H, FF, S, T = 21, 11, 64, 4, 128, 6, 16
        opt = self._ref_model_opt(P, E)
        opt.classifier_free = classifier_free
        opt.cond_scale = cond_scale
        torch.manual_seed(0)
        ref = ref_tr.UniDiffuser(
            opt, input_feats=P + E, audio_dim=128, style_dim=S,
            num_frames=T, latent_dim=L, ff_size=FF, num_layers=2,
            num_heads=H, dropout=0, pe_type=pe_type).eval()
        cfg = ModelConfig(
            pose_dim=P, expression_dim=E, latent_dim=L, num_layers=2,
            num_heads=H, ff_size=FF, audio_dim=128, aud_latent_dim=256,
            style_dim=S, pe_type=pe_type, add_hubert=True,
            encode_hubert=True, hubert_dim=1024, hubert_latent_dim=128,
            classifier_free=classifier_free, cond_scale=cond_scale)
        variables = convert_unidiffuser_state_dict(ref.state_dict(), cfg)
        return ref, UniDiffuser(cfg), variables, (P, E, S, T)

    def _compare(self, ref, ours, variables, dims, pe_type,
                 cfg_inference=False):
        import jax.numpy as jnp
        P, E, S, T = dims
        B = 2
        rng = np.random.RandomState(1)
        x = rng.randn(B, T, P + E).astype(np.float32)
        mel = rng.randn(B, T, 128).astype(np.float32)
        hubert = (rng.randn(B, T, 1024) * 0.3).astype(np.float32)
        pid = np.eye(S, dtype=np.float32)[[0, 2]]
        t = np.asarray([3, 800])
        sr = np.ones((B, 1, 1), np.float32) * 1.2
        srm1 = np.ones((B, 1, 1), np.float32) * 0.7
        with torch.no_grad():
            want = ref(
                torch.from_numpy(x), torch.from_numpy(t),
                (torch.from_numpy(sr), torch.from_numpy(srm1)),
                torch.from_numpy(mel), torch.LongTensor([T] * B),
                torch.from_numpy(pid),
                add_cond={"pretrain_aud_feat": torch.from_numpy(hubert)},
                pe_type=pe_type,
            ).numpy()
        got = np.asarray(ours.apply(
            variables, jnp.asarray(x), jnp.asarray(t),
            (jnp.asarray(sr), jnp.asarray(srm1)), jnp.asarray(mel),
            jnp.asarray(pid), hubert=jnp.asarray(hubert), train=False,
            cfg_inference=cfg_inference))
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)

    @pytest.mark.parametrize("pe", ["pe_sinu", "ppe_sinu", "pe_sinu_repeat"])
    def test_pe_variants(self, pe):
        ref, ours, variables, dims = self._build_pair(pe_type=pe)
        self._compare(ref, ours, variables, dims, pe)

    def test_cfg_guidance_merge(self):
        """classifier_free + cond_scale != 1: the reference batch-doubles
        inside the branches at eval; ours must reproduce the merged output."""
        ref, ours, variables, dims = self._build_pair(
            classifier_free=True, cond_scale=1.15)
        self._compare(ref, ours, variables, dims, "pe_sinu",
                      cfg_inference=True)


class TestSamplingLoopParity(TestFullModelParityVariants):
    def _loop_opt(self, P, E):
        opt = self._ref_model_opt(P, E)
        # sampler-time flags (gaussian_diffusion.py reads these)
        opt.unidiffuser = True
        opt.no_repaint = True
        opt.same_overlap_noisy = False
        opt.fix_head_var = False
        opt.dataset_name = "beat"
        opt.overlap_len = 4
        opt.addBlend = True
        opt.no_resample = True
        opt.timestep_respacing = "ddim25"
        opt.jump_length = 1
        opt.jump_n_sample = 1
        return opt

    def test_full_ddim25_loop_matches(self):
        """End-to-end DDIM-25 chain: same x_T, converted weights -> the whole
        25-step reverse process must track the reference loop (eta=0 is
        deterministic; clip_denoised bounds drift)."""
        import jax, jax.numpy as jnp
        from diffsheg_tpu.diffusion.jump import plain_program
        from diffsheg_tpu.diffusion.respace import (make_respaced_schedule,
                                                    space_timesteps)
        from diffsheg_tpu.diffusion.sampler import ddim_sample_program
        from diffsheg_tpu.diffusion.schedule import (_gather,
                                                     get_named_beta_schedule)

        ref_model, ours_model, variables, dims = self._build_pair()
        P, E, S, T = dims
        B = 2
        rng = np.random.RandomState(3)
        x_T = rng.randn(B, T, P + E).astype(np.float32)
        mel = rng.randn(B, T, 128).astype(np.float32)
        hubert = (rng.randn(B, T, 1024) * 0.3).astype(np.float32)
        pid = np.eye(S, dtype=np.float32)[[0, 2]]

        base = get_named_beta_schedule("linear", 1000)
        # reference chain
        ref_diff = ref_respace.SpacedDiffusion(
            use_timesteps=space_timesteps(1000, "ddim25"),
            betas=base,
            model_mean_type=ref_gd.ModelMeanType.EPSILON,
            model_var_type=ref_gd.ModelVarType.FIXED_SMALL,
            loss_type=ref_gd.LossType.MSE,
            opt=self._loop_opt(P, E),
        )
        with torch.no_grad():
            want = ref_diff.ddim_sample_loop(
                ref_model, (B, T, P + E), noise=torch.from_numpy(x_T),
                clip_denoised=True,
                model_kwargs=dict(
                    audio_emb=torch.from_numpy(mel),
                    length=torch.LongTensor([T] * B),
                    person_id=torch.from_numpy(pid),
                    add_cond={"pretrain_aud_feat": torch.from_numpy(hubert)},
                    pe_type="pe_sinu",
                    y={},
                ),
            ).numpy()

        # our chain: same components the WindowGenerator assembles
        sched, tmap = make_respaced_schedule(
            base, space_timesteps(1000, "ddim25"))

        def denoise_fn(x, t):
            sr = _gather(sched.sqrt_recip_alphas_cumprod, t, 3)
            srm1 = _gather(sched.sqrt_recipm1_alphas_cumprod, t, 3)
            return ours_model.apply(
                variables, x, jnp.take(jnp.asarray(tmap), t), (sr, srm1),
                jnp.asarray(mel), jnp.asarray(pid),
                hubert=jnp.asarray(hubert), train=False)

        got, _ = ddim_sample_program(
            sched, denoise_fn, plain_program(25), jnp.asarray(x_T),
            jax.random.PRNGKey(0), mean_type="epsilon", clip_denoised=True)
        got = np.asarray(got)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


class TestRepaintProjection:
    def test_projection_matches_reference_formula(self):
        """RePaint overlap projection with FIXED noise against the reference
        equations (gaussian_diffusion.py:1034-1056): weighed_gt =
        sqrt(ab_prev)*gt + sqrt(1-ab_prev)*noise on the head frames, with the
        linear cross-fade at low noise when addBlend."""
        import jax.numpy as jnp
        from diffsheg_tpu.diffusion.respace import (make_respaced_schedule,
                                                    space_timesteps)
        from diffsheg_tpu.diffusion.sampler import RepaintSpec, repaint_project
        from diffsheg_tpu.diffusion.schedule import get_named_beta_schedule

        base = get_named_beta_schedule("linear", 1000)
        sched, _ = make_respaced_schedule(base,
                                          space_timesteps(1000, "ddim25"))
        B, T, C, ov = 2, 10, 4, 3
        rng = np.random.RandomState(0)
        x = rng.randn(B, T, C).astype(np.float32)
        gt = rng.randn(B, T, C).astype(np.float32)
        noise = rng.randn(B, T, C).astype(np.float32)

        for t_scalar in (2, 20):  # high noise (no blend) and low noise
            t = np.full((B,), t_scalar)
            spec = RepaintSpec(overlap_len=ov, add_blend=True)
            got = np.asarray(repaint_project(
                sched, spec, jnp.asarray(x), jnp.asarray(t), jnp.asarray(gt),
                jnp.asarray(noise)))

            ab_prev = np.asarray(sched.alphas_cumprod_prev)[t_scalar]
            nw = np.sqrt(1.0 - ab_prev)
            weighed = np.sqrt(ab_prev) * gt + nw * noise
            head = weighed[:, :ov].copy()
            if nw < 0.2:  # addBlend active (reference :1051-1054)
                w = np.linspace(0, 1, ov).reshape(1, ov, 1)
                head = head * (1 - w) + x[:, :ov] * w
            want = x.copy()
            want[:, :ov] = head
            np.testing.assert_allclose(got, want, atol=1e-5,
                                       err_msg=f"t={t_scalar} nw={nw:.3f}")
            # frames past the overlap are untouched
            np.testing.assert_array_equal(got[:, ov:], x[:, ov:])
