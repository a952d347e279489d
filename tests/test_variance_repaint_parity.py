"""Parity for the round-3 diffusion-core completions (gated on the reference):

- learned variance (LEARNED / LEARNED_RANGE) splitting + log-variance
  (reference models/gaussian_diffusion.py:549-579)
- hybrid VLB training term (_vb_terms_bpd, :1308-1349,1363-1374)
- ancestral RePaint projection + harmonize jump loop
  (p_sample :729-745, p_sample_loop_progressive_harmonize :849-920)
- get_schedule_jump_paper (models/scheduler.py:150-176)

Layout note: the reference splits learned-variance outputs on dim=1 (the
guided-diffusion image convention); our motion tensors are channel-last.
Tests transpose between (B, C, T) torch and (B, T, C) jnp layouts — every
involved op is elementwise or batch-broadcast, so transposition commutes.
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
    from models import scheduler as ref_scheduler  # noqa: E402
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference import failed: {e}", allow_module_level=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffsheg_tpu.diffusion.jump import (  # noqa: E402
    jump_schedule_paper,
    make_step_program,
)
from diffsheg_tpu.diffusion.sampler import (  # noqa: E402
    RepaintSpec,
    ancestral_sample_program,
    model_log_variance,
    split_model_output,
)
from diffsheg_tpu.diffusion.schedule import (  # noqa: E402
    get_named_beta_schedule,
    make_schedule,
)
from diffsheg_tpu.diffusion.vlb import vb_term_from_output  # noqa: E402


def _ref_opt():
    from types import SimpleNamespace
    return SimpleNamespace(same_overlap_noisy=False, fix_head_var=False,
                           dataset_name="beat", unidiffuser=False,
                           overlap_len=4, addBlend=True)


def _ref_diffusion(betas, var_type):
    vt = {
        "fixed_small": ref_gd.ModelVarType.FIXED_SMALL,
        "fixed_large": ref_gd.ModelVarType.FIXED_LARGE,
        "learned": ref_gd.ModelVarType.LEARNED,
        "learned_range": ref_gd.ModelVarType.LEARNED_RANGE,
    }[var_type]
    return ref_gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=ref_gd.ModelMeanType.EPSILON,
        model_var_type=vt,
        loss_type=ref_gd.LossType.MSE,
        opt=_ref_opt(),
    )


BETAS = get_named_beta_schedule("linear", 1000)


def test_paper_jump_schedule_matches():
    ours = jump_schedule_paper()
    ref = ref_scheduler.get_schedule_jump_paper()
    assert list(ours) == list(ref)


class TestLearnedVariance:
    """p_mean_variance parity for every ModelVarType.

    Reference layout (B, C, T) with the model output split on dim=1; ours is
    (B, T, C) split on the last axis.
    """

    @pytest.mark.parametrize(
        "var_type", ["fixed_small", "fixed_large", "learned", "learned_range"])
    def test_p_mean_variance_matches(self, var_type):
        sched = make_schedule(BETAS)
        ref = _ref_diffusion(BETAS, var_type)
        rng = np.random.RandomState(3)
        B, C, T = 2, 6, 5
        x_ref = rng.randn(B, C, T).astype(np.float32)
        eps_ref = (0.3 * rng.randn(B, C, T)).astype(np.float32)
        var_ref = np.tanh(rng.randn(B, C, T)).astype(np.float32)
        t = np.asarray([17, 800])

        learned = var_type in ("learned", "learned_range")
        if learned:
            out_ref = np.concatenate([eps_ref, var_ref], axis=1)
        else:
            out_ref = eps_ref
        want = ref.p_mean_variance(
            lambda x, tt, **kw: torch.from_numpy(out_ref),
            torch.from_numpy(x_ref), torch.from_numpy(t),
            clip_denoised=False, model_kwargs={"y": {}},
        )

        # ours, channel-last
        x = jnp.asarray(x_ref.transpose(0, 2, 1))
        tj = jnp.asarray(t)
        out = jnp.asarray(out_ref.transpose(0, 2, 1))
        mean_part, var_raw = split_model_output(out, var_type)
        if learned:
            np.testing.assert_allclose(
                np.asarray(mean_part),
                eps_ref.transpose(0, 2, 1), atol=0)
        x0 = sched.predict_xstart_from_eps(x, tj, mean_part)
        mean = sched.q_posterior_mean(x0, x, tj)
        logvar = model_log_variance(sched, var_type, var_raw, tj, x.ndim)
        logvar = jnp.broadcast_to(logvar, x.shape)

        np.testing.assert_allclose(
            np.asarray(mean).transpose(0, 2, 1),
            want["mean"].numpy(), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(logvar).transpose(0, 2, 1),
            want["log_variance"].numpy(), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(x0).transpose(0, 2, 1),
            want["pred_xstart"].numpy(), atol=2e-5)

    @pytest.mark.parametrize("var_type", ["learned", "learned_range"])
    @pytest.mark.parametrize("freeze", [False, True])
    def test_vb_term_matches_reference(self, var_type, freeze):
        """_vb_terms_bpd with a frozen 2C output (the hybrid-loss shape,
        gaussian_diffusion.py:1363-1374)."""
        sched = make_schedule(BETAS)
        ref = _ref_diffusion(BETAS, var_type)
        rng = np.random.RandomState(4)
        B, C, T = 3, 4, 6
        x0_ref = np.clip(rng.randn(B, C, T), -1, 1).astype(np.float32)
        xt_ref = rng.randn(B, C, T).astype(np.float32)
        eps_ref = (0.3 * rng.randn(B, C, T)).astype(np.float32)
        var_ref = np.tanh(rng.randn(B, C, T)).astype(np.float32)
        t = np.asarray([0, 13, 700])  # includes the t=0 decoder-NLL branch
        out_ref = np.concatenate([eps_ref, var_ref], axis=1)

        want = ref._vb_terms_bpd(
            model=lambda *a, **kw: torch.from_numpy(out_ref),
            x_start=torch.from_numpy(x0_ref),
            x_t=torch.from_numpy(xt_ref),
            t=torch.from_numpy(t),
            clip_denoised=False,
        )["output"].numpy()

        got = vb_term_from_output(
            sched,
            jnp.asarray(x0_ref.transpose(0, 2, 1)),
            jnp.asarray(xt_ref.transpose(0, 2, 1)),
            jnp.asarray(t),
            jnp.asarray(out_ref.transpose(0, 2, 1)),
            mean_type="epsilon", var_type=var_type, freeze_mean=freeze,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=1e-5)


def _patch_zero_noise(monkeypatch):
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))
    monkeypatch.setattr(
        torch, "randn",
        lambda *shape, **kw: torch.zeros(
            *shape, **{k: v for k, v in kw.items() if k != "generator"}))
    real_normal = jax.random.normal
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    return real_normal


class TestAncestralLoops:
    """Full reverse loops with zero transition noise, lockstep with the
    reference's p_sample_loop / _harmonize generators."""

    def _model_pair(self):
        # deterministic eps model: identical math in torch and jnp
        def ref_model(x, t, **kw):
            return 0.1 * x + 0.01 * t.float().view(-1, 1, 1)

        def our_model(x, t):
            return 0.1 * x + 0.01 * t.astype(jnp.float32).reshape(-1, 1, 1)

        return ref_model, our_model

    @pytest.mark.parametrize("var_type", ["fixed_small", "learned_range"])
    def test_plain_ancestral_loop_matches(self, monkeypatch, var_type):
        _patch_zero_noise(monkeypatch)
        betas = get_named_beta_schedule("linear", 50)
        sched = make_schedule(betas)
        ref = _ref_diffusion(betas, var_type)
        ref_model, our_model = self._model_pair()
        learned = var_type == "learned_range"
        if learned:
            # eps half + constant raw-variance half, split on dim=1 for the
            # reference and on the last axis for ours
            def ref_model2(x, t, **kw):
                eps = ref_model(x, t)
                return torch.cat([eps, 0.5 * torch.ones_like(eps)], dim=1)

            def our_model2(x, t):
                eps = our_model(x, t)
                return jnp.concatenate(
                    [eps, 0.5 * jnp.ones_like(eps)], axis=-1)
        else:
            ref_model2, our_model2 = ref_model, our_model

        B, C, T = 2, 3, 4
        noise = np.random.RandomState(5).randn(B, C, T).astype(np.float32)
        want = ref.p_sample_loop(
            ref_model2, (B, C, T), noise=torch.from_numpy(noise),
            clip_denoised=False, model_kwargs={"y": {}}, device="cpu",
        ).numpy()
        got = ancestral_sample_program(
            sched, our_model2, jnp.asarray(noise.transpose(0, 2, 1)),
            jax.random.PRNGKey(0), var_type=var_type, clip_denoised=False,
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1), want, atol=2e-4)

    def test_harmonize_repaint_loop_matches(self, monkeypatch):
        """The ancestral outpainting path: paper jump schedule + inpaint
        projection (gaussian_diffusion.py:729-745,849-920)."""
        _patch_zero_noise(monkeypatch)
        betas = get_named_beta_schedule("linear", 300)  # t_T=250 fits
        sched = make_schedule(betas)
        ref = _ref_diffusion(betas, "fixed_small")
        ref_model, our_model = self._model_pair()

        B, T, C = 2, 8, 3
        ov = 3
        rng = np.random.RandomState(6)
        noise = rng.randn(B, T, C).astype(np.float32)
        gt = rng.randn(B, T, C).astype(np.float32)
        mask = np.zeros((B, T, C), dtype=bool)
        mask[:, :ov] = True

        want = ref.p_sample_loop(
            ref_model, (B, T, C), noise=torch.from_numpy(noise),
            clip_denoised=False,
            model_kwargs={"y": {
                "outpainting_mask": torch.from_numpy(mask),
                "gt": torch.from_numpy(gt),
            }},
            device="cpu",
        ).numpy()

        program = make_step_program(jump_schedule_paper())
        got = ancestral_sample_program(
            sched, our_model, jnp.asarray(noise), jax.random.PRNGKey(0),
            clip_denoised=False, program=program,
            repaint=RepaintSpec(overlap_len=ov), gt=jnp.asarray(gt),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
