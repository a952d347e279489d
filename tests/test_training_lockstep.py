"""Training-parity lockstep vs the reference trainer (gated).

Runs N optimization steps of the reference's training process (torch:
GaussianDiffusion.training_losses + the backward_G objective + Adam(2e-4)
with grad-clip 0.5, trainers/ddpm_beat_trainer.py:135-269,343) and of this
framework's jitted train step, from CONVERTED IDENTICAL initial weights on
IDENTICAL batches, timesteps, and diffusion noise.  Asserts the loss curves
track — proving training, not just the forward pass, is the same process.
"""

import pytest

pytestmark = pytest.mark.slow  # long-running: excluded from the core tier (pytest -m "not slow")

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

REF = os.environ.get("DIFFSHEG_REFERENCE", "/root/reference")

if not os.path.isdir(os.path.join(REF, "models")):
    pytest.skip("reference checkout not available", allow_module_level=True)

torch = pytest.importorskip("torch")

sys.path.insert(0, REF)
try:
    import types

    try:
        import cv2  # noqa: F401
    except ImportError:
        _m = types.ModuleType("cv2")
        _m.norm = None
        sys.modules["cv2"] = _m
    from models import gaussian_diffusion as ref_gd  # noqa: E402
    from models import transformer as ref_tr  # noqa: E402

    # load loss_factory by path: the trainers package __init__ pulls lmdb
    import importlib.util

    _spec = importlib.util.spec_from_file_location(
        "ref_loss_factory", os.path.join(REF, "trainers", "loss_factory.py"))
    _lf = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_lf)
    get_loss_func = _lf.get_loss_func
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference import failed: {e}", allow_module_level=True)

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffsheg_tpu.compat.torch_ckpt import convert_unidiffuser_state_dict  # noqa: E402
from diffsheg_tpu.config import ModelConfig, beat_config  # noqa: E402
from diffsheg_tpu.diffusion.schedule import (  # noqa: E402
    get_named_beta_schedule,
    make_schedule,
)
from diffsheg_tpu.train.step import create_train_state, make_train_step  # noqa: E402

P, E, L, H, FF, S, T, B = 21, 11, 64, 4, 128, 6, 16, 8
N_STEPS = 20
N_DIFF = 1000


def _ref_opt():
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
        unidiffuser=True, visualize_unify_x0_step=0, unify_x0_step_path="",
        # sampler-time flags GaussianDiffusion touches
        same_overlap_noisy=False, fix_head_var=False, dataset_name="beat",
        overlap_len=4, addBlend=True,
    )


def _make_batches(rng):
    return dict(
        x=rng.randn(N_STEPS, B, T, P + E).astype(np.float32) * 0.5,
        mel=rng.randn(N_STEPS, B, T, 128).astype(np.float32),
        hubert=(rng.randn(N_STEPS, B, T, 1024) * 0.3).astype(np.float32),
        sem=rng.rand(N_STEPS, B, T).astype(np.float32),
        pid=np.eye(S, dtype=np.float32)[rng.randint(0, S, (N_STEPS, B))],
        t=rng.randint(0, N_DIFF, (N_STEPS, B)).astype(np.int64),
        noise=rng.randn(N_STEPS, B, T, P + E).astype(np.float32),
    )


def _run_reference(data):
    opt = _ref_opt()
    torch.manual_seed(0)
    net = ref_tr.UniDiffuser(
        opt, input_feats=P + E, audio_dim=128, style_dim=S,
        num_frames=T, latent_dim=L, ff_size=FF, num_layers=2,
        num_heads=H, dropout=0, pe_type="pe_sinu").train()
    init_sd = {k: v.clone() for k, v in net.state_dict().items()}

    diffusion = ref_gd.GaussianDiffusion(
        opt=opt,
        betas=get_named_beta_schedule("linear", N_DIFF),
        model_mean_type=ref_gd.ModelMeanType.EPSILON,
        model_var_type=ref_gd.ModelVarType.FIXED_SMALL,
        loss_type=ref_gd.LossType.MSE,
    )
    huber = get_loss_func("huber_loss")
    mse = torch.nn.MSELoss(reduction="none")
    optim = torch.optim.Adam(net.parameters(), lr=2e-4)

    losses = []
    for i in range(N_STEPS):
        x = torch.from_numpy(data["x"][i])
        out = diffusion.training_losses(
            model=net, x_start=x, t=torch.from_numpy(data["t"][i]),
            noise=torch.from_numpy(data["noise"][i]),
            model_kwargs={
                "audio_emb": torch.from_numpy(data["mel"][i]),
                "length": torch.LongTensor([T] * B),
                "person_id": torch.from_numpy(data["pid"][i]),
                "add_cond": {"pretrain_aud_feat":
                             torch.from_numpy(data["hubert"][i])},
                "y": None,
                "pe_type": "pe_sinu",
            })
        # backward_G objective (ddpm_beat_trainer.py:222-260): 1000x masked
        # eps MSE + UNWEIGHTED velocity MSE + 100x sem-weighted huber(x0)
        loss_eps = mse(out["pred"], out["target"]).mean(dim=-1).mean()
        loss_vel = mse(out["pred_vel"], out["target_vel"]).mean(dim=-1).mean()
        sem = torch.from_numpy(data["sem"][i]).unsqueeze(2)
        loss_x0 = huber(out["target_x0"] * (sem + 1), out["pred_x0"] * (sem + 1))
        final = 1000.0 * loss_eps + loss_vel + 100.0 * loss_x0

        optim.zero_grad()
        final.backward()
        torch.nn.utils.clip_grad_norm_(net.parameters(), 0.5)
        optim.step()
        losses.append(float(final.detach()))
    return init_sd, losses


def test_loss_curves_track():
    data = _make_batches(np.random.RandomState(0))
    init_sd, ref_losses = _run_reference(data)

    cfg = beat_config()
    cfg = cfg.replace(model=ModelConfig(
        pose_dim=P, expression_dim=E, latent_dim=L, num_layers=2,
        num_heads=H, ff_size=FF, audio_dim=128, aud_latent_dim=256,
        style_dim=S, pe_type="pe_sinu", add_hubert=True,
        encode_hubert=True, hubert_dim=1024, hubert_latent_dim=128))
    variables = convert_unidiffuser_state_dict(init_sd, cfg.model)
    sched = make_schedule(get_named_beta_schedule("linear", N_DIFF))
    step = make_train_step(cfg, sched, inject_randoms=True)
    state = create_train_state(cfg, variables)

    our_losses = []
    for i in range(N_STEPS):
        batch = {
            "motion": jnp.asarray(data["x"][i]),
            "mel": jnp.asarray(data["mel"][i]),
            "pid": jnp.asarray(data["pid"][i]),
            "hubert": jnp.asarray(data["hubert"][i]),
            "sem": jnp.asarray(data["sem"][i]),
        }
        state, terms = step(state, batch,
                            jnp.asarray(data["t"][i], dtype=jnp.int32),
                            jnp.asarray(data["noise"][i]))
        our_losses.append(float(terms.total))

    ref_losses = np.asarray(ref_losses)
    our_losses = np.asarray(our_losses)
    # float32 + 20 Adam steps: curves must track closely step by step
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)
    # and the training must actually be progressing identically: the DROP
    # from step 0 to the minimum must match, not just the absolute scale
    ref_drop = ref_losses[0] - ref_losses.min()
    our_drop = our_losses[0] - our_losses.min()
    assert our_drop == pytest.approx(ref_drop, rel=5e-2)
