"""Model-level tests for the transformer_decoder base and the
learned-variance output head (round-3 flag-surface completion).

Cross-attention numerics are parity-tested against the reference torch
module (models/transformer.py:133-166) with converted weights; the
decoder-mode and learned-variance models are exercised through init/forward/
train-step to pin shapes, parameter trees, and gradient flow.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsheg_tpu.config import (
    Config,
    DiffusionConfig,
    ModelConfig,
    TrainConfig,
    beat_config,
)
from diffsheg_tpu.models.attention import LinearTemporalCrossAttention
from diffsheg_tpu.models.unidiffuser import init_unidiffuser

REF = os.environ.get("DIFFSHEG_REFERENCE", "/root/reference")
HAS_REF = os.path.isdir(os.path.join(REF, "models"))


def _small_cfg(**kw):
    return ModelConfig(
        pose_dim=9, expression_dim=5, latent_dim=32, num_layers=2,
        num_heads=4, ff_size=64, audio_dim=16, aud_latent_dim=24,
        style_dim=4, add_hubert=False, encode_hubert=False, **kw)


@pytest.mark.skipif(not HAS_REF, reason="reference checkout not available")
def test_cross_attention_matches_reference_torch():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    import types
    try:
        import cv2  # noqa: F401
    except ImportError:
        m = types.ModuleType("cv2"); m.norm = None
        sys.modules["cv2"] = m
    from models import transformer as ref_tr

    from diffsheg_tpu.compat.torch_ckpt import (
        _layernorm, _linear, _stylization)

    L, AL, H, E, B, T, N = 64, 48, 4, 256, 2, 10, 12
    torch.manual_seed(1)
    ref = ref_tr.LinearTemporalCrossAttention(
        seq_len=T, latent_dim=L, aud_latent_dim=AL, num_head=H,
        dropout=0.0, time_embed_dim=E).eval()
    sd = ref.state_dict()
    params = {
        "norm": _layernorm(sd, "norm"),
        "text_norm": _layernorm(sd, "text_norm"),
        "query": _linear(sd, "query"),
        "key": _linear(sd, "key"),
        "value": _linear(sd, "value"),
        "proj_out": _stylization(sd, "proj_out"),
    }

    rng = np.random.RandomState(0)
    x = rng.randn(B, T, L).astype(np.float32)
    xf = rng.randn(B, N, AL).astype(np.float32)
    emb = rng.randn(B, E).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(xf),
                   torch.from_numpy(emb)).numpy()

    mod = LinearTemporalCrossAttention(latent_dim=L, num_heads=H)
    got = mod.apply({"params": jax.tree.map(jnp.asarray, params)},
                    jnp.asarray(x), jnp.asarray(xf), jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_decoder_mode_forward_and_params():
    cfg = _small_cfg(model_base="transformer_decoder")
    model, variables = init_unidiffuser(cfg, n_poses=8, rng=jax.random.PRNGKey(0))
    layer = variables["params"]["encoder_exp"]["layer_0"]
    assert "ca_block" in layer, "decoder layers must carry cross-attention"
    assert "feat_proj" not in layer, "decoder layers have no concat projection"

    B, T = 2, 8
    x = jnp.asarray(np.random.RandomState(1).randn(B, T, cfg.motion_dim),
                    dtype=jnp.float32)
    out = model.apply(
        variables, x, jnp.asarray([3, 40]),
        (jnp.ones((B, 1, 1)), jnp.ones((B, 1, 1))),
        jnp.zeros((B, T, cfg.audio_dim)), jnp.zeros((B, cfg.style_dim)),
        train=False)
    assert out.shape == (B, T, cfg.motion_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_learned_variance_output_layout():
    cfg = _small_cfg(learned_variance=True)
    model, variables = init_unidiffuser(cfg, n_poses=6, rng=jax.random.PRNGKey(0))
    B, T, C = 2, 6, cfg.motion_dim
    x = jnp.asarray(np.random.RandomState(2).randn(B, T, C),
                    dtype=jnp.float32)
    out = model.apply(
        variables, x, jnp.asarray([3, 40]),
        (jnp.ones((B, 1, 1)), jnp.ones((B, 1, 1))),
        jnp.zeros((B, T, cfg.audio_dim)), jnp.zeros((B, cfg.style_dim)),
        train=False)
    assert out.shape == (B, T, 2 * C)
    # each branch's out head emits 2x its channels
    assert variables["params"]["encoder_ges"]["out"]["kernel"].shape[-1] \
        == 2 * cfg.pose_dim
    assert variables["params"]["encoder_exp"]["out"]["kernel"].shape[-1] \
        == 2 * cfg.expression_dim


@pytest.mark.slow  # >60s-class on one CPU core; core tier covers the same path via smaller tests
def test_learned_variance_train_step_hybrid_vlb():
    """make_train_step with a learned-variance model: total finite, vb term
    non-zero, and the vb gradient reaches only the variance half of the out
    head (hybrid freeze, gaussian_diffusion.py:1366-1369)."""
    from diffsheg_tpu.train.step import create_train_state, make_train_step

    mcfg = _small_cfg(learned_variance=True)
    cfg = Config(
        model=mcfg,
        diffusion=DiffusionConfig(num_steps=50, respacing="",
                                  var_type="learned_range"),
        train=TrainConfig(batch_size=4, use_sem_weighting=False,
                          loss_type="rescaled_mse"),
    )
    from diffsheg_tpu.diffusion.schedule import (
        get_named_beta_schedule, make_schedule)
    sched = make_schedule(get_named_beta_schedule("linear", 50))
    from diffsheg_tpu.models.factory import init_denoiser
    _, variables = init_denoiser(cfg.model, n_poses=6,
                                 rng=jax.random.PRNGKey(0), batch=4)
    state = create_train_state(cfg, variables)
    step = make_train_step(cfg, sched)

    rng = np.random.RandomState(3)
    batch = {
        "motion": jnp.asarray(rng.randn(4, 6, mcfg.motion_dim),
                              dtype=jnp.float32),
        "mel": jnp.asarray(rng.randn(4, 6, mcfg.audio_dim),
                           dtype=jnp.float32),
        "pid": jnp.eye(4, dtype=jnp.float32),
    }
    # the step donates its input state — snapshot to host first
    before = jax.tree.map(np.asarray, state.params)
    new_state, terms = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(terms.total))
    assert float(terms.vb) != 0.0
    assert np.isfinite(float(terms.vb))
    # parameters actually moved
    moved = jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(np.abs(a - np.asarray(b)).sum()),
                     before, new_state.params))
    assert moved > 0.0


def test_kl_loss_type_trains_on_vlb_alone():
    from diffsheg_tpu.diffusion.losses import diffusion_loss

    from diffsheg_tpu.diffusion.schedule import (
        get_named_beta_schedule, make_schedule)
    cfg = TrainConfig(loss_type="rescaled_kl", use_sem_weighting=False)
    sched = make_schedule(get_named_beta_schedule("linear", 50))
    rng = np.random.RandomState(4)
    B, T, C = 3, 5, 4
    x0 = jnp.asarray(rng.randn(B, T, C), dtype=jnp.float32)
    noise = jnp.asarray(rng.randn(B, T, C), dtype=jnp.float32)
    t = jnp.asarray([0, 10, 40])
    x_t = sched.q_sample(x0, t, noise)
    out = jnp.asarray(0.3 * rng.randn(B, T, C), dtype=jnp.float32)
    terms = diffusion_loss(sched, out, x0, x_t, t, noise, cfg)
    assert float(terms.total) == pytest.approx(float(terms.vb))
    assert float(terms.eps_mse) == 0.0
    np.testing.assert_allclose(float(terms.total), float(terms.vb))


def test_decoder_mode_beat_preset_resolves():
    cfg = beat_config().replace(
        model=dataclasses_replace_model(beat_config().model,
                                        model_base="transformer_decoder"))
    assert cfg.model.model_base == "transformer_decoder"


def dataclasses_replace_model(model, **kw):
    import dataclasses
    return dataclasses.replace(model, **kw)

def test_fast_paths_excluded_for_new_model_variants():
    """The level cache / fused forward cover only the shipped encoder
    model; the decoder base (no feat_proj) and learned-variance head (2C
    output + changed x0 bridge) must fall back to the general forward."""
    from diffsheg_tpu.models.fast_forward import supports_fast_forward
    from diffsheg_tpu.models.level_cache import supports_level_cache

    assert supports_level_cache(_small_cfg())
    assert not supports_level_cache(_small_cfg(learned_variance=True))
    assert not supports_level_cache(
        _small_cfg(model_base="transformer_decoder"))
    assert not supports_fast_forward(_small_cfg(learned_variance=True))
    assert not supports_fast_forward(
        _small_cfg(model_base="transformer_decoder"))


def _tiny_serving_cfg(model_kw, diff_kw=None):
    import dataclasses

    cfg = beat_config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
        add_hubert=False, **model_kw))
    if diff_kw:
        cfg = cfg.replace(diffusion=dataclasses.replace(
            cfg.diffusion, **diff_kw))
    return cfg


@pytest.mark.parametrize("model_kw,diff_kw", [
    ({"learned_variance": True}, {"var_type": "learned_range"}),
    ({"model_base": "transformer_decoder"}, None),
])
def test_new_variants_sample_through_default_generator(model_kw, diff_kw):
    """Regression: with the DEFAULT serving config (level_cache on,
    fused_layer auto) a learned-variance or decoder-base model must
    generate — previously the fast path was entered and crashed at trace
    time (shape mismatch in the x0 bridge / KeyError feat_proj)."""
    from diffsheg_tpu.sampling.generator import WindowGenerator

    cfg = _tiny_serving_cfg(model_kw, diff_kw)
    assert cfg.diffusion.level_cache  # the default that used to crash
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))
    gen = WindowGenerator(cfg, variables)
    B, T = 1, cfg.data.n_poses
    rs = np.random.RandomState(5)
    mel = jnp.asarray(rs.randn(B, T, cfg.model.audio_dim), jnp.float32)
    pid = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), cfg.model.style_dim)
    out = gen.generate(mel, pid, jax.random.PRNGKey(2))
    if isinstance(out, tuple):
        out = out[0]
    assert out.shape == (B, T, cfg.model.motion_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_kl_loss_with_fixed_variance_production_signature():
    """Regression: train/step.py passes var_type=cfg.diffusion.var_type
    ('fixed_small' by default); kl losses must evaluate the bound with that
    fixed variance instead of raising ValueError."""
    from diffsheg_tpu.diffusion.losses import diffusion_loss
    from diffsheg_tpu.diffusion.schedule import (
        get_named_beta_schedule, make_schedule)
    from diffsheg_tpu.diffusion.vlb import vlb_term

    cfg = TrainConfig(loss_type="kl", use_sem_weighting=False)
    sched = make_schedule(get_named_beta_schedule("linear", 50))
    rng = np.random.RandomState(6)
    B, T, C = 3, 5, 4
    x0 = jnp.asarray(rng.randn(B, T, C), dtype=jnp.float32)
    noise = jnp.asarray(rng.randn(B, T, C), dtype=jnp.float32)
    t = jnp.asarray([0, 10, 40])
    x_t = sched.q_sample(x0, t, noise)
    out = jnp.asarray(0.3 * rng.randn(B, T, C), dtype=jnp.float32)

    terms = diffusion_loss(sched, out, x0, x_t, t, noise, cfg,
                           var_type="fixed_small", mean_type="epsilon")
    assert np.isfinite(float(terms.total))

    # oracle: the bound with the posterior (fixed_small) variance directly
    pred_x0 = sched.predict_xstart_from_eps(x_t, t, out)
    pred_mean = sched.q_posterior_mean(pred_x0, x_t, t)
    logvar = jnp.broadcast_to(
        sched.posterior_log_variance_clipped[t][:, None, None], x_t.shape)
    want = vlb_term(sched, x0, x_t, t, pred_mean, logvar).mean()
    np.testing.assert_allclose(float(terms.vb), float(want), rtol=1e-5)

def test_variance_coupling_validated_early():
    """learned_variance and var_type must be set as a pair; the mismatch
    raises a config error instead of a trace-time shape crash."""
    from diffsheg_tpu.sampling.generator import WindowGenerator

    cfg = _tiny_serving_cfg({"learned_variance": True})  # var_type default
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="learned_variance"):
        WindowGenerator(cfg, variables)

    from diffsheg_tpu.config import resolve
    import dataclasses
    bad = beat_config()
    bad = bad.replace(diffusion=dataclasses.replace(
        bad.diffusion, var_type="learned_range"))
    with pytest.raises(ValueError, match="learned_variance"):
        resolve(bad)

@pytest.mark.slow  # >60s-class on one CPU core; core tier covers the same path via smaller tests
def test_learned_variance_hybrid_overfits():
    """The hybrid objective actually LEARNS: ~80 steps on a fixed batch
    drive both the eps loss and the VLB term down (the variance head
    converges toward the true posterior width), mirroring the reference's
    RESCALED_MSE hybrid (gaussian_diffusion.py:1342-1374)."""
    from diffsheg_tpu.diffusion.schedule import (
        get_named_beta_schedule, make_schedule)
    from diffsheg_tpu.models.factory import init_denoiser
    from diffsheg_tpu.train.step import create_train_state, make_train_step

    mcfg = _small_cfg(learned_variance=True)
    cfg = Config(
        model=mcfg,
        diffusion=DiffusionConfig(num_steps=50, respacing="",
                                  var_type="learned_range"),
        train=TrainConfig(batch_size=8, use_sem_weighting=False,
                          loss_type="rescaled_mse", lr=4e-4),
    )
    sched = make_schedule(get_named_beta_schedule("linear", 50))
    _, variables = init_denoiser(cfg.model, n_poses=6,
                                 rng=jax.random.PRNGKey(0), batch=8)
    state = create_train_state(cfg, variables)
    step = make_train_step(cfg, sched)

    rng = np.random.RandomState(5)
    t = np.arange(6)[None, :, None]
    motion = np.sin(0.3 * (t + 1) + 0.2 * np.arange(mcfg.motion_dim))
    batch = {
        "motion": jnp.asarray(np.repeat(motion, 8, 0), jnp.float32),
        "mel": jnp.asarray(rng.randn(8, 6, mcfg.audio_dim), jnp.float32),
        "pid": jnp.asarray(np.eye(8, mcfg.style_dim)[:, :mcfg.style_dim],
                           jnp.float32),
    }
    totals, vbs = [], []
    key = jax.random.PRNGKey(2)
    for k in range(80):
        key, sub = jax.random.split(key)
        state, terms = step(state, batch, sub)
        totals.append(float(terms.total))
        vbs.append(float(terms.vb))
    assert np.isfinite(totals).all() and np.isfinite(vbs).all()
    # strong decrease in the smoothed tail vs head (per-step noise is large)
    assert np.mean(totals[-10:]) < 0.5 * np.mean(totals[:10]), (
        np.mean(totals[:10]), np.mean(totals[-10:]))
    assert np.mean(vbs[-10:]) < np.mean(vbs[:10]), (
        np.mean(vbs[:10]), np.mean(vbs[-10:]))

def test_learned_variance_full_stream():
    """A learned-variance model through StreamingGenerator (plain window +
    RePaint continuation): the 2C output must be split at every step of
    both compiled programs."""
    from diffsheg_tpu.sampling.generator import WindowGenerator
    from diffsheg_tpu.sampling.streamer import StreamingGenerator

    cfg = _tiny_serving_cfg({"learned_variance": True},
                            {"var_type": "learned_range"})
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(1))
    sg = StreamingGenerator(WindowGenerator(cfg, variables))
    T = cfg.data.n_poses * 2
    rs = np.random.RandomState(8)
    mel = jnp.asarray(rs.randn(1, T, cfg.model.audio_dim), jnp.float32)
    pid = jax.nn.one_hot(jnp.array([0]), cfg.model.style_dim)
    out = sg.generate(mel, pid, jax.random.PRNGKey(5))
    assert out.shape == (1, T, cfg.model.motion_dim)
    assert np.isfinite(np.asarray(out)).all()
