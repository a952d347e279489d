"""diffusion.sampler='ancestral': the serving generator can run the
reference's p_sample family (gaussian_diffusion.py:684-920) end-to-end —
plain windows, RePaint continuation windows, and the full stream —
instead of the shipped DDIM path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsheg_tpu.config import beat_config


def _cfg(sampler, **stream_kw):
    cfg = beat_config()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
            add_hubert=False),
        diffusion=dataclasses.replace(cfg.diffusion, sampler=sampler),
    )
    if stream_kw:
        cfg = cfg.replace(stream=dataclasses.replace(cfg.stream, **stream_kw))
    return cfg


def _gen(cfg):
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser
    from diffsheg_tpu.sampling.generator import WindowGenerator

    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(4))
    return WindowGenerator(cfg, variables), variables


def test_ancestral_windows_and_continuation():
    cfg = _cfg("ancestral")
    gen, variables = _gen(cfg)
    B, T = 2, cfg.data.n_poses
    rs = np.random.RandomState(2)
    mel = jnp.asarray(rs.randn(B, T, cfg.model.audio_dim), jnp.float32)
    pid = jax.nn.one_hot(jnp.arange(B) % cfg.model.style_dim,
                         cfg.model.style_dim)
    key = jax.random.PRNGKey(3)

    a = gen.generate(mel, pid, key)
    assert a.shape == (B, T, cfg.model.motion_dim)
    assert np.isfinite(np.asarray(a)).all()
    # deterministic per key
    a2 = gen.generate(mel, pid, key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))

    # RePaint continuation window (projection before the model call)
    gt = jnp.asarray(rs.randn(B, T, cfg.model.motion_dim), jnp.float32)
    out = gen.generate(mel, pid, key, gt_head=gt[:, :cfg.stream.overlap_len])
    if isinstance(out, tuple):
        out = out[0]
    assert np.isfinite(np.asarray(out)).all()


def test_ancestral_full_stream():
    from diffsheg_tpu.sampling.streamer import StreamingGenerator

    cfg = _cfg("ancestral")
    gen, _ = _gen(cfg)
    sg = StreamingGenerator(gen)
    T = cfg.data.n_poses * 2  # two windows
    rs = np.random.RandomState(7)
    mel = jnp.asarray(rs.randn(1, T, cfg.model.audio_dim), jnp.float32)
    pid = jax.nn.one_hot(jnp.array([1]), cfg.model.style_dim)
    out = sg.generate(mel, pid, jax.random.PRNGKey(9))
    assert out.shape == (1, T, cfg.model.motion_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_unknown_sampler_rejected():
    cfg = _cfg("ddpm")  # plausible typo for 'ancestral'
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser
    from diffsheg_tpu.sampling.generator import WindowGenerator

    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="valid samplers"):
        WindowGenerator(cfg, variables)


def test_ancestral_rejects_same_overlap_noisy():
    cfg = _cfg("ancestral", same_overlap_noisy=True)
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser
    from diffsheg_tpu.sampling.generator import WindowGenerator

    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="same_overlap_noisy"):
        WindowGenerator(cfg, variables)
