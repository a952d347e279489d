"""Timestep-level cache parity: cached forward/sampling == uncached.

The cache (diffsheg_tpu/models/level_cache.py) hoists x-independent
conditioning out of the sampler scan.  It is built by applying the SAME Flax
submodules on their variable subtrees, so outputs must match the uncached
path to float tolerance.  These tests pin that invariant for the direct
forward, plain and RePaint window sampling, CFG batch-doubling, and the
ExprID_off variant.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsheg_tpu.config import beat_config, show_config
from diffsheg_tpu.diffusion.schedule import _gather
from diffsheg_tpu.models.level_cache import (
    build_level_cache,
    gather_level,
    supports_level_cache,
)
from diffsheg_tpu.models.unidiffuser import init_unidiffuser
from diffsheg_tpu.sampling.generator import WindowGenerator


def tiny(cfg, **model_overrides):
    model = dataclasses.replace(
        cfg.model, latent_dim=64, num_layers=2, num_heads=4, ff_size=128,
        hubert_dim=48, hubert_latent_dim=32, **model_overrides)
    return cfg.replace(model=model)


def make_inputs(cfg, key, B=2):
    T = cfg.data.n_poses
    ks = jax.random.split(key, 4)
    mel = jax.random.normal(ks[0], (B, T, cfg.model.audio_dim))
    pid = jax.nn.one_hot(jnp.arange(B) % cfg.model.style_dim,
                         cfg.model.style_dim)
    hub = jax.random.normal(ks[1], (B, T, cfg.model.hubert_dim))
    x = jax.random.normal(ks[2], (B, T, cfg.model.motion_dim))
    return mel, pid, hub, x


class TestForwardParity:
    def test_direct_forward_matches(self):
        cfg = tiny(beat_config())
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(0), batch=2)
        gen = WindowGenerator(cfg, variables)
        mel, pid, hub, x = make_inputs(cfg, jax.random.PRNGKey(1))
        tmap = gen.timestep_map
        cache = build_level_cache(cfg.model, gen.variables, tmap, mel, pid,
                                  hub)
        for lvl in (0, 7, 24):
            t = jnp.full((2,), lvl, dtype=jnp.int32)
            sr = _gather(gen.schedule.sqrt_recip_alphas_cumprod, t, 3)
            srm1 = _gather(gen.schedule.sqrt_recipm1_alphas_cumprod, t, 3)
            args = (x, jnp.take(tmap, t), (sr, srm1), mel, pid)
            ref = gen.model.apply(gen.variables, *args, hubert=hub,
                                  train=False)
            got = gen.model.apply(gen.variables, *args, hubert=hub,
                                  train=False,
                                  cache=gather_level(cache, t[0]))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5, rtol=1e-5)

    def test_expr_id_off_matches(self):
        cfg = tiny(beat_config(), expr_id_off=True)
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(2), batch=2)
        gen = WindowGenerator(cfg, variables)
        mel, pid, hub, x = make_inputs(cfg, jax.random.PRNGKey(3))
        tmap = gen.timestep_map
        cache = build_level_cache(cfg.model, gen.variables, tmap, mel, pid,
                                  hub)
        t = jnp.full((2,), 11, dtype=jnp.int32)
        sr = _gather(gen.schedule.sqrt_recip_alphas_cumprod, t, 3)
        srm1 = _gather(gen.schedule.sqrt_recipm1_alphas_cumprod, t, 3)
        args = (x, jnp.take(tmap, t), (sr, srm1), mel, pid)
        ref = gen.model.apply(gen.variables, *args, hubert=hub, train=False)
        got = gen.model.apply(gen.variables, *args, hubert=hub, train=False,
                              cache=gather_level(cache, t[0]))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def _generators_on_off(cfg, seed=0):
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(seed), batch=2)
    g_on = WindowGenerator(cfg, variables)
    g_off = WindowGenerator(
        cfg.replace(diffusion=dataclasses.replace(
            cfg.diffusion, level_cache=False)), variables)
    assert g_on._use_level_cache and not g_off._use_level_cache
    return g_on, g_off


class TestSamplingParity:
    def test_plain_and_repaint_windows_match(self):
        cfg = tiny(beat_config())
        g_on, g_off = _generators_on_off(cfg)
        mel, pid, hub, _ = make_inputs(cfg, jax.random.PRNGKey(4))
        k = jax.random.PRNGKey(5)
        np.testing.assert_allclose(
            np.asarray(g_on.generate(mel, pid, k, hub)),
            np.asarray(g_off.generate(mel, pid, k, hub)),
            atol=1e-4, rtol=1e-4)
        head = jnp.ones((2, cfg.stream.overlap_len, cfg.model.motion_dim)) * .2
        np.testing.assert_allclose(
            np.asarray(g_on.generate(mel, pid, k, hub, gt_head=head)),
            np.asarray(g_off.generate(mel, pid, k, hub, gt_head=head)),
            atol=1e-4, rtol=1e-4)

    def test_cfg_batch_doubling_matches(self):
        # SHOW-style classifier-free guidance exercises the cache's batch
        # doubling of mods/audio_lat/hubert_lat.
        cfg = tiny(show_config())
        assert cfg.model.uses_cfg_at_inference
        g_on, g_off = _generators_on_off(cfg, seed=6)
        mel, pid, hub, _ = make_inputs(cfg, jax.random.PRNGKey(7))
        k = jax.random.PRNGKey(8)
        np.testing.assert_allclose(
            np.asarray(g_on.generate(mel, pid, k, hub)),
            np.asarray(g_off.generate(mel, pid, k, hub)),
            atol=1e-4, rtol=1e-4)


class TestGating:
    def test_unsupported_configs_fall_back(self):
        assert not supports_level_cache(
            dataclasses.replace(beat_config().model, add_text_cond=True))
        assert not supports_level_cache(
            dataclasses.replace(beat_config().model,
                                branch_mode="gesture_only"))
        cfg = tiny(beat_config(), add_text_cond=True)
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(9))
        gen = WindowGenerator(cfg, variables)
        assert not gen._use_level_cache

    def test_full_schedule_falls_back(self):
        cfg = tiny(beat_config())
        cfg = cfg.replace(diffusion=dataclasses.replace(
            cfg.diffusion, respacing=""))
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(10))
        gen = WindowGenerator(cfg, variables)
        assert not gen._use_level_cache
