"""Sampler tests with analytic oracle models (no network needed)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from diffsheg_tpu.config import beat_config
from diffsheg_tpu.diffusion import (
    get_named_beta_schedule,
    make_schedule,
    make_respaced_schedule,
    space_timesteps,
    jump_schedule_ddim,
    make_step_program,
    plain_program,
)
from diffsheg_tpu.diffusion.sampler import (
    RepaintSpec,
    ancestral_sample_program,
    ddim_sample_program,
    ddim_update,
)


def respaced25():
    base = get_named_beta_schedule("linear", 1000)
    return make_respaced_schedule(base, space_timesteps(1000, "ddim25"))


class TestDDIMUpdate:
    def test_telescoping_with_zero_eps_model(self):
        # If the model always predicts eps = 0, each DDIM step multiplies by
        # sqrt(ab_prev/ab); the full chain telescopes to 1/sqrt(ab[T-1]).
        sched, _ = respaced25()
        zero_model = lambda x, t: jnp.zeros_like(x)
        noise = jnp.full((1, 4, 8), 0.3)
        x, _ = ddim_sample_program(
            sched, zero_model, plain_program(25), noise, jax.random.PRNGKey(0))
        expect = 0.3 / np.sqrt(float(sched.alphas_cumprod[24]))
        np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-4)

    def test_ddim_update_t0_returns_x0(self):
        sched, _ = respaced25()
        x = jnp.ones((2, 3, 4))
        x0 = jnp.full((2, 3, 4), 0.5)
        t = jnp.zeros((2,), dtype=jnp.int32)
        out = ddim_update(sched, x, t, x0, jnp.zeros_like(x))
        # ab_prev[0] = 1 -> mean = x0 exactly
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)

    def test_eta_zero_is_noise_free(self):
        sched, _ = respaced25()
        zero_model = lambda x, t: jnp.zeros_like(x)
        noise = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8))
        x1, _ = ddim_sample_program(
            sched, zero_model, plain_program(25), noise, jax.random.PRNGKey(2))
        x2, _ = ddim_sample_program(
            sched, zero_model, plain_program(25), noise, jax.random.PRNGKey(3))
        # different rng keys, same result: eta=0 uses no sampler noise
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)

    def test_eta_nonzero_uses_noise(self):
        sched, _ = respaced25()
        zero_model = lambda x, t: jnp.zeros_like(x)
        noise = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8))
        x1, _ = ddim_sample_program(
            sched, zero_model, plain_program(25), noise, jax.random.PRNGKey(2),
            eta=1.0)
        x2, _ = ddim_sample_program(
            sched, zero_model, plain_program(25), noise, jax.random.PRNGKey(3),
            eta=1.0)
        assert not np.allclose(np.asarray(x1), np.asarray(x2))


class TestRepaint:
    def test_overlap_head_frame_pinned_to_gt(self):
        # With addBlend, the final denoise step (t=0) has zero noise weight so
        # weighed_gt == gt, and the blend weight at frame 0 is 0 => the first
        # overlap frame equals gt exactly.
        sched, _ = respaced25()
        zero_model = lambda x, t: jnp.zeros_like(x)
        prog = make_step_program(jump_schedule_ddim(25, 3, 2))
        B, T, C, ov = 2, 10, 6, 4
        gt = jnp.zeros((B, T, C)).at[:, :ov].set(0.7)
        noise = jax.random.normal(jax.random.PRNGKey(0), (B, T, C))
        spec = RepaintSpec(overlap_len=ov, add_blend=True)
        x, _ = ddim_sample_program(
            sched, zero_model, prog, noise, jax.random.PRNGKey(1),
            repaint=spec, gt=gt)
        np.testing.assert_allclose(np.asarray(x[:, 0]), 0.7, atol=1e-5)

    def test_without_blend_whole_overlap_is_gt_at_end(self):
        sched, _ = respaced25()
        zero_model = lambda x, t: jnp.zeros_like(x)
        prog = make_step_program(jump_schedule_ddim(25, 3, 2))
        B, T, C, ov = 1, 10, 6, 4
        gt = jnp.zeros((B, T, C)).at[:, :ov].set(-0.3)
        noise = jax.random.normal(jax.random.PRNGKey(0), (B, T, C))
        spec = RepaintSpec(overlap_len=ov, add_blend=False)
        x, _ = ddim_sample_program(
            sched, zero_model, prog, noise, jax.random.PRNGKey(1),
            repaint=spec, gt=gt)
        # final step projects overlap to exactly gt (noise weight 0 at t=0)
        np.testing.assert_allclose(np.asarray(x[:, :ov]), -0.3, atol=1e-5)

    def test_non_overlap_frames_unaffected_by_gt(self):
        sched, _ = respaced25()
        zero_model = lambda x, t: jnp.zeros_like(x)
        prog = make_step_program(jump_schedule_ddim(25, 3, 2))
        B, T, C, ov = 1, 10, 6, 4
        noise = jax.random.normal(jax.random.PRNGKey(0), (B, T, C))
        spec = RepaintSpec(overlap_len=ov, add_blend=True)
        gt_a = jnp.zeros((B, T, C)).at[:, :ov].set(0.9)
        gt_b = jnp.zeros((B, T, C)).at[:, :ov].set(-0.9)
        xa, _ = ddim_sample_program(
            sched, zero_model, prog, noise, jax.random.PRNGKey(1),
            repaint=spec, gt=gt_a)
        xb, _ = ddim_sample_program(
            sched, zero_model, prog, noise, jax.random.PRNGKey(1),
            repaint=spec, gt=gt_b)
        # with a gt-independent model the free frames evolve identically
        np.testing.assert_allclose(
            np.asarray(xa[:, ov:]), np.asarray(xb[:, ov:]), atol=1e-5)

    def test_same_overlap_noisy_tails_recorded(self):
        sched, _ = respaced25()
        zero_model = lambda x, t: jnp.zeros_like(x)
        prog = make_step_program(jump_schedule_ddim(25, 3, 2))
        B, T, C, ov = 1, 10, 6, 4
        gt = jnp.zeros((B, T, C))
        noise = jax.random.normal(jax.random.PRNGKey(0), (B, T, C))
        spec = RepaintSpec(overlap_len=ov, add_blend=True,
                           same_overlap_noisy=True)
        _, tails = ddim_sample_program(
            sched, zero_model, prog, noise, jax.random.PRNGKey(1),
            repaint=spec, gt=gt)
        assert tails.shape == (26, B, ov, C)
        # levels 0..15 visited by the program get written
        assert float(jnp.abs(tails[:16]).sum()) > 0.0


class TestAncestral:
    def test_shapes_and_finiteness(self):
        sched, _ = respaced25()
        zero_model = lambda x, t: jnp.zeros_like(x)
        noise = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4))
        x = ancestral_sample_program(
            sched, zero_model, noise, jax.random.PRNGKey(1))
        assert x.shape == noise.shape
        assert bool(jnp.isfinite(x).all())

    def test_fixed_large_differs_from_fixed_small(self):
        sched, _ = respaced25()
        zero_model = lambda x, t: jnp.zeros_like(x)
        noise = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4))
        a = ancestral_sample_program(
            sched, zero_model, noise, jax.random.PRNGKey(1),
            var_type="fixed_small")
        b = ancestral_sample_program(
            sched, zero_model, noise, jax.random.PRNGKey(1),
            var_type="fixed_large")
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestWindowGeneratorIntegration:
    def test_streaming_end_to_end(self):
        from diffsheg_tpu.models.unidiffuser import init_unidiffuser
        from diffsheg_tpu.sampling.generator import WindowGenerator
        from diffsheg_tpu.sampling.streamer import StreamingGenerator, window_starts

        cfg = beat_config()
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
            hubert_latent_dim=16))
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(0))
        gen = WindowGenerator(cfg, variables)
        stream = StreamingGenerator(gen)
        B, T = 1, 75
        mel = jax.random.normal(jax.random.PRNGKey(1), (B, T, 128))
        hub = jax.random.normal(jax.random.PRNGKey(2), (B, T, 1024))
        pid = jax.nn.one_hot(jnp.array([2]), 30)
        out = stream.generate(mel, pid, jax.random.PRNGKey(3), hubert=hub)
        assert out.shape == (B, T, cfg.model.motion_dim)
        assert bool(jnp.isfinite(out).all())
        # window plan covers the sequence with static-size windows
        starts = window_starts(T, 34, 30)
        assert starts[-1] + 34 == T
        assert all(s + 34 <= T for s in starts)


class TestFusedStreamer:
    def _setup(self, T):
        import dataclasses
        from diffsheg_tpu.config import beat_config
        from diffsheg_tpu.models.unidiffuser import init_unidiffuser
        from diffsheg_tpu.sampling.generator import WindowGenerator
        from diffsheg_tpu.sampling.streamer import StreamingGenerator
        cfg = beat_config()
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
            add_hubert=False))
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(0))
        stream = StreamingGenerator(WindowGenerator(cfg, variables))
        B = 2
        mel = jax.random.normal(jax.random.PRNGKey(1),
                                (B, T, cfg.model.audio_dim))
        pid = jax.nn.one_hot(jnp.arange(B), cfg.model.style_dim)
        return cfg, stream, mel, pid

    def test_fused_matches_host_loop(self):
        # T=100: windows [0, 30, 60, 66] — exercises mid scan AND the
        # left-shifted final window.
        cfg, stream, mel, pid = self._setup(100)
        rng = jax.random.PRNGKey(7)
        host = np.asarray(stream.generate(mel, pid, rng))
        fused = np.asarray(stream.generate_fused(mel, pid, rng))
        assert fused.shape == host.shape == (2, 100, cfg.model.motion_dim)
        np.testing.assert_allclose(fused, host, atol=2e-4, rtol=2e-4)

    def test_fused_uniform_last_window(self):
        # T=94: starts [0, 30, 60], 60+34=94 — no shifted window.
        cfg, stream, mel, pid = self._setup(94)
        rng = jax.random.PRNGKey(3)
        host = np.asarray(stream.generate(mel, pid, rng))
        fused = np.asarray(stream.generate_fused(mel, pid, rng))
        np.testing.assert_allclose(fused, host, atol=2e-4, rtol=2e-4)

    def test_fused_short_sequence_falls_back(self):
        cfg, stream, mel, pid = self._setup(20)
        out = stream.generate_fused(mel, pid, jax.random.PRNGKey(0))
        assert out.shape == (2, 20, cfg.model.motion_dim)


class TestFusedSameOverlapNoisy:
    def _setup(self, T, **stream_kw):
        import dataclasses
        from diffsheg_tpu.config import beat_config
        from diffsheg_tpu.models.unidiffuser import init_unidiffuser
        from diffsheg_tpu.sampling.generator import WindowGenerator
        from diffsheg_tpu.sampling.streamer import StreamingGenerator
        cfg = beat_config()
        cfg = cfg.replace(
            model=dataclasses.replace(
                cfg.model, latent_dim=32, num_layers=1, num_heads=2,
                ff_size=64, add_hubert=False),
            stream=dataclasses.replace(cfg.stream, same_overlap_noisy=True,
                                       **stream_kw))
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(0))
        stream = StreamingGenerator(WindowGenerator(cfg, variables))
        B = 2
        mel = jax.random.normal(jax.random.PRNGKey(1),
                                (B, T, cfg.model.audio_dim))
        pid = jax.nn.one_hot(jnp.arange(B), cfg.model.style_dim)
        return cfg, stream, mel, pid

    def test_fused_matches_host_loop(self):
        # T=100 exercises: plain window 0 (no tails), first continuation
        # (valid=False), scanned continuations (valid=True), shifted last.
        cfg, stream, mel, pid = self._setup(100)
        rng = jax.random.PRNGKey(7)
        host = np.asarray(stream.generate(mel, pid, rng))
        fused = np.asarray(stream.generate_fused(mel, pid, rng))
        np.testing.assert_allclose(fused, host, atol=2e-4, rtol=2e-4)

    def test_fused_with_fix_very_first(self):
        # fix_very_first makes window 0 a repaint window whose tails are
        # valid for window 1 already.
        cfg, stream, mel, pid = self._setup(94, fix_very_first=True)
        rng = jax.random.PRNGKey(5)
        host = np.asarray(stream.generate(mel, pid, rng))
        fused = np.asarray(stream.generate_fused(mel, pid, rng))
        np.testing.assert_allclose(fused, host, atol=2e-4, rtol=2e-4)

    def test_flag_changes_output(self):
        # the saved-tail reuse must actually alter the samples
        cfg, stream, mel, pid = self._setup(100)
        import dataclasses
        from diffsheg_tpu.sampling.generator import WindowGenerator
        from diffsheg_tpu.sampling.streamer import StreamingGenerator
        cfg_off = cfg.replace(stream=dataclasses.replace(
            cfg.stream, same_overlap_noisy=False))
        stream_off = StreamingGenerator(
            WindowGenerator(cfg_off, stream.gen.variables))
        rng = jax.random.PRNGKey(7)
        on = np.asarray(stream.generate_fused(mel, pid, rng))
        off = np.asarray(stream_off.generate_fused(mel, pid, rng))
        assert not np.allclose(on, off)


class TestBf16Serving:
    def test_bf16_generator_tracks_f32(self):
        """compute_dtype=bfloat16 casts the weights once at generator build;
        outputs must track the f32 path closely (serving config)."""
        import dataclasses
        from diffsheg_tpu.config import beat_config
        from diffsheg_tpu.models.unidiffuser import init_unidiffuser
        from diffsheg_tpu.sampling.generator import WindowGenerator
        from diffsheg_tpu.sampling.streamer import StreamingGenerator

        cfg = beat_config()
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
            add_hubert=False))
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(0))
        B, T = 1, 60
        mel = jax.random.normal(jax.random.PRNGKey(1), (B, T, 128))
        pid = jax.nn.one_hot(jnp.array([2]), 30)

        f32 = np.asarray(StreamingGenerator(WindowGenerator(cfg, variables))
                         .generate(mel, pid, jax.random.PRNGKey(3)))

        cfg16 = cfg.replace(model=dataclasses.replace(
            cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
            add_hubert=False, compute_dtype="bfloat16"))
        gen16 = WindowGenerator(cfg16, variables)
        # the generator cast the params itself
        leaf = jax.tree.leaves(gen16.variables)[0]
        assert leaf.dtype == jnp.bfloat16
        bf16 = np.asarray(StreamingGenerator(gen16)
                          .generate(mel, pid, jax.random.PRNGKey(3))
                          .astype(jnp.float32))
        assert np.isfinite(bf16).all()
        rel = np.sqrt(((bf16 - f32) ** 2).mean()) / max(f32.std(), 1e-6)
        assert rel < 0.05, rel
