"""Live streaming session: incremental generation == offline generation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diffsheg_tpu.audio.mel import MelFrontend
from diffsheg_tpu.config import beat_config
from diffsheg_tpu.models.unidiffuser import init_unidiffuser
from diffsheg_tpu.sampling.generator import WindowGenerator
from diffsheg_tpu.sampling.live import LiveSession
from diffsheg_tpu.sampling.streamer import StreamingGenerator


def _setup(seed=0):
    cfg = beat_config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
        add_hubert=False))
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(seed))
    gen = WindowGenerator(cfg, variables)
    pid = jax.nn.one_hot(jnp.array([2]), cfg.model.style_dim)
    return cfg, gen, pid


def _audio(cfg, frames, seed=1):
    n = frames * cfg.data.mel_hop
    return (np.random.RandomState(seed).randn(n) * 0.1).astype(np.float32)


class TestLiveSession:
    def test_full_push_matches_offline(self):
        """Everything pushed at once + finish == the offline host-loop
        streamer on the offline mel (same windows, same key chain)."""
        cfg, gen, pid = _setup()
        T = 70
        audio = _audio(cfg, T)
        rng = jax.random.PRNGKey(3)

        fe = MelFrontend(sr=cfg.data.mel_sr, n_fft=2048,
                         hop=cfg.data.mel_hop, n_mels=cfg.data.n_mels)
        mel = fe(jnp.asarray(audio)[None])
        offline = np.asarray(
            StreamingGenerator(gen).generate(mel, pid, rng))

        live = LiveSession(gen, pid, rng)
        live.push(audio)
        got = live.finish()
        assert got.shape == offline.shape == (1, T, cfg.model.motion_dim)
        np.testing.assert_allclose(got, offline, atol=1e-3, rtol=1e-3)

    def test_incremental_equals_full_push(self):
        """Chunked pushes emit progressively and end bit-comparable to one
        big push (window mel depends only on its own samples)."""
        cfg, gen, pid = _setup(seed=4)
        T = 70
        audio = _audio(cfg, T, seed=5)
        rng = jax.random.PRNGKey(6)

        full = LiveSession(gen, pid, rng)
        full.push(audio)
        want = full.finish()

        live = LiveSession(gen, pid, rng)
        counts = []
        chunk = len(audio) // 7
        for i in range(7):
            out = live.push(audio[i * chunk:(i + 1) * chunk])
            counts.append(out.shape[1])
        live.push(audio[7 * chunk:])
        got = live.finish()

        assert sum(counts) > 0                  # emitted before the end
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_short_session(self):
        """Less than one window of audio: pad-and-trim at finish."""
        cfg, gen, pid = _setup(seed=7)
        audio = _audio(cfg, 12, seed=8)
        live = LiveSession(gen, pid, jax.random.PRNGKey(9))
        out = live.push(audio)
        assert out.shape[1] == 0                # nothing stable yet
        got = live.finish()
        assert got.shape == (1, 12, cfg.model.motion_dim)
        assert np.isfinite(got).all()
