"""Single-dispatch pipeline parity: FusedPipeline == staged stages."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor
from diffsheg_tpu.audio.mel import MelFrontend
from diffsheg_tpu.config import beat_config
from diffsheg_tpu.models.hubert import HubertConfig
from diffsheg_tpu.models.unidiffuser import init_unidiffuser
from diffsheg_tpu.sampling.generator import WindowGenerator
from diffsheg_tpu.sampling.pipeline import FusedPipeline
from diffsheg_tpu.sampling.streamer import StreamingGenerator


def _setup(add_hubert):
    cfg = beat_config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
        add_hubert=add_hubert, hubert_dim=32, hubert_latent_dim=16))
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))
    stream = StreamingGenerator(WindowGenerator(cfg, variables))
    frontend = MelFrontend(sr=cfg.data.mel_sr, hop=cfg.data.mel_hop,
                           n_mels=cfg.data.n_mels)
    hub_fe = None
    if add_hubert:
        hub_fe = HubertFeatureExtractor(HubertConfig(
            hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
            conv_dim=(16,) * 7))
    return cfg, stream, frontend, hub_fe


class TestFusedPipeline:
    def test_matches_staged_path(self):
        cfg, stream, frontend, hub_fe = _setup(add_hubert=True)
        secs, sr16 = 4, 16000
        rs = np.random.RandomState(0)
        audio18 = jnp.asarray(
            rs.randn(1, secs * cfg.data.mel_sr).astype(np.float32) * 0.1)
        audio16 = jnp.asarray(
            rs.randn(1, secs * sr16).astype(np.float32) * 0.1)
        pid = jax.nn.one_hot(jnp.array([1, 4]), cfg.model.style_dim)
        rng = jax.random.PRNGKey(5)

        mel = frontend(audio18)
        T = mel.shape[1]
        hub = hub_fe(audio16, target_frames=T)
        B = 2
        mel_b = jnp.broadcast_to(mel, (B,) + mel.shape[1:])
        hub_b = jnp.broadcast_to(hub, (B,) + hub.shape[1:])
        staged = stream.generate_fused(mel_b, pid, rng, hubert=hub_b)

        pipe = FusedPipeline(stream, frontend, hub_fe)
        fused = pipe(audio18, audio16, pid, rng)
        assert fused.shape == staged.shape
        # same traced functions, but XLA fuses across the former jit
        # boundaries and may reassociate float ops; the 25-step denoise
        # chain amplifies that to ~3e-3 relative on a few elements
        np.testing.assert_allclose(np.asarray(fused), np.asarray(staged),
                                   atol=5e-2, rtol=5e-3)

    def test_short_clip_no_hubert(self):
        cfg, stream, frontend, _ = _setup(add_hubert=False)
        # under one window (n_poses=34 frames): pad-and-trim branch
        audio18 = jnp.asarray(np.random.RandomState(1)
                              .randn(1, cfg.data.mel_hop * 20)
                              .astype(np.float32) * 0.1)
        pid = jax.nn.one_hot(jnp.array([0]), cfg.model.style_dim)
        pipe = FusedPipeline(stream, frontend, None)
        out = pipe(audio18, None, pid, jax.random.PRNGKey(0))
        assert out.shape == (1, 20, cfg.model.motion_dim)
        assert np.isfinite(np.asarray(out)).all()
