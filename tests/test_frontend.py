"""On-device speech frontend: resample parity, feature parity, step parity.

The on-device train frontend (audio/frontend.py) must reproduce the cached
feature pipeline — host scipy resample + MelFrontend (data/beat.py:171-183)
and the offline chunked HuBERT extractor (audio/hubert_runner.py) — so that
switching ``train.on_device_frontend`` changes bytes-on-the-wire, not the
training distribution.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsheg_tpu.audio.resample import output_len, resample_poly_device


# ---------------------------------------------------------------------------
# polyphase resampler vs scipy
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,up,down", [
    (36266, 9, 8),      # the BEAT window: 16 kHz -> 18 kHz
    (1000, 9, 8),
    (777, 2, 3),        # downsampling
    (5000, 160, 441),   # 16 kHz -> 44.1 kHz-style ratio
])
def test_resample_matches_scipy(n, up, down):
    from scipy.signal import resample_poly

    rng = np.random.RandomState(0)
    x = rng.randn(2, n).astype(np.float32)
    ref = np.stack([resample_poly(r.astype(np.float64), up, down) for r in x])
    got = np.asarray(resample_poly_device(jnp.asarray(x), up, down))
    assert got.shape == ref.shape == (2, output_len(n, up, down))
    scale = max(np.abs(ref).max(), 1e-9)
    assert np.abs(got - ref).max() / scale < 1e-5


def test_resample_identity():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 64), jnp.float32)
    np.testing.assert_array_equal(np.asarray(resample_poly_device(x, 4, 4)),
                                  np.asarray(x))


# ---------------------------------------------------------------------------
# feature parity vs the cache-build path
# ---------------------------------------------------------------------------

def _tiny_cfg(add_hubert: bool):
    from diffsheg_tpu.config import beat_config, resolve

    cfg = beat_config()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, latent_dim=32, ff_size=64, num_layers=1, num_heads=2,
            add_hubert=add_hubert, hubert_dim=16, hubert_latent_dim=8),
        data=dataclasses.replace(cfg.data, n_poses=34),
        train=dataclasses.replace(cfg.train, on_device_frontend=True),
    )
    return resolve(cfg)


def _tiny_hubert_cfg():
    from diffsheg_tpu.models.hubert import HubertConfig

    # same conv stack geometry (stride 320 / kernel 400) but a tiny encoder
    return HubertConfig(hidden_size=16, num_layers=1, num_heads=2,
                        intermediate_size=32,
                        conv_dim=(8, 8, 8, 8, 8, 8, 8))


def test_mel_branch_matches_cache_build():
    """Frontend mel == the _mel_windows host path (scipy resample +
    MelFrontend) on the same raw windows."""
    from diffsheg_tpu.audio.frontend import make_speech_frontend
    from diffsheg_tpu.data.beat import BeatBuildConfig, _mel_windows

    cfg = _tiny_cfg(add_hubert=False)
    T = cfg.data.n_poses
    S = int(T / cfg.data.fps * cfg.data.audio_sr)
    rng = np.random.RandomState(0)
    wave = (rng.randn(3, S) * 0.1).astype(np.float32)

    cached = _mel_windows(wave, BeatBuildConfig(), T)

    fe = make_speech_frontend(cfg)
    batch = fe({"wave16": jnp.asarray(wave),
                "motion": jnp.zeros((3, T, 4))})
    got = np.asarray(batch["mel"])
    assert got.shape == cached.shape == (3, T, cfg.data.n_mels)
    scale = max(np.abs(cached).max(), 1e-9)
    assert np.abs(got - cached).max() / scale < 2e-5


def test_hubert_branch_matches_offline_extractor():
    """Frontend HuBERT == the offline chunked extractor per window (a
    window is shorter than one chunk, so the chunker is a single pass)."""
    from diffsheg_tpu.audio.frontend import make_speech_frontend
    from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor

    cfg = _tiny_cfg(add_hubert=True)
    hcfg = _tiny_hubert_cfg()
    T = cfg.data.n_poses
    S = int(T / cfg.data.fps * cfg.data.audio_sr)
    rng = np.random.RandomState(1)
    wave = (rng.randn(2, S) * 0.1).astype(np.float32)

    extractor = HubertFeatureExtractor(cfg=hcfg)
    ref = np.concatenate([
        np.asarray(extractor(jnp.asarray(w), target_frames=T))
        for w in wave])

    fe = make_speech_frontend(cfg, hubert_variables=extractor.variables,
                              hubert_cfg=hcfg)
    batch = fe({"wave16": jnp.asarray(wave),
                "motion": jnp.zeros((2, T, 4))})
    got = np.asarray(batch["hubert"])
    assert got.shape == ref.shape == (2, T, hcfg.hidden_size)
    scale = max(np.abs(ref).max(), 1e-9)
    assert np.abs(got - ref).max() / scale < 1e-5


def test_int16_transport_dequantizes():
    from diffsheg_tpu.audio.frontend import make_speech_frontend

    cfg = _tiny_cfg(add_hubert=False)
    T = cfg.data.n_poses
    S = int(T / cfg.data.fps * cfg.data.audio_sr)
    wave = (np.random.RandomState(2).randn(1, S) * 0.1).astype(np.float32)
    q = np.clip(wave * 32768.0, -32768, 32767).astype(np.int16)

    fe = make_speech_frontend(cfg)
    a = fe({"wave16": jnp.asarray(wave), "motion": jnp.zeros((1, T, 4))})
    b = fe({"wave16": jnp.asarray(q), "motion": jnp.zeros((1, T, 4))})
    scale = max(np.abs(np.asarray(a["mel"])).max(), 1e-9)
    assert np.abs(np.asarray(a["mel"]) - np.asarray(b["mel"])).max() \
        / scale < 1e-3


def test_scan_layers_matches_unrolled():
    """scan_layers=True (one lax.scan over stacked params) == the unrolled
    24-layer composition, with and without a frame mask."""
    import dataclasses as dc

    import jax.numpy as jnp
    from diffsheg_tpu.models.hubert import HubertModel, stack_layer_params

    hcfg = dc.replace(_tiny_hubert_cfg(), num_layers=3)
    m_unroll = HubertModel(hcfg)
    v = jax.jit(m_unroll.init)(jax.random.PRNGKey(0), jnp.zeros((1, 1600)))
    m_scan = HubertModel(hcfg, scan_layers=True)
    v_scan = stack_layer_params(v, hcfg.num_layers)

    wave = jnp.asarray(
        (np.random.RandomState(5).randn(2, 2000) * 0.1), jnp.float32)
    a = np.asarray(m_unroll.apply(v, wave))
    b = np.asarray(m_scan.apply(v_scan, wave))
    np.testing.assert_allclose(b, a, atol=1e-6, rtol=1e-6)

    mask = jnp.asarray(np.arange(a.shape[1])[None, :]
                       < np.asarray([a.shape[1], 3])[:, None])
    am = np.asarray(m_unroll.apply(v, wave, mask))
    bm = np.asarray(m_scan.apply(v_scan, wave, mask))
    np.testing.assert_allclose(bm, am, atol=1e-6, rtol=1e-6)


# ---------------------------------------------------------------------------
# train-step integration
# ---------------------------------------------------------------------------

@pytest.mark.slow  # >60s-class on one CPU core; core tier covers the same path via smaller tests
def test_train_step_with_frontend_matches_precomputed():
    """One jitted step on raw audio == the same step on the features the
    frontend computes — the flag changes transport, not the objective."""
    from diffsheg_tpu.audio.frontend import make_speech_frontend
    from diffsheg_tpu.diffusion.schedule import (
        get_named_beta_schedule, make_schedule)
    from diffsheg_tpu.models.factory import init_denoiser
    from diffsheg_tpu.train.step import create_train_state, make_train_step

    cfg = _tiny_cfg(add_hubert=True)
    hcfg = _tiny_hubert_cfg()
    T = cfg.data.n_poses
    S = int(T / cfg.data.fps * cfg.data.audio_sr)
    rng = np.random.RandomState(3)
    B = 2
    motion = rng.randn(B, T, cfg.model.motion_dim).astype(np.float32)
    wave = (rng.randn(B, S) * 0.1).astype(np.float32)
    pid = np.eye(cfg.model.style_dim, dtype=np.float32)[
        np.arange(B) % cfg.model.style_dim]
    sem = rng.rand(B, T).astype(np.float32)

    _, variables = init_denoiser(cfg.model, T, jax.random.PRNGKey(0))
    sched = make_schedule(get_named_beta_schedule(
        cfg.diffusion.beta_schedule, cfg.diffusion.num_steps))
    fe = make_speech_frontend(cfg, hubert_cfg=hcfg)

    # the step donates the state; copy so state_b's params survive step_a
    state_a = create_train_state(cfg, jax.tree.map(jnp.array, variables))
    step_a = make_train_step(cfg, sched, frontend=fe)
    raw = {"motion": jnp.asarray(motion), "wave16": jnp.asarray(wave),
           "pid": jnp.asarray(pid), "sem": jnp.asarray(sem)}
    _, terms_a = step_a(state_a, raw, jax.random.PRNGKey(9))

    feats = fe(dict(raw))
    state_b = create_train_state(cfg, variables)
    step_b = make_train_step(cfg, sched)
    _, terms_b = step_b(state_b, feats, jax.random.PRNGKey(9))

    a, b = float(terms_a.total), float(terms_b.total)
    assert np.isfinite(a)
    assert abs(a - b) <= 1e-4 * max(1.0, abs(b)), (a, b)
