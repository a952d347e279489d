"""Audio frontend tests: STFT against a direct numpy DFT oracle, mel
filterbank against the slaney formulas evaluated independently."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal

from diffsheg_tpu.audio.mel import (
    MelFrontend,
    frame_signal,
    hann_window,
    mel_filterbank,
    stft_magsq,
    _hz_to_mel,
    _mel_to_hz,
)


class TestWindowAndFraming:
    def test_hann_matches_scipy_periodic(self):
        w = hann_window(2048)
        ref = scipy.signal.get_window("hann", 2048, fftbins=True)
        np.testing.assert_allclose(w, ref, atol=1e-6)

    def test_frame_count_and_content(self):
        y = jnp.arange(100.0)
        frames = frame_signal(y, frame_length=10, hop=4)
        assert frames.shape == (23, 10)  # 1 + (100-10)//4
        np.testing.assert_array_equal(np.asarray(frames[0]), np.arange(10.0))
        np.testing.assert_array_equal(np.asarray(frames[1]),
                                      np.arange(4.0, 14.0))


class TestSTFT:
    def test_against_numpy_dft(self):
        rng = np.random.RandomState(0)
        y = rng.randn(4096).astype(np.float32)
        n_fft, hop = 512, 128
        win = hann_window(n_fft)
        out = np.asarray(stft_magsq(jnp.asarray(y), n_fft, hop,
                                    jnp.asarray(win), center=True,
                                    pad_mode="reflect"))
        # independent oracle: manual reflect pad + numpy rfft
        yp = np.pad(y, n_fft // 2, mode="reflect")
        T = 1 + (len(yp) - n_fft) // hop
        assert out.shape == (T, n_fft // 2 + 1)
        for ti in (0, 5, T - 1):
            fr = yp[ti * hop: ti * hop + n_fft] * np.asarray(win)
            ref = np.abs(np.fft.rfft(fr)) ** 2
            np.testing.assert_allclose(out[ti], ref, rtol=1e-3, atol=1e-3)

    def test_pure_tone_peak_bin(self):
        sr, n_fft, hop = 18000, 2048, 1200
        f0 = 1000.0
        t = np.arange(sr, dtype=np.float64) / sr
        y = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        out = np.asarray(stft_magsq(jnp.asarray(y), n_fft, hop,
                                    jnp.asarray(hann_window(n_fft))))
        peak = out[5].argmax()
        assert abs(peak - round(f0 * n_fft / sr)) <= 1


class TestMelScale:
    def test_slaney_roundtrip(self):
        f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 9000.0])
        np.testing.assert_allclose(_mel_to_hz(_hz_to_mel(f)), f, rtol=1e-10)

    def test_slaney_linear_below_1k(self):
        np.testing.assert_allclose(_hz_to_mel(np.array([600.0])),
                                   600.0 / (200.0 / 3), rtol=1e-12)

    def test_htk_formula(self):
        f = np.array([1000.0])
        np.testing.assert_allclose(_hz_to_mel(f, htk=True),
                                   2595.0 * np.log10(1 + 1000.0 / 700.0))


class TestMelFilterbank:
    def setup_method(self):
        self.fb = mel_filterbank(18000, 2048, 128)

    def test_shape_and_nonneg(self):
        assert self.fb.shape == (128, 1025)
        assert (self.fb >= 0).all()

    def test_peaks_monotonic(self):
        peaks = self.fb.argmax(axis=1)
        assert (np.diff(peaks) >= 0).all()

    def test_slaney_normalization(self):
        # With slaney norm each filter has ~unit area in Hz: the weight at
        # peak equals 2 / (band width); integral of the triangle = 1.
        mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(9000.0), 130)
        hz_pts = _mel_to_hz(mel_pts)
        df = 18000.0 / 2048
        areas = self.fb.sum(axis=1) * df
        # discretisation error grows for narrow low-frequency triangles
        assert np.median(np.abs(areas[40:] - 1.0)) < 0.05
        # analytic peak height for a mid filter
        m = 64
        width = hz_pts[m + 2] - hz_pts[m]
        assert abs(self.fb[m].max() - 2.0 / width) / (2.0 / width) < 0.1

    def test_full_coverage(self):
        # every fft bin between the first and last band edge is covered
        colsum = self.fb.sum(axis=0)
        assert (colsum[10:-10] > 0).all()


class TestMelFrontend:
    def test_frame_rate_matches_fps(self):
        # 2.4 s at 18 kHz, hop 1200 -> 36 frames = 15 fps (BEAT)
        fe = MelFrontend(sr=18000, hop=1200)
        y = jnp.asarray(np.random.RandomState(0).randn(1, 43200),
                        dtype=jnp.float32)
        mel = fe(y)
        assert mel.shape == (1, 36, 128)

    def test_batched_equals_single(self):
        fe = MelFrontend()
        rng = np.random.RandomState(1)
        y = rng.randn(2, 18000).astype(np.float32)
        batched = np.asarray(fe(jnp.asarray(y)))
        single0 = np.asarray(fe(jnp.asarray(y[0:1])))
        np.testing.assert_allclose(batched[0], single0[0], rtol=1e-5, atol=1e-5)

    def test_silence_gives_zero(self):
        fe = MelFrontend()
        mel = fe(jnp.zeros((1, 18000)))
        np.testing.assert_allclose(np.asarray(mel), 0.0, atol=1e-10)


class TestHubertChunker:
    """The static-shape chunked driver must agree with single-pass encoding
    (the reference's rollback-chunking algorithm, ddpm_beat_trainer.py:
    1429-1475, reimplemented with batched fixed-shape chunks)."""

    def _tiny_cfg(self):
        from diffsheg_tpu.models.hubert import HubertConfig
        # real conv geometry (stride 320 / rf 400) but tiny widths
        return HubertConfig(
            hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
            conv_dim=(16,) * 7,
            conv_kernel=(10, 3, 3, 3, 3, 2, 2),
            conv_stride=(5, 2, 2, 2, 2, 2, 2),
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        )

    def test_chunked_equals_single_pass(self):
        import jax
        import jax.numpy as jnp
        from diffsheg_tpu.audio.hubert_runner import (
            CLIP_SAMPLES, HubertFeatureExtractor, expected_frames)
        from diffsheg_tpu.models.hubert import normalize_waveform

        cfg = self._tiny_cfg()
        assert cfg.total_stride == 320 and cfg.receptive_field == 400
        ex = HubertFeatureExtractor(cfg, rng=jax.random.PRNGKey(0))

        n = CLIP_SAMPLES + 40_000  # 1.125 clips -> two chunks
        wav = jnp.asarray(np.random.RandomState(0).randn(n) * 0.1,
                          dtype=jnp.float32)
        chunked = np.asarray(ex(wav))
        assert chunked.shape[1] == expected_frames(n)

        single = np.asarray(ex.model.apply(
            ex.variables, normalize_waveform(wav[None])))
        T = min(chunked.shape[1], single.shape[1])
        # Chunks are encoded with independent attention context (the
        # reference algorithm does the same, ddpm_beat_trainer.py:1454-1460),
        # so chunked != single-pass exactly; but features must be strongly
        # consistent: high correlation and most elements near-identical.
        a, b = chunked[0, :T].ravel(), single[0, :T].ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.99, corr
        close = np.isclose(a, b, atol=1e-2).mean()
        assert close > 0.75, close

    def test_resample_to_motion_frames(self):
        import jax
        from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor
        ex = HubertFeatureExtractor(self._tiny_cfg(),
                                    rng=jax.random.PRNGKey(0))
        wav = np.random.RandomState(1).randn(64_000).astype(np.float32)
        import jax.numpy as jnp
        out = ex(jnp.asarray(wav), target_frames=60)  # 4 s @ 15 fps
        assert out.shape[:2] == (1, 60)


class TestOnsets:
    def test_click_track_onsets(self):
        """Clicks at known times must be detected within one hop."""
        from diffsheg_tpu.audio.onsets import audio_onset_times
        sr = 16000
        secs = 4.0
        y = np.zeros(int(sr * secs), dtype=np.float32)
        clicks = [0.5, 1.25, 2.0, 2.75, 3.5]
        for c in clicks:
            i = int(c * sr)
            t = np.arange(400)
            y[i:i + 400] += (np.sin(2 * np.pi * 1000 * t / sr)
                             * np.exp(-t / 80)).astype(np.float32)
        onsets = audio_onset_times(y, sr)
        assert len(onsets) >= len(clicks)
        for c in clicks:
            assert np.min(np.abs(onsets - c)) < 0.05, (c, onsets)

    def test_silence_no_onsets(self):
        from diffsheg_tpu.audio.onsets import audio_onset_times
        onsets = audio_onset_times(np.zeros(16000, dtype=np.float32), 16000)
        assert len(onsets) <= 1  # at most the trivial first frame

    def test_feeds_beat_alignment(self):
        from diffsheg_tpu.audio.onsets import audio_onset_times
        from diffsheg_tpu.eval.metrics import beat_alignment
        sr, fps = 16000, 15.0
        y = np.zeros(sr * 4, dtype=np.float32)
        for c in (1.0, 2.0, 3.0):
            i = int(c * sr)
            y[i:i + 200] = 0.8
        beats = audio_onset_times(y, sr)
        # motion with velocity dips at the same times
        T = int(4 * fps)
        vel = np.ones(T)
        for c in (1.0, 2.0, 3.0):
            vel[int(c * fps)] = 0.0
        motion = np.cumsum(vel)[:, None].repeat(3, axis=1)
        score = beat_alignment(motion, beats, fps)
        assert score > 0.5

    def test_peak_pick_librosa_window_semantics(self):
        """Hand-computed librosa.util.peak_pick oracle on a tiny envelope."""
        from diffsheg_tpu.audio.onsets import peak_pick
        env = np.array([0., 1., 0., 0., 0., 2., 1.9, 0., 0., 3.], dtype=float)
        # pre_max=1, post_max=2: max window env[i-1:i+2]
        # pre_avg=2, post_avg=3: mean window env[i-2:i+3]
        # delta=0.5, wait=2: onsets >2 frames apart
        # i=1: max(0,1,0)=1 ok; mean(0,1,0,0)=0.25 +0.5 <= 1 ok -> onset
        # i=5: max(0,2,1.9)=2 ok; mean(0,0,2,1.9,0)=0.78 +0.5 <= 2 ok; 5-1>2 -> onset
        # i=6: not the window max (2 at i=5) -> no
        # i=9: max(0,3)=3 ok; mean(0,0,3)=1.0 +0.5 <= 3 ok; 9-5>2 -> onset
        got = peak_pick(env, pre_max=1, post_max=2, pre_avg=2, post_avg=3,
                        delta=0.5, wait=2)
        np.testing.assert_array_equal(got, [1, 5, 9])

    def test_peak_pick_wait_suppresses(self):
        from diffsheg_tpu.audio.onsets import peak_pick
        env = np.array([0., 5., 0., 5., 0., 5., 0.], dtype=float)
        got = peak_pick(env, pre_max=1, post_max=2, pre_avg=1, post_avg=2,
                        delta=0.1, wait=3)
        # i=1 fires; i=3 suppressed (3-1<=3); i=5 fires (5-1>3)
        np.testing.assert_array_equal(got, [1, 5])
