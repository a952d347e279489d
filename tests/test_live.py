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
        np.testing.assert_allclose(got, offline, atol=5e-2, rtol=1e-3)

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

    def test_small_tail_at_finish_matches_offline(self):
        """T=92: windows 0,30 emitted (60 frames), final window at s=58
        with only 2 new frames inside the overlap region — pins the tail
        offset of the left-shifted finish window (regression: the head was
        pinned to the wrong slice of the previous window)."""
        cfg, gen, pid = _setup(seed=10)
        T = 92
        audio = _audio(cfg, T, seed=11)
        rng = jax.random.PRNGKey(12)
        fe = MelFrontend(sr=cfg.data.mel_sr, n_fft=2048,
                         hop=cfg.data.mel_hop, n_mels=cfg.data.n_mels)
        offline = np.asarray(StreamingGenerator(gen).generate(
            fe(jnp.asarray(audio)[None]), pid, rng))
        live = LiveSession(gen, pid, rng)
        live.push(audio)
        got = live.finish()
        assert got.shape == offline.shape
        np.testing.assert_allclose(got, offline, atol=5e-2, rtol=1e-3)

    def test_non_hop_aligned_audio_matches_offline(self):
        """Audio length T*hop + n_fft//2: the extra samples stabilize one
        more mel frame than the offline drop_last plan contains —
        regression: the live plan ran a window the offline plan excludes,
        desynchronizing windows and keys."""
        cfg, gen, pid = _setup(seed=13)
        audio = _audio(cfg, 63, seed=14)
        audio = np.concatenate([audio, np.zeros(1024, np.float32)])
        rng = jax.random.PRNGKey(15)
        fe = MelFrontend(sr=cfg.data.mel_sr, n_fft=2048,
                         hop=cfg.data.mel_hop, n_mels=cfg.data.n_mels)
        offline = np.asarray(StreamingGenerator(gen).generate(
            fe(jnp.asarray(audio)[None]), pid, rng))
        live = LiveSession(gen, pid, rng)
        live.push(audio)
        got = live.finish()
        assert got.shape == offline.shape == (1, 63, cfg.model.motion_dim)
        np.testing.assert_allclose(got, offline, atol=5e-2, rtol=1e-3)

    def test_exact_cover_tail_no_extra_window(self):
        """T == last window start + size: finish emits the already-sampled
        window's remaining overlap frames instead of sampling again."""
        cfg, gen, pid = _setup(seed=16)
        T = 94   # windows 0,30,60; 60+34 == 94
        audio = _audio(cfg, T, seed=17)
        rng = jax.random.PRNGKey(18)
        fe = MelFrontend(sr=cfg.data.mel_sr, n_fft=2048,
                         hop=cfg.data.mel_hop, n_mels=cfg.data.n_mels)
        offline = np.asarray(StreamingGenerator(gen).generate(
            fe(jnp.asarray(audio)[None]), pid, rng))
        live = LiveSession(gen, pid, rng)
        live.push(audio)
        got = live.finish()
        assert got.shape == offline.shape == (1, T, cfg.model.motion_dim)
        np.testing.assert_allclose(got, offline, atol=5e-2, rtol=1e-3)

    def test_short_session_with_hubert(self):
        """Sub-window session with hubert: target frames must follow the
        clip length, not the window size (regression: shape mismatch)."""
        import dataclasses as dc
        from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor
        from diffsheg_tpu.models.hubert import HubertConfig
        cfg = beat_config()
        cfg = cfg.replace(model=dc.replace(
            cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
            add_hubert=True, hubert_dim=32, hubert_latent_dim=16))
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(19))
        gen = WindowGenerator(cfg, variables)
        pid = jax.nn.one_hot(jnp.array([1]), cfg.model.style_dim)
        hub_fe = HubertFeatureExtractor(HubertConfig(
            hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, conv_dim=(16,) * 7))
        live = LiveSession(gen, pid, jax.random.PRNGKey(20),
                           hubert_extractor=hub_fe)
        T = 12
        n16 = int(T / cfg.data.fps * 16000)
        live.push(_audio(cfg, T, seed=21),
                  (np.random.RandomState(22).randn(n16) * .1)
                  .astype(np.float32))
        got = live.finish()
        assert got.shape == (1, T, cfg.model.motion_dim)
        assert np.isfinite(got).all()


class TestReducedWindow:
    """LiveSession.create(window_frames=...): the low-latency mode
    (PERF.md "Live-session latency"; the denoiser is length-agnostic)."""

    def test_small_window_emits_early_and_covers_clip(self):
        cfg, gen, pid = _setup(seed=8)
        del gen
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(8))
        T = 70
        audio = _audio(cfg, T, seed=9)
        sess = LiveSession.create(cfg, variables, pid,
                                  jax.random.PRNGKey(10), window_frames=12)
        assert sess.size == 12 and sess.overlap == 4  # capped config overlap

        # frames start flowing after ~12 frames of audio, not 34
        hop = cfg.data.mel_hop
        n_first = 13 * hop  # window gate: ceil past the 12-frame span
        out_early = sess.push(audio[:n_first])
        assert out_early.shape[1] > 0, "no frames after a 12-frame span"
        out_rest = sess.push(audio[n_first:])
        full = sess.finish()
        assert full.shape == (1, T, cfg.model.motion_dim)
        assert np.isfinite(full).all()
        # emitted + finish tail tile the whole clip
        assert out_early.shape[1] + out_rest.shape[1] <= T

    def test_window_frames_zero_is_default(self):
        cfg, _, pid = _setup(seed=11)
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(11))
        sess = LiveSession.create(cfg, variables, pid, jax.random.PRNGKey(12))
        assert sess.size == cfg.data.n_poses
        assert sess.overlap == cfg.stream.overlap_len

    def test_degenerate_geometry_raises(self):
        """overlap >= window means step <= 0: push() could never advance
        past its first window — create() must refuse instead of letting a
        caller (e.g. the serving daemon) spin the device forever."""
        import pytest
        cfg, _, pid = _setup(seed=13)
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(13))
        k = jax.random.PRNGKey(0)
        with pytest.raises(ValueError, match="never advance"):
            LiveSession.create(cfg, variables, pid, k,
                               window_frames=12, overlap=12)
        with pytest.raises(ValueError, match="step"):
            LiveSession.create(cfg, variables, pid, k,
                               overlap=cfg.data.n_poses)
        with pytest.raises(ValueError, match=">= 0"):
            LiveSession.create(cfg, variables, pid, k, window_frames=-3)

    def test_unbounded_mode_matches_retaining(self):
        """retain=False (bounded-memory open-ended sessions) must emit
        bit-identical motion to the default retaining session while
        holding only ~2 windows of audio; finish() returns just the
        tail frames."""
        cfg, gen, pid = _setup(seed=20)
        T = 170                               # several windows + odd tail
        audio = _audio(cfg, T, seed=21)
        a = LiveSession(gen, pid, jax.random.PRNGKey(9))
        b = LiveSession(gen, pid, jax.random.PRNGKey(9), retain=False)

        outs_a, outs_b = [], []
        chunk = len(audio) // 7
        for i in range(7):
            c = audio[i * chunk:(i + 1) * chunk]
            outs_a.append(a.push(c))
            outs_b.append(b.push(c))
        outs_a.append(a.push(audio[7 * chunk:]))
        outs_b.append(b.push(audio[7 * chunk:]))
        for x, y in zip(outs_a, outs_b):
            np.testing.assert_array_equal(x, y)

        # bounded: the streaming session holds ~(size+step) frames of
        # audio, the retaining one the whole stream
        bound = (b.size + 2 * b.step) * b.hop + b.n_fft
        assert len(b._audio) <= bound < len(a._audio)

        full = a.finish()
        tail = b.finish()
        emitted = sum(o.shape[1] for o in outs_b)
        assert full.shape == (1, T, cfg.model.motion_dim)
        np.testing.assert_array_equal(
            np.concatenate([np.concatenate(outs_b, axis=1), tail], axis=1),
            full)
        assert tail.shape[1] == T - emitted

    def test_unbounded_mode_with_hubert(self):
        """Trimming must keep the 16 kHz stream aligned with the mel
        stream: a retain=False hubert session == the retaining one."""
        import dataclasses as dc
        from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor
        from diffsheg_tpu.models.hubert import HubertConfig
        cfg = beat_config()
        cfg = cfg.replace(model=dc.replace(
            cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
            add_hubert=True, hubert_dim=32, hubert_latent_dim=16))
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(23))
        gen = WindowGenerator(cfg, variables)
        pid = jax.nn.one_hot(jnp.array([1]), cfg.model.style_dim)
        hub_fe = HubertFeatureExtractor(HubertConfig(
            hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, conv_dim=(16,) * 7))
        T = 110
        audio = _audio(cfg, T, seed=24)
        n16 = int(T / cfg.data.fps * 16000)
        audio16 = (np.random.RandomState(25).randn(n16) * .1
                   ).astype(np.float32)
        a = LiveSession(gen, pid, jax.random.PRNGKey(26),
                        hubert_extractor=hub_fe)
        b = LiveSession(gen, pid, jax.random.PRNGKey(26),
                        hubert_extractor=hub_fe, retain=False)
        outs_a, outs_b = [], []
        for i in range(3):
            sl = slice(i * len(audio) // 3, (i + 1) * len(audio) // 3)
            sl16 = slice(i * n16 // 3, (i + 1) * n16 // 3)
            outs_a.append(a.push(audio[sl], audio16[sl16]))
            outs_b.append(b.push(audio[sl], audio16[sl16]))
        for x, y in zip(outs_a, outs_b):
            np.testing.assert_array_equal(x, y)
        full, tail = a.finish(), b.finish()
        np.testing.assert_array_equal(
            np.concatenate([np.concatenate(outs_b, axis=1), tail], axis=1),
            full)
        assert len(b._audio16) < len(a._audio16)

    def test_finish_drains_windows_stalled_by_hubert_gate(self):
        """Push all mel-rate audio but a lagging 16 kHz stream: windows
        stall behind the hubert gate while mel frames accumulate.
        finish() must drain every stalled window per the offline plan
        (regression: the final-window gt_head slice silently truncated
        when the gap exceeded one step, feeding the generator a
        wrong-shaped overlap)."""
        import dataclasses as dc
        from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor
        from diffsheg_tpu.models.hubert import HubertConfig
        cfg = beat_config()
        cfg = cfg.replace(model=dc.replace(
            cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
            add_hubert=True, hubert_dim=32, hubert_latent_dim=16))
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(30))
        gen = WindowGenerator(cfg, variables)
        pid = jax.nn.one_hot(jnp.array([0]), cfg.model.style_dim)
        hub_fe = HubertFeatureExtractor(HubertConfig(
            hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, conv_dim=(16,) * 7))
        live = LiveSession(gen, pid, jax.random.PRNGKey(31),
                           hubert_extractor=hub_fe)
        T = 130                              # ~4 windows
        audio = _audio(cfg, T, seed=32)
        n16 = int(T / cfg.data.fps * 16000)
        audio16 = (np.random.RandomState(33).randn(n16) * .1
                   ).astype(np.float32)
        # full mel stream, but 16 kHz only covers the first window:
        # exactly one window emits, then > one step of frames stalls
        out = live.push(audio, audio16[:int(40 / cfg.data.fps * 16000)])
        assert out.shape[1] == live.step     # one window emitted
        got = live.finish()
        assert got.shape == (1, T, cfg.model.motion_dim)
        assert np.isfinite(got).all()

    def test_finish_drains_windows_stalled_by_span_gate(self):
        """At hop < n_fft/2 (the SHOW geometry) the analysis-span gate
        can hold the last regular window even though its frames exist;
        the drained finish must equal the offline streamer exactly."""
        import dataclasses as dc
        cfg = beat_config()
        cfg = cfg.replace(
            model=dc.replace(cfg.model, latent_dim=32, num_layers=1,
                             num_heads=2, ff_size=64, add_hubert=False),
            data=dc.replace(cfg.data, mel_sr=9000, mel_hop=600))
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(34))
        gen = WindowGenerator(cfg, variables)
        pid = jax.nn.one_hot(jnp.array([1]), cfg.model.style_dim)
        rng = jax.random.PRNGKey(35)
        # n puts frame count at exactly 2 windows' span but leaves the
        # second window short of its last frame's analysis span
        # ((end-1)*hop + n_fft/2 = end*hop + 424 at hop 600)
        T = 64                                # 34 + step 30
        n = T * 600 + 100                     # < T*600 + 424 -> stalls
        audio = (np.random.RandomState(36).randn(n) * 0.1
                 ).astype(np.float32)

        live = LiveSession(gen, pid, rng)
        live.push(audio)
        assert live._next_start == live.step  # second window stalled
        got = live.finish()

        fe = MelFrontend(sr=cfg.data.mel_sr, n_fft=2048,
                         hop=cfg.data.mel_hop, n_mels=cfg.data.n_mels)
        mel = fe(jnp.asarray(audio)[None])
        offline = np.asarray(
            StreamingGenerator(gen).generate(mel, pid, rng))
        assert got.shape == offline.shape == (1, T, cfg.model.motion_dim)
        np.testing.assert_allclose(got, offline, atol=5e-2, rtol=1e-3)

    def test_non_hubert_session_drops_16k_stream(self):
        """A hubert-oriented client may send both streams; without an
        extractor the 16 kHz audio is never read, so it must not
        accumulate (retain=False memory bound)."""
        cfg, gen, pid = _setup(seed=40)
        live = LiveSession(gen, pid, jax.random.PRNGKey(41), retain=False)
        live.push(_audio(cfg, 40, seed=42),
                  np.zeros(40 * 16000 // 15, np.float32))
        assert len(live._audio16) == 0
        assert live.buffered_seconds <= 40 / cfg.data.fps + 1e-6

    def test_mel_frontend_shared_across_sessions(self):
        """Same STFT geometry -> the SAME jitted mel program object, so a
        reconnect does not re-trace/compile the mel frontend."""
        cfg, gen, pid = _setup(seed=14)
        a = LiveSession(gen, pid, jax.random.PRNGKey(0))
        b = LiveSession(gen, pid, jax.random.PRNGKey(1))
        assert a._mel_segment is b._mel_segment
        assert a._filters is b._filters
        assert a.duration == 0.0
        a.push(_audio(cfg, 10, seed=15))
        assert a.duration > 0 and b.duration == 0.0


class TestLeftContextHubert:
    """hubert_ctx_s > 0: left-context speech features (live.py module
    docstring).  ctx chosen as a multiple of the conv stride so the
    young-stream (fully padded) case is bit-comparable."""

    def _make(self, ctx):
        import dataclasses as dc

        from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor
        from diffsheg_tpu.models.hubert import HubertConfig
        cfg = beat_config()
        cfg = cfg.replace(model=dc.replace(
            cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
            add_hubert=True, hubert_dim=16, hubert_latent_dim=8))
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(30))
        gen = WindowGenerator(cfg, variables)
        pid = jax.nn.one_hot(jnp.array([0]), cfg.model.style_dim)
        hub_fe = HubertFeatureExtractor(HubertConfig(
            hidden_size=16, num_layers=1, num_heads=2,
            intermediate_size=32, conv_dim=(8,) * 7))
        sess = LiveSession(gen, pid, jax.random.PRNGKey(31),
                           hubert_extractor=hub_fe, hubert_ctx_s=ctx)
        return cfg, sess, hub_fe

    def _push_all(self, cfg, sess, T, seed=32):
        mel_audio = _audio(cfg, T, seed=seed)
        n16 = int(T / cfg.data.fps * 16000)
        a16 = (np.random.RandomState(seed + 1).randn(n16) * .1) \
            .astype(np.float32)
        # feed buffers directly: this test probes _window_hubert, not the
        # sampler, so skip the (slow) denoiser windows push() would run
        sess._audio = mel_audio
        sess._audio16 = a16
        return a16

    def test_young_stream_equals_window_local(self):
        """First window (stream younger than ctx): the fully-left-padded
        masked encode must equal the plain window-local encode."""
        ctx = 2.0  # 32000 samples = 100 conv strides
        cfg, s_ctx, _ = self._make(ctx)
        cfg2, s_loc, _ = self._make(0.0)
        T = cfg.data.n_poses * 3
        self._push_all(cfg, s_ctx, T)
        self._push_all(cfg2, s_loc, T)
        a = np.asarray(s_ctx._window_hubert(0))
        b = np.asarray(s_loc._window_hubert(0))
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)

    def test_mid_stream_context_reduces_offline_drift(self):
        """A mid-stream window with real left context must sit closer to
        the offline whole-stream features than the window-local encode."""
        from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor
        ctx = 2.0
        cfg, s_ctx, hub_fe = self._make(ctx)
        cfg2, s_loc, _ = self._make(0.0)
        # share ONE encoder so the comparison is weights-identical
        s_loc.hubert_fe = HubertFeatureExtractor(
            hub_fe.cfg, variables=hub_fe.variables)
        T = cfg.data.n_poses * 3  # 102 frames, windows at 0/30/60...
        a16 = self._push_all(cfg, s_ctx, T)
        self._push_all(cfg2, s_loc, T)
        offline = np.asarray(hub_fe(jnp.asarray(a16), target_frames=T))[0]

        s = 60  # 4 s in: full ctx available
        size = cfg.data.n_poses
        ref = offline[s:s + size]
        scale = max(np.sqrt((ref ** 2).mean()), 1e-9)
        d_ctx = np.sqrt(((np.asarray(s_ctx._window_hubert(s))[0]
                          - ref) ** 2).mean()) / scale
        d_loc = np.sqrt(((np.asarray(s_loc._window_hubert(s))[0]
                          - ref) ** 2).mean()) / scale
        assert np.isfinite(d_ctx) and np.isfinite(d_loc)
        assert d_ctx < d_loc, (d_ctx, d_loc)
