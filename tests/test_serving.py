"""Network serving daemon: a served live session must reproduce the
in-process LiveSession exactly, survive bad clients, and bound its
concurrent-session count."""

import dataclasses
import socket
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsheg_tpu.config import beat_config
from diffsheg_tpu.sampling.live import LiveSession
from diffsheg_tpu.serving import protocol as proto
from diffsheg_tpu.serving.server import MotionClient, MotionServer


def _setup():
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser

    cfg = beat_config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
        add_hubert=False))
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))
    return cfg, variables


def _audio(cfg, frames, seed=1):
    n = frames * cfg.data.mel_hop
    return (np.random.RandomState(seed).randn(n) * 0.1).astype(np.float32)


def _open_session(host, port, retries=100):
    """Raw socket with a started session; retries while the max_sessions=1
    slot is still being released by the previous test's handler thread."""
    for _ in range(retries):
        sock = socket.create_connection((host, port), timeout=60)
        proto.send_frame(sock, {"type": "start", "speakers": [1]})
        header, _ = proto.recv_frame(sock)
        if header["type"] == "ready":
            return sock
        sock.close()
        time.sleep(0.05)
    raise AssertionError("never obtained a session slot")


def _client(host, port, retries=100, **start_kw):
    """MotionClient with a started session (same retry rationale)."""
    for _ in range(retries):
        cli = MotionClient(host, port)
        try:
            cli.start(**start_kw)
            return cli
        except RuntimeError as e:
            cli.close()
            if "max_sessions" not in str(e):
                raise
            time.sleep(0.05)
    raise AssertionError("never obtained a session slot")


@pytest.fixture(scope="module")
def server():
    cfg, variables = _setup()
    srv = MotionServer(cfg, variables, max_sessions=1,
                       client_geometry=True, log=lambda *a: None)
    srv.start_background()
    yield cfg, variables, srv.address
    srv.shutdown()


class TestServing:
    def test_served_session_matches_in_process(self, server):
        cfg, variables, (host, port) = server
        T = 70
        audio = _audio(cfg, T)

        # in-process oracle: same speaker, same seed -> same key chain
        pid = jax.nn.one_hot(jnp.array([2]), cfg.model.style_dim)
        oracle = LiveSession.create(cfg, variables, pid,
                                    jax.random.PRNGKey(7))
        oracle.push(audio)
        want = oracle.finish()

        with _client(host, port, speakers=[2], seed=7) as cli:
            info = cli.info
            assert info["channels"] == cfg.model.motion_dim
            assert info["window"] == cfg.data.n_poses
            got_parts, chunk = [], len(audio) // 5
            for i in range(5):
                got_parts.append(cli.push(audio[i * chunk:(i + 1) * chunk]))
            got_parts.append(cli.push(audio[5 * chunk:]))
            emitted = sum(p.shape[1] for p in got_parts)
            full = cli.finish()

        assert emitted > 0                      # streamed before the end
        assert full.shape == want.shape == (1, T, cfg.model.motion_dim)
        np.testing.assert_array_equal(full, want)
        # the incremental chunks are a prefix of the final motion
        inc = np.concatenate(got_parts, axis=1)
        np.testing.assert_array_equal(inc, full[:, :inc.shape[1]])

    def test_reduced_window_session(self, server):
        cfg, variables, (host, port) = server
        audio = _audio(cfg, 40, seed=9)
        with _client(host, port, speakers=[0, 3], seed=1,
                     window_frames=12) as cli:
            info = cli.info
            assert info["window"] == 12 and info["batch"] == 2
            cli.push(audio)
            full = cli.finish()
        assert full.shape == (2, 40, cfg.model.motion_dim)
        assert np.isfinite(full).all()

    def test_bad_speaker_rejected(self, server):
        cfg, _, (host, port) = server
        with pytest.raises(RuntimeError, match="speakers must be"):
            _client(host, port, speakers=[cfg.model.style_dim + 5])
        # JSON true is a Python bool — must not pass the int check
        with pytest.raises(RuntimeError, match="speakers must be"):
            _client(host, port, speakers=[True])

    def test_oversized_batch_rejected(self, server):
        """The client controls the session batch (one one-hot row per
        speaker); the server must bound it BEFORE compiling anything."""
        _, _, (host, port) = server
        with pytest.raises(RuntimeError, match="max_batch"):
            _client(host, port, speakers=[0] * 65)

    def test_unknown_message_type_errors(self, server):
        _, _, (host, port) = server
        sock = _open_session(host, port)
        try:
            proto.send_frame(sock, {"type": "frobnicate"})
            header, _ = proto.recv_frame(sock)
            assert header["type"] == "error"
            assert "frobnicate" in header["message"]
        finally:
            sock.close()

    def test_max_sessions_bound(self, server):
        _, _, (host, port) = server
        first = _open_session(host, port)
        try:
            # the single slot is held -> the second connection is refused
            second = socket.create_connection((host, port), timeout=60)
            try:
                header, _ = proto.recv_frame(second)
                assert header["type"] == "error"
                assert "max_sessions" in header["message"]
            finally:
                second.close()
        finally:
            first.close()

    def test_slot_released_after_session(self, server):
        """A failed/closed session frees its slot for the next client."""
        cfg, _, (host, port) = server
        with _client(host, port, speakers=[1], seed=0) as cli:
            cli.push(_audio(cfg, 10, seed=3))
            cli.finish()
        # server (max_sessions=1) accepts a fresh session afterwards
        with _client(host, port, speakers=[0], seed=0) as cli:
            assert cli.info["batch"] == 1

    def test_idle_session_reaped(self):
        """A client that stops sending must not hold its slot forever: the
        server reaps it after idle_timeout and the next client gets in."""
        cfg, variables = _setup()
        srv = MotionServer(cfg, variables, max_sessions=1, idle_timeout=0.3,
                           log=lambda *a: None)
        srv.start_background()
        try:
            host, port = srv.address
            silent = _open_session(host, port)
            try:
                header, _ = proto.recv_frame(silent)   # server reaps us
                assert header["type"] == "error"
                assert "idle" in header["message"]
            finally:
                silent.close()
            with _client(host, port, speakers=[0], seed=0) as cli:
                assert cli.info["batch"] == 1
        finally:
            srv.shutdown()

    def test_prewarm_compiles_ahead(self):
        """prewarm() must trace both window programs into the shared cache
        so a real client at that batch size reuses them."""
        cfg, variables = _setup()
        srv = MotionServer(cfg, variables, max_sessions=1,
                           log=lambda *a: None)
        srv.start_background()
        try:
            srv.prewarm((2,))
            assert len(srv._gens) == 1
            host, port = srv.address
            with _client(host, port, speakers=[1, 3], seed=2) as cli:
                cli.push(_audio(cfg, 40, seed=4))
                full = cli.finish()
            assert full.shape[0] == 2 and np.isfinite(full).all()
            assert len(srv._gens) == 1       # reused, not rebuilt
        finally:
            srv.shutdown()

    def test_window_generators_shared_across_sessions(self):
        """Reconnecting with the same geometry must reuse the compiled
        WindowGenerator (no per-connection recompile / weight copy)."""
        cfg, variables = _setup()
        srv = MotionServer(cfg, variables, max_sessions=1,
                           client_geometry=True, log=lambda *a: None)
        srv.start_background()
        try:
            host, port = srv.address
            for _ in range(2):                       # two full connections
                with _client(host, port, speakers=[1], seed=0) as cli:
                    cli.finish()                     # empty session is fine
            assert len(srv._gens) == 1
            first = next(iter(srv._gens.values()))
            with _client(host, port, speakers=[2], seed=5,
                         window_frames=12) as cli:   # new geometry -> new gen
                cli.finish()
            assert len(srv._gens) == 2
            assert next(iter(srv._gens.values())) is first
        finally:
            srv.shutdown()


class TestHardening:
    def test_client_geometry_refused_by_default(self):
        """A server NOT opted into client geometry must refuse custom
        window_frames/overlap — each novel geometry is a fresh XLA
        compile, so an open server must not let the network mint them."""
        cfg, variables = _setup()
        srv = MotionServer(cfg, variables, max_sessions=1,
                           log=lambda *a: None)
        srv.start_background()
        try:
            host, port = srv.address
            with pytest.raises(RuntimeError, match="default window"):
                _client(host, port, speakers=[0], window_frames=12)
            # the default geometry still serves
            with _client(host, port, speakers=[0], seed=0) as cli:
                assert cli.info["window"] == cfg.data.n_poses
        finally:
            srv.shutdown()

    def test_degenerate_geometry_rejected(self, server):
        """overlap >= window makes the session step <= 0 — push() would
        spin forever on the device; the server must refuse at start."""
        _, _, (host, port) = server
        with pytest.raises(RuntimeError, match="never advance|step"):
            _client(host, port, speakers=[0], window_frames=12, overlap=12)
        with pytest.raises(RuntimeError, match="must be ints"):
            _client(host, port, speakers=[0], window_frames=10 ** 9)

    def test_stream_length_capped(self):
        """A session retains its full stream until finish(); the server
        bounds it so one client cannot grow the daemon to OOM."""
        cfg, variables = _setup()
        srv = MotionServer(cfg, variables, max_sessions=1,
                           max_stream_seconds=0.5, log=lambda *a: None)
        srv.start_background()
        try:
            host, port = srv.address
            cli = MotionClient(host, port)
            try:
                cli.start(speakers=[0])
                with pytest.raises(RuntimeError,
                                   match="max_stream_seconds"):
                    # 1 s of mel-rate audio > the 0.5 s cap
                    cli.push(np.zeros(cfg.data.mel_sr, np.float32))
            finally:
                cli.close()
        finally:
            srv.shutdown()

    def test_unbounded_session_waives_stream_cap(self):
        """retain=False sessions are bounded-memory by construction, so
        the max_stream_seconds cap must not apply — and 'done' carries
        only the tail frames (everything else was already streamed)."""
        cfg, variables = _setup()
        srv = MotionServer(cfg, variables, max_sessions=1,
                           max_stream_seconds=2.0, log=lambda *a: None)
        srv.start_background()
        try:
            host, port = srv.address
            T = 70
            audio = _audio(cfg, T, seed=11)     # 70 frames ≈ 4.7 s > cap

            pid = jax.nn.one_hot(jnp.array([2]), cfg.model.style_dim)
            oracle = LiveSession.create(cfg, variables, pid,
                                        jax.random.PRNGKey(5))
            oracle.push(audio)
            want = oracle.finish()

            with _client(host, port, speakers=[2], seed=5,
                         retain=False) as cli:
                parts = [cli.push(audio[i * len(audio) // 4:
                                        (i + 1) * len(audio) // 4])
                         for i in range(4)]
                tail = cli.finish()
            got = np.concatenate(parts + [tail], axis=1)
            np.testing.assert_array_equal(got, want)
            emitted = sum(p.shape[1] for p in parts)
            assert tail.shape[1] == T - emitted < T
        finally:
            srv.shutdown()

    def test_stalled_unbounded_session_backlog_capped(self):
        """retain=False is only bounded while windows consume the audio; a
        session stalled behind the 16 kHz gate (mel pushed, no 16 kHz)
        accumulates backlog — the server must bound that instead of
        letting the waived cap become an OOM vector."""
        import dataclasses
        from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor
        from diffsheg_tpu.models.hubert import HubertConfig
        from diffsheg_tpu.models.unidiffuser import init_unidiffuser

        cfg = beat_config()
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
            add_hubert=True, hubert_dim=32, hubert_latent_dim=16))
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(1))
        hub_fe = HubertFeatureExtractor(HubertConfig(
            hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, conv_dim=(16,) * 7))
        srv = MotionServer(cfg, variables, hubert_extractor=hub_fe,
                           max_sessions=1, max_stream_seconds=3.0,
                           log=lambda *a: None)
        srv.start_background()
        try:
            host, port = srv.address
            cli = MotionClient(host, port)
            try:
                cli.start(speakers=[0], retain=False)
                with pytest.raises(RuntimeError, match="backlog"):
                    # allowance = ~2 windows (6.3 s) + cap (3 s); 12 s of
                    # mel with no 16 kHz must trip it
                    for _ in range(12):
                        cli.push(np.zeros(cfg.data.mel_sr, np.float32))
            finally:
                cli.close()
        finally:
            srv.shutdown(drain_seconds=0.1)

    def test_shutdown_waits_for_active_sessions(self):
        """shutdown() gives in-flight sessions a bounded grace period
        (handler threads are daemons — an immediate close would kill them
        mid-frame at process exit) and returns once they finish or the
        deadline passes."""
        import time as _time
        cfg, variables = _setup()
        srv = MotionServer(cfg, variables, max_sessions=1,
                           log=lambda *a: None)
        srv.start_background()
        sock = _open_session(srv.address[0], srv.address[1])
        try:
            t0 = _time.monotonic()
            srv.shutdown(drain_seconds=0.4)   # session held open -> grace
            waited = _time.monotonic() - t0
            assert 0.35 <= waited < 5.0
        finally:
            sock.close()
        # with no sessions the grace period is skipped
        srv2 = MotionServer(cfg, variables, max_sessions=1,
                            log=lambda *a: None)
        srv2.start_background()
        t0 = _time.monotonic()
        srv2.shutdown(drain_seconds=2.0)
        assert _time.monotonic() - t0 < 1.0

    def test_geometry_cache_bounded(self):
        """Client-minted geometries must not grow the compile cache without
        bound; prewarmed keys survive eviction."""
        cfg, variables = _setup()
        srv = MotionServer(cfg, variables, max_sessions=1,
                           client_geometry=True, max_cached_geometries=2,
                           log=lambda *a: None)
        srv.start_background()
        try:
            srv.prewarm((1,))
            pinned_key = next(iter(srv._gens))
            host, port = srv.address
            for wf in (10, 12, 14):
                with _client(host, port, speakers=[0],
                             window_frames=wf) as cli:
                    cli.finish()
            assert len(srv._gens) <= 3       # cap + the one just used
            assert pinned_key in srv._gens   # prewarmed key never evicted
        finally:
            srv.shutdown()


class TestProtocol:
    def test_motion_roundtrip(self):
        m = np.random.RandomState(0).randn(2, 5, 7).astype(np.float32)
        h, p = proto.pack_motion(m)
        np.testing.assert_array_equal(proto.unpack_motion(h, p), m)

    def test_audio_roundtrip(self):
        a = np.random.RandomState(1).randn(100).astype(np.float32)
        b = np.random.RandomState(2).randn(89).astype(np.float32)
        h, p = proto.pack_audio(a, b)
        ga, gb = proto.unpack_audio(h, p)
        np.testing.assert_array_equal(ga, a)
        np.testing.assert_array_equal(gb, b)
        h, p = proto.pack_audio(a)
        ga, gb = proto.unpack_audio(h, p)
        np.testing.assert_array_equal(ga, a)
        assert gb is None

    def test_corrupt_payload_rejected(self):
        with pytest.raises(proto.ProtocolError):
            proto.unpack_motion({"batch": 1, "frames": 3, "channels": 2},
                                b"\x00" * 7)
        with pytest.raises(proto.ProtocolError):
            proto.unpack_audio({"n": 10, "n16": 0}, b"\x00" * 8)
