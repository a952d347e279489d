"""Streaming speech-to-motion serving daemon.

The reference has no serving story — its inference surface is batch CLI
scripts (trainers/ddpm_beat_trainer.py:1123-1346).  This daemon wraps
:class:`diffsheg_tpu.sampling.live.LiveSession` in a threaded TCP server:
one connection = one live session; the client pushes captured audio
chunks and receives motion frames as each window becomes stable, with the
same numerics as the in-process session (and therefore, at full window
size, as the offline sampler — tests/test_live.py).

Protocol (framing in :mod:`diffsheg_tpu.serving.protocol`):

  client -> {"type": "start", "speakers": [1,3], "seed": 0,
             "window_frames": 0, "overlap": 0, "retain": true}
  server -> {"type": "ready", "batch": B, "channels": C,
             "window": n_poses, "fps": fps, "sr": mel_sr,
             "hubert": bool}
  client -> {"type": "audio", "n": .., "n16": ..} + f32 payload   (repeat)
  server -> {"type": "motion", ...} + f32 (B,T,C) payload  (T may be 0)
  client -> {"type": "finish"}
  server -> {"type": "done", ...} + f32 full-session motion payload

Any server-side failure answers {"type": "error", "message": ...} and
closes the connection; other sessions are unaffected.

Concurrency: sessions are independent (per-connection LiveSession state;
XLA serializes device dispatches).  Resource bounds against misbehaving
clients: ``max_sessions`` caps concurrent connections,
``max_stream_seconds`` caps per-session memory (a live session retains
its stream until finish()), and custom window geometries — each one a
fresh XLA compile — are refused unless the operator opts in with
``client_geometry`` (and even then the generator cache is bounded by
``max_cached_geometries``).
"""

from __future__ import annotations

import socket
import socketserver
import threading
import time
from typing import Optional

import numpy as np

from diffsheg_tpu.serving import protocol as proto


class MotionServer:
    """Own the model/config and serve live sessions over TCP.

    ``max_sessions`` bounds concurrent connections, ``max_batch`` bounds the
    per-session speaker count (= device batch), and ``idle_timeout`` reaps
    connections that stop sending (a silently-dead client would otherwise
    hold its session slot forever).  Compiled window generators are cached
    per (window_frames, overlap) and shared across sessions — the sampler
    is pure (RePaint tails are threaded through arguments), so a reconnect
    with the same geometry skips the multi-second XLA compile and reuses
    the already-cast weights.
    """

    def __init__(self, cfg, variables, hubert_extractor=None,
                 host: str = "127.0.0.1", port: int = 0,
                 max_sessions: int = 8, max_batch: int = 64,
                 idle_timeout: float = 600.0,
                 client_geometry: bool = False,
                 max_cached_geometries: int = 8,
                 max_stream_seconds: float = 3600.0, log=print):
        self.cfg = cfg
        self.variables = variables
        self.hubert_fe = hubert_extractor
        self.max_batch = max_batch
        self.idle_timeout = idle_timeout
        # Clients may request a custom (window_frames, overlap) only when
        # the operator opts in: each novel geometry is a full generator
        # build + multi-second XLA compile, so an open server must not let
        # the network mint them.
        self.client_geometry = client_geometry
        self.max_cached_geometries = max_cached_geometries
        self.max_stream_seconds = max_stream_seconds
        self.log = log
        self._slots = threading.BoundedSemaphore(max_sessions)
        self._active = 0                   # live handler threads
        self._active_lock = threading.Lock()
        self._gens: dict = {}              # (window, overlap) -> generator
        self._pinned: set = set()          # prewarmed keys, never evicted
        self._gens_lock = threading.Lock()
        outer = self

        class _Handler(socketserver.BaseRequestHandler):
            def handle(self):                  # pragma: no cover - thin shim
                outer._handle(self.request)

        class _Server(socketserver.ThreadingTCPServer):
            daemon_threads = True
            allow_reuse_address = True

        self._server = _Server((host, port), _Handler)

    # -- lifecycle -----------------------------------------------------------
    @property
    def address(self):
        """(host, port) actually bound (port=0 picks a free one)."""
        return self._server.server_address

    def serve_forever(self):
        self.log(f"[serve] listening on {self.address[0]}:{self.address[1]}")
        self._server.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self, drain_seconds: float = 5.0):
        """Stop accepting, then give in-flight sessions a bounded grace
        period (handler threads are daemons — without the wait they die
        mid-frame at process exit)."""
        self._server.shutdown()
        deadline = time.monotonic() + drain_seconds
        while time.monotonic() < deadline:
            with self._active_lock:
                if self._active == 0:
                    break
            time.sleep(0.05)
        with self._active_lock:
            if self._active:
                self.log(f"[serve] {self._active} session(s) still active "
                         f"after {drain_seconds:g}s grace, closing anyway")
        self._server.server_close()

    def prewarm(self, batch_sizes=(1,), window_frames: int = 0,
                overlap: int = 0) -> None:
        """Compile the serving programs BEFORE accepting clients.

        Runs a silent two-window synthetic session per batch size, which
        traces both window programs (the plain first window and the
        RePaint continuation) into the shared generator cache — so the
        first real client at one of these batch sizes skips the
        multi-second first-call XLA compile entirely.
        """
        import jax

        from diffsheg_tpu.sampling.live import LiveSession

        for b in batch_sizes:
            pid = jax.nn.one_hot(np.zeros((b,), np.int32),
                                 self.cfg.model.style_dim)
            with self._gens_lock:
                s = LiveSession.create(
                    self.cfg, self.variables, pid, jax.random.PRNGKey(0),
                    window_frames=window_frames, overlap=overlap,
                    hubert_extractor=self.hubert_fe, gen_cache=self._gens)
                self._pinned.add((s.size, s.overlap))
            frames = s.size + s.step          # two windows' worth
            a16 = (np.zeros(int(np.ceil(frames / s.fps * 16000)), np.float32)
                   if self.hubert_fe is not None else None)
            out = s.push(np.zeros((frames + 1) * s.hop, np.float32), a16)
            self.log(f"[serve] prewarmed batch={b} "
                     f"(window {s.size}, {out.shape[1]} frames traced)")

    def _evict_geometries(self, just_used) -> None:
        """Bound the generator cache (caller holds ``_gens_lock``).

        Client-minted geometries are evicted FIFO past
        ``max_cached_geometries``; prewarmed keys and the one just used are
        kept.  Sessions already running on an evicted generator keep their
        own reference — eviction only forfeits cache reuse."""
        keep = self._pinned | {just_used}
        evictable = [k for k in self._gens if k not in keep]
        while evictable and len(self._gens) > self.max_cached_geometries:
            dropped = evictable.pop(0)
            del self._gens[dropped]
            self.log(f"[serve] evicted cached geometry {dropped}")

    # -- one connection = one session -----------------------------------------
    def _handle(self, sock: socket.socket) -> None:
        if not self._slots.acquire(blocking=False):
            # Drain the client's pending start frame BEFORE replying:
            # closing with unread data in the receive buffer makes the
            # kernel send RST, which would discard the queued error frame
            # on the client side (it would see ConnectionResetError
            # instead of the retryable "max_sessions" message).
            try:
                sock.settimeout(2.0)
                proto.recv_frame(sock)
            except (OSError, proto.ProtocolError):
                pass
            try:
                proto.send_frame(sock, {"type": "error",
                                        "message": "server at max_sessions"})
            except OSError:
                pass
            return
        with self._active_lock:
            self._active += 1
        try:
            sock.settimeout(self.idle_timeout)
            self._session_loop(sock)
        except TimeoutError:
            try:
                proto.send_frame(sock, {
                    "type": "error",
                    "message": f"idle for {self.idle_timeout}s, "
                               "closing session"})
            except OSError:
                pass
            self.log("[serve] reaped idle session")
        except proto.ProtocolError as e:
            self.log(f"[serve] protocol error: {e}")
        except Exception as e:  # noqa: BLE001 — report, don't kill the server
            try:
                proto.send_frame(sock, {"type": "error", "message": str(e)})
            except OSError:
                pass
            self.log(f"[serve] session failed: {type(e).__name__}: {e}")
        finally:
            with self._active_lock:
                self._active -= 1
            self._slots.release()

    def _session_loop(self, sock: socket.socket) -> None:
        import jax

        from diffsheg_tpu.sampling.live import LiveSession

        header, _ = proto.recv_frame(sock)
        if header.get("type") != "start":
            proto.send_frame(sock, {
                "type": "error",
                "message": f"expected start, got {header.get('type')!r}"})
            return
        cfg = self.cfg
        speakers = header.get("speakers", [0])
        if not isinstance(speakers, list) or not speakers or any(
                not isinstance(s, int) or isinstance(s, bool)
                or not 0 <= s < cfg.model.style_dim for s in speakers):
            proto.send_frame(sock, {
                "type": "error",
                "message": f"speakers must be ints in [0, "
                           f"{cfg.model.style_dim}), got {speakers!r}"})
            return
        if len(speakers) > self.max_batch:
            proto.send_frame(sock, {
                "type": "error",
                "message": f"{len(speakers)} speakers exceeds the server's "
                           f"max_batch={self.max_batch}"})
            return
        wf, ov = header.get("window_frames", 0), header.get("overlap", 0)
        if not all(isinstance(v, int) and not isinstance(v, bool)
                   and 0 <= v <= 4 * cfg.data.n_poses for v in (wf, ov)):
            proto.send_frame(sock, {
                "type": "error",
                "message": f"window_frames/overlap must be ints in "
                           f"[0, {4 * cfg.data.n_poses}], got "
                           f"({wf!r}, {ov!r})"})
            return
        if (wf, ov) != (0, 0) and not self.client_geometry:
            proto.send_frame(sock, {
                "type": "error",
                "message": "this server only serves its default window "
                           "geometry (start with window_frames=0, "
                           "overlap=0); run it with client_geometry "
                           "enabled (cli serve --client-geometry) to "
                           "accept custom windows"})
            return
        # retain=False opts a session into bounded-memory streaming:
        # consumed audio is trimmed, "motion" frames are the only copy
        # (the final "done" payload carries just the tail), and the
        # max_stream_seconds cap is waived — memory no longer grows with
        # stream length, so open-ended sessions are safe.
        retain = header.get("retain", True)
        if not isinstance(retain, bool):
            proto.send_frame(sock, {
                "type": "error",
                "message": f"retain must be a bool, got {retain!r}"})
            return
        pid = jax.nn.one_hot(np.asarray(speakers), cfg.model.style_dim)
        try:
            with self._gens_lock:
                session = LiveSession.create(
                    cfg, self.variables, pid,
                    jax.random.PRNGKey(int(header.get("seed", 0))),
                    window_frames=wf, overlap=ov,
                    hubert_extractor=self.hubert_fe,
                    gen_cache=self._gens, retain=retain,
                )
                self._evict_geometries((session.size, session.overlap))
        except ValueError as e:      # degenerate geometry (step <= 0, ...)
            proto.send_frame(sock, {"type": "error", "message": str(e)})
            return
        proto.send_frame(sock, {
            "type": "ready", "batch": len(speakers),
            "channels": int(_channels(cfg)),
            "window": session.size, "fps": cfg.data.fps,
            "sr": cfg.data.mel_sr,
            "hubert": self.hubert_fe is not None,
        })

        while True:
            header, payload = proto.recv_frame(sock)
            kind = header.get("type")
            if kind == "audio":
                a, a16 = proto.unpack_audio(header, payload)
                secs = a.size / session.sr
                if session.retain:
                    # a retaining session holds its full stream + motion
                    # until finish(); an unbounded one would grow until
                    # the daemon OOMs under every other session
                    over = (session.duration + secs
                            > self.max_stream_seconds)
                    why = (f"stream exceeds this server's "
                           f"max_stream_seconds="
                           f"{self.max_stream_seconds:g}; finish and "
                           "start a new session (or start with "
                           '"retain": false for open-ended streaming)')
                else:
                    # retain=False is bounded only while windows actually
                    # consume the audio; a stalled session (e.g. mel
                    # pushed without its 16 kHz stream) accumulates
                    # backlog instead — bound that, on top of the ~2
                    # windows a healthy session legitimately buffers
                    allowance = ((session.size + 2 * session.step)
                                 / self.cfg.data.fps
                                 + self.max_stream_seconds)
                    over = session.buffered_seconds + secs > allowance
                    why = (f"unconsumed audio backlog exceeds "
                           f"{allowance:.0f}s (live window buffer + "
                           f"max_stream_seconds="
                           f"{self.max_stream_seconds:g}) — the session "
                           "is stalled (16 kHz stream lagging the "
                           "mel-rate stream?)")
                if over:
                    proto.send_frame(sock, {"type": "error",
                                            "message": why})
                    return
                out = session.push(a, a16)
                mh, mp = proto.pack_motion(out)
                proto.send_frame(sock, {"type": "motion", **mh}, mp)
            elif kind == "finish":
                out = session.finish()
                mh, mp = proto.pack_motion(out)
                proto.send_frame(sock, {"type": "done", **mh}, mp)
                return
            else:
                proto.send_frame(sock, {
                    "type": "error",
                    "message": f"unknown message type {kind!r}"})
                return


def _channels(cfg) -> int:
    from diffsheg_tpu.models.factory import denoised_channels
    return denoised_channels(cfg.model)


class MotionClient:
    """Blocking client for :class:`MotionServer` (also the test harness)."""

    def __init__(self, host: str, port: int, timeout: float = 600.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self.info: Optional[dict] = None

    def start(self, speakers, seed: int = 0, window_frames: int = 0,
              overlap: int = 0, retain: bool = True) -> dict:
        """``retain=False`` = bounded-memory open-ended session: the
        server streams each motion frame exactly once and the final
        "done" payload carries only the tail (and the server's
        max_stream_seconds cap is waived)."""
        proto.send_frame(self._sock, {
            "type": "start", "speakers": list(speakers), "seed": seed,
            "window_frames": window_frames, "overlap": overlap,
            "retain": retain})
        header, _ = proto.recv_frame(self._sock)
        if header.get("type") != "ready":
            raise RuntimeError(f"server refused session: {header}")
        self.info = header
        return header

    def push(self, samples: np.ndarray,
             samples_16k: Optional[np.ndarray] = None) -> np.ndarray:
        h, p = proto.pack_audio(samples, samples_16k)
        proto.send_frame(self._sock, h, p)
        header, payload = proto.recv_frame(self._sock)
        if header.get("type") != "motion":
            raise RuntimeError(f"push failed: {header}")
        return proto.unpack_motion(header, payload)

    def finish(self) -> np.ndarray:
        proto.send_frame(self._sock, {"type": "finish"})
        header, payload = proto.recv_frame(self._sock)
        if header.get("type") != "done":
            raise RuntimeError(f"finish failed: {header}")
        return proto.unpack_motion(header, payload)

    def close(self):
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
