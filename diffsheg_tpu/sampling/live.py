"""Live streaming speech-to-motion session.

The reference (and the offline CLI here) processes complete audio files
(trainers/ddpm_beat_trainer.py:1123-1346).  The model itself is causal at
window granularity — each 34-frame window depends only on its own audio
span and the previous window's tail via RePaint — so generation can run
WHILE audio arrives.  ``LiveSession`` exposes that: push waveform chunks
as they are captured, pull motion frames as windows complete.

Latency characteristics (BEAT config, one v5e chip, steady state): a
window covers ``step/fps`` = 2.0 s of motion and costs ~70 ms to denoise
(27 ms dispatch + ~40 ms compute), so the session sustains real time with
~2.3 s algorithmic latency (one window of lookahead) + ~0.1 s compute.

Fixed compiled signatures (nothing recompiles as audio grows):
  - mel: each window's frames come from a FIXED-length segment of the
    head-padded waveform — frame t of a centered STFT reads exactly
    ``padded[t*hop : t*hop + n_fft]``, so per-window mel equals the
    offline frontend's values bit-for-bit away from the sequence end;
  - HuBERT: window-local context (the window's own time span), one static
    shape.  This DIFFERS from the offline chunker, which attends over
    20 s clips (audio/hubert_runner.py) — a documented live-mode
    approximation; quality-critical offline use should batch-process.
    ``hubert_ctx_s > 0`` shrinks the gap: each window's encode prepends
    that many seconds of already-captured audio (left context is always
    available live) and slices the window's frames back out via the
    encoder's frame mask — still ONE static compile signature
    (left-zero-padded + masked while the stream is young).
  - sampler: the same compiled window programs the offline streamer uses
    (plain first window, RePaint continuation windows), same per-window
    key chain, so a session and the offline host-loop path walk identical
    programs.

``finish()`` drains the tail with the reference's left-shifted final
window (streamer.window_starts semantics) using the offline mel frontend
for the end-padding-dependent frames.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffsheg_tpu.audio.mel import hann_window, mel_filterbank, stft_magsq
from diffsheg_tpu.models.factory import denoised_channels
from diffsheg_tpu.sampling.generator import WindowGenerator


@functools.lru_cache(maxsize=8)
def _mel_frontend(sr: int, n_fft: int, hop: int, n_mels: int):
    """Shared (window, filterbank, jitted mel) keyed by STFT geometry.

    Hoisted out of the session so a reconnect does NOT re-trace the mel
    program: ``@jax.jit`` caches per function object, and a per-session
    closure is a new function object every time — with this cache every
    session with the same geometry reuses one compiled executable (and one
    device-resident filterbank)."""
    window = jnp.asarray(hann_window(n_fft))
    filters = jnp.asarray(mel_filterbank(sr, n_fft, n_mels).T)

    @jax.jit
    def mel_segment(seg):
        power = stft_magsq(seg[None], n_fft, hop, window, center=False)
        return power @ filters                # (1, frames, n_mels)

    return window, filters, mel_segment


class LiveSession:
    """One incremental generation session (one audio stream, B styles).

    Args:
      gen: compiled window generator (owns model + schedule + config).
      person_id: (B, style_dim) speaker one-hot(s).
      rng: session key; the per-window key chain matches the offline
        streamer, so a fully-pushed session reproduces offline sampling.
      hubert_extractor: optional HubertFeatureExtractor for speech
        features (window-local context in live mode).
    """

    @classmethod
    def create(cls, cfg, variables, person_id: jax.Array, rng: jax.Array,
               window_frames: int = 0, overlap: int = 0,
               hubert_extractor=None, gen_cache: Optional[dict] = None,
               retain: bool = True,
               hubert_ctx_s: float = 0.0) -> "LiveSession":
        """Build a session, optionally at a REDUCED live window size.

        The denoiser is window-length-agnostic (attention + per-frame
        conditioning over T with sinusoidal positions), so inference may run
        shorter windows than training.  The live lookahead is one window of
        audio (``window/fps``); shrinking ``window_frames`` cuts it
        proportionally — at 15 fps the default 34-frame window means 2.27 s
        lookahead, a 12-frame window 0.8 s — at some quality cost (less
        audio context per window, more RePaint seams).  The measured
        latency/quality frontier lives in PERF.md ("Live-session latency");
        ``examples/live_latency.py`` reproduces it.

        ``overlap`` overrides the RePaint overlap (default: keep the
        config's; capped at window_frames//2 so a small window still has
        fresh frames).

        ``gen_cache`` (a plain dict the caller owns) shares compiled
        :class:`WindowGenerator` instances across sessions keyed by the
        resulting (n_poses, overlap_len): ``generate`` is pure — all
        session state (RePaint tails, rng) is threaded through arguments —
        so reusing one skips the per-session XLA compile and weight cast.
        The serving daemon passes its per-server cache here.

        ``retain=False`` makes the session bounded-memory for open-ended
        streams: consumed audio is trimmed, emitted motion is not
        accumulated, and ``finish()`` returns only the tail frames — see
        the ``__init__`` notes.  Emitted motion is identical either way.
        """
        import dataclasses as _dc
        if window_frames < 0 or overlap < 0:
            raise ValueError(
                f"window_frames={window_frames}, overlap={overlap}: "
                "both must be >= 0 (0 = keep the config's value)")
        if window_frames:
            ov = overlap or min(cfg.stream.overlap_len, window_frames // 2)
            if ov >= window_frames:
                raise ValueError(
                    f"overlap={ov} >= window_frames={window_frames}: the "
                    "window step (window - overlap) must be >= 1 or the "
                    "session can never advance")
            cfg = cfg.replace(
                data=_dc.replace(cfg.data, n_poses=window_frames),
                stream=_dc.replace(cfg.stream, overlap_len=ov),
            )
        elif overlap:
            if overlap >= cfg.data.n_poses:
                raise ValueError(
                    f"overlap={overlap} >= window size {cfg.data.n_poses}: "
                    "the window step (window - overlap) must be >= 1")
            cfg = cfg.replace(
                stream=_dc.replace(cfg.stream, overlap_len=overlap))
        key = (cfg.data.n_poses, cfg.stream.overlap_len)
        if gen_cache is not None and key in gen_cache:
            gen = gen_cache[key]
        else:
            gen = WindowGenerator(cfg, variables)
            if gen_cache is not None:
                gen_cache[key] = gen
        return cls(gen, person_id, rng, hubert_extractor=hubert_extractor,
                   retain=retain, hubert_ctx_s=hubert_ctx_s)

    def __init__(self, gen: WindowGenerator, person_id: jax.Array,
                 rng: jax.Array, hubert_extractor=None, retain: bool = True,
                 hubert_ctx_s: float = 0.0):
        cfg = gen.cfg
        self.gen = gen
        self.cfg = cfg
        self.pid = person_id
        self.rng = rng
        self.hubert_fe = hubert_extractor

        d = cfg.data
        self.size = d.n_poses
        self.step = self.size - cfg.stream.overlap_len
        self.overlap = cfg.stream.overlap_len
        self.sr = d.mel_sr
        self.hop = d.mel_hop
        self.n_fft = 2048
        self.fps = d.fps

        # retain=True (default): keep the full stream + every emitted
        # motion chunk so finish() can return the whole session — memory
        # grows with stream length.  retain=False: bounded-memory mode for
        # open-ended sessions — consumed audio is trimmed to the ~2
        # windows future windows still read, motion is emitted once from
        # push() and not accumulated, and finish() returns ONLY the tail
        # frames it drains.  Emitted motion is identical in both modes.
        # In retain=False mode, keep the 16 kHz stream pushed in step with
        # the mel-rate stream (trimming assumes aligned clocks).
        self.retain = retain
        self._audio = np.zeros(0, dtype=np.float32)      # mel-rate samples
        self._audio16 = np.zeros(0, dtype=np.float32)    # 16 kHz samples
        self._base = 0        # mel-rate samples trimmed (hop-aligned)
        self._base16 = 0      # 16 kHz samples trimmed
        self._chunks: List[np.ndarray] = []              # emitted motion
        self._emitted = 0                                # frames emitted
        self._next_start = 0                             # next window start
        self._prev_out: Optional[jax.Array] = None
        self._prev_tails = None                          # same_overlap_noisy
        self._finished = False

        self._window, self._filters, self._mel_segment = _mel_frontend(
            self.sr, self.n_fft, self.hop, d.n_mels)
        self._seg_len = (self.size - 1) * self.hop + self.n_fft

        # hubert_ctx_s > 0: LEFT-CONTEXT speech features — each window's
        # HuBERT encode prepends up to ctx seconds of already-captured
        # audio (always available live; audio after the window never is)
        # and slices the window's frames back out via the encoder's frame
        # mask, shrinking the window-local approximation's drift from the
        # offline whole-stream chunker.  One static compile signature:
        # the segment is left-zero-padded to ctx+window samples while the
        # stream is younger than ctx, normalization runs over the real
        # samples only, and frames whose receptive field touches the pad
        # are masked off.
        self._hub_ctx = int(round(hubert_ctx_s * 16000))
        if self.hubert_fe is not None and self._hub_ctx > 0:
            from diffsheg_tpu.audio.hubert_runner import (STRIDE,
                                                          expected_frames,
                                                          linear_resample)
            # Round the context down to a whole number of encoder strides:
            # with a fractional-stride ctx, a fully-padded young stream has
            # first_valid = ceil(ctx/STRIDE) > f0 = ctx//STRIDE, so the
            # first emitted frame would be a masked (zeroed) one — one
            # degenerate frame per window early in the session.
            self._hub_ctx = (self._hub_ctx // STRIDE) * STRIDE
            n_win = int(self.size / self.fps * 16000)
            ext_len = self._hub_ctx + n_win
            ext_frames = expected_frames(ext_len)
            f0 = self._hub_ctx // STRIDE
            want = expected_frames(n_win)
            model = self.hubert_fe.model
            variables = self.hubert_fe.variables
            out_frames = self.size
            self._hub_n_win = n_win
            self._hub_ext_len = ext_len

            @jax.jit
            def encode_ctx(seg, pad_left):
                # masked normalization over the real samples
                idx = jnp.arange(ext_len)
                valid = (idx >= pad_left).astype(jnp.float32)
                n_valid = jnp.maximum(ext_len - pad_left, 1).astype(
                    jnp.float32)
                mean = (seg * valid).sum() / n_valid
                var = (((seg - mean) * valid) ** 2).sum() / n_valid
                segn = (seg - mean) * jax.lax.rsqrt(var + 1e-7) * valid
                first_valid = -(-pad_left // STRIDE)  # RF clear of the pad
                mask = jnp.arange(ext_frames)[None, :] >= first_valid
                feats = model.apply(variables, segn[None], mask)
                return linear_resample(feats[:, f0:f0 + want], out_frames)

            self._encode_ctx = encode_ctx

    # -- audio bookkeeping -------------------------------------------------
    @property
    def duration(self) -> float:
        """Seconds of audio pushed so far (what a server bounds to cap a
        *retaining* session's memory; a ``retain=False`` session is
        bounded by construction — see ``buffered_seconds``)."""
        return (self._base + len(self._audio)) / self.sr

    @property
    def buffered_seconds(self) -> float:
        """Seconds of audio currently HELD: the unconsumed backlog.  In
        retain=False mode this stays ~2 windows while windows run, but
        grows when they stall (e.g. the 16 kHz stream lagging the mel
        stream) — the quantity a server bounds for that mode."""
        return max(len(self._audio) / self.sr,
                   len(self._audio16) / 16000.0)

    def _trim(self) -> None:
        """retain=False: drop audio no future window reads.

        Future regular windows start at ``_next_start``; the finish()
        left-shifted final window starts at ``T - size`` which is provably
        > ``_next_start - step``.  So samples before
        ``(_next_start - step)*hop - pad`` are dead — aligned down to a
        hop boundary so the trimmed stream's centered-STFT frames stay on
        the offline frame grid (``_offline_mel``)."""
        if self.retain:
            return
        pad = self.n_fft // 2
        keep = max(0, (self._next_start - self.step) * self.hop - pad)
        keep = (keep // self.hop) * self.hop
        if keep > self._base:
            self._audio = self._audio[keep - self._base:]
            self._base = keep
        if self.hubert_fe is not None:
            keep16 = int((self._next_start - self.step) / self.fps * 16000)
            # left-context mode reads ctx seconds before the window
            keep16 = max(0, keep16 - self._hub_ctx)
            if keep16 > self._base16:
                self._audio16 = self._audio16[keep16 - self._base16:]
                self._base16 = keep16

    def _window_ready(self, s: int) -> bool:
        """Window [s, s+size) may run only when (a) the offline frame plan
        would contain it — frame count T = n//hop (drop_last) satisfies
        T >= s+size, so the live window set is always a prefix of
        window_starts(T_final) — (b) its last frame's analysis span is
        fully captured (n >= (s+size-1)*hop + n_fft/2), and (c) when
        HuBERT is active, the 16 kHz stream has the window's whole time
        span (the mel gate alone fires ~10 ms early)."""
        end = s + self.size
        n = self._base + len(self._audio)
        if n // self.hop < end:
            return False
        if n < (end - 1) * self.hop + self.n_fft // 2:
            return False
        if self.hubert_fe is not None:
            n16 = self._base16 + len(self._audio16)
            if n16 < int(np.ceil(end / self.fps * 16000)):
                return False
        return True

    def _window_mel(self, s: int) -> jax.Array:
        pad = self.n_fft // 2
        padded_start = s * self.hop
        lo = padded_start - pad                   # stream sample index
        if lo < 0:
            # head reflect, librosa-style (only reachable untrimmed:
            # _trim keeps everything a future window reads)
            head = self._audio[1:pad + 1][::-1]
            seg = np.concatenate([head[lo:], self._audio[:lo + self._seg_len]])
        else:
            assert lo >= self._base, (lo, self._base)
            seg = self._audio[lo - self._base:lo - self._base + self._seg_len]
        assert len(seg) == self._seg_len, (len(seg), self._seg_len)
        return self._mel_segment(jnp.asarray(seg))

    def _window_hubert(self, s: int) -> Optional[jax.Array]:
        if self.hubert_fe is None:
            return None
        t0 = s / self.fps
        n = int(self.size / self.fps * 16000)
        n16 = self._base16 + len(self._audio16)
        lo = min(int(t0 * 16000), max(0, n16 - n))
        # the max(0, n16-n) fallback can precede the trim point when the
        # 16k stream lags the mel stream; clamp (end-padded below)
        lo = max(lo, self._base16)
        if self._hub_ctx > 0:
            # left-context variant (see __init__): one static signature
            lo_ext = lo - self._hub_ctx
            avail = max(lo_ext, self._base16)
            pad_left = avail - lo_ext
            seg = self._audio16[avail - self._base16:
                                lo + n - self._base16]
            seg = np.pad(
                seg, (pad_left, self._hub_ext_len - pad_left - len(seg)))
            return self._encode_ctx(jnp.asarray(seg),
                                    jnp.int32(pad_left))
        seg = self._audio16[lo - self._base16:lo - self._base16 + n]
        if len(seg) < n:
            seg = np.pad(seg, (0, n - len(seg)))
        return self.hubert_fe(jnp.asarray(seg)[None],
                              target_frames=self.size)

    def _offline_mel(self):
        """Centered, drop_last mel of the retained stream, plus the frame
        index its first frame corresponds to in the full stream (0 when
        untrimmed; ``_base/hop`` after trimming — ``_base`` is kept
        hop-aligned so retained frames land exactly on the offline frame
        grid).  For the finish() frames whose analysis spans need the
        sequence-end padding."""
        power = stft_magsq(jnp.asarray(self._audio)[None], self.n_fft,
                           self.hop, self._window, center=True)
        return (power @ self._filters)[:, :-1], self._base // self.hop

    # -- window machinery --------------------------------------------------
    def _run_window(self, s: int, mel_w: jax.Array, hub_w) -> jax.Array:
        self.rng, k = jax.random.split(self.rng)
        B = self.pid.shape[0]
        mel_b = jnp.broadcast_to(mel_w, (B,) + mel_w.shape[1:])
        hub_b = (jnp.broadcast_to(hub_w, (B,) + hub_w.shape[1:])
                 if hub_w is not None else None)
        if self._prev_out is None:
            out = self.gen.generate(mel_b, self.pid, k, hub_b)
        else:
            tail_from = s - self._last_start
            gt_head = self._prev_out[:, tail_from:tail_from + self.overlap]
            out = self.gen.generate(mel_b, self.pid, k, hub_b,
                                    gt_head=gt_head,
                                    prev_saved_tails=self._prev_tails)
        if isinstance(out, tuple):      # same_overlap_noisy: thread tails
            out, self._prev_tails = out
        return out

    def push(self, samples: np.ndarray,
             samples_16k: Optional[np.ndarray] = None) -> np.ndarray:
        """Append captured audio; run every window that became stable.

        Returns the motion frames emitted by this push, (B, new_T, C)
        (new_T may be 0).
        """
        assert not self._finished, "session already finished"
        self._audio = np.concatenate(
            [self._audio, np.asarray(samples, dtype=np.float32).ravel()])
        if samples_16k is not None and self.hubert_fe is not None:
            # without a hubert extractor the 16 kHz stream is never read —
            # dropping it keeps retain=False sessions bounded even when a
            # hubert-oriented client sends both streams
            self._audio16 = np.concatenate(
                [self._audio16,
                 np.asarray(samples_16k, dtype=np.float32).ravel()])

        emitted = []
        while self._window_ready(self._next_start):
            s = self._next_start
            out = self._run_window(s, self._window_mel(s),
                                   self._window_hubert(s))
            emitted.append(np.asarray(out[:, :self.step]))
            self._emitted += self.step
            self._last_start = s
            self._prev_out = out
            self._next_start = s + self.step
        if emitted:
            if self.retain:
                self._chunks.extend(emitted)
            else:
                self._trim()
            return np.concatenate(emitted, axis=1)
        return np.zeros((self.pid.shape[0], 0,
                         denoised_channels(self.cfg.model)),
                        dtype=np.float32)

    def finish(self) -> np.ndarray:
        """Drain the tail (left-shifted final window, offline mel for the
        end-padding-dependent frames).  Returns the FULL session motion
        (B, T, C) when ``retain`` (the default); with ``retain=False``
        only the tail frames drained here (everything earlier was already
        returned by ``push``)."""
        assert not self._finished
        self._finished = True
        T = (self._base + len(self._audio)) // self.hop  # offline frames
        tail: List[np.ndarray] = []            # frames drained by finish
        if self._prev_out is not None:
            # The live gates can stall windows behind the 16 kHz stream
            # (or, at hop < n_fft/2, behind the analysis-span gate) while
            # mel frames keep accumulating.  The offline plan runs EVERY
            # window whose span lies in T (streamer.window_starts), so
            # drain them here with the end-padded offline mel — the
            # final-window logic below assumes at most one step of gap
            # (its gt_head slice truncates silently past that).
            mel = off = None
            while T >= self._next_start + self.size:
                if mel is None:
                    mel, off = self._offline_mel()
                s = self._next_start
                out = self._run_window(
                    s, mel[:, s - off:s - off + self.size],
                    self._window_hubert(s))
                tail.append(np.asarray(out[:, :self.step]))
                self._emitted += self.step
                self._last_start = s
                self._prev_out = out
                self._next_start = s + self.step
        done = self._emitted                   # frames emitted so far
        if T > done:
            if self._prev_out is None:
                # never emitted: short-clip semantics (pad-and-trim); the
                # session rng passes through unsplit, exactly like the
                # offline streamer's _short_sequence path (stream is
                # untrimmed here — trimming starts at the first emission)
                from diffsheg_tpu.sampling.streamer import StreamingGenerator
                mel_full, _ = self._offline_mel()
                B = self.pid.shape[0]
                mel_b = jnp.broadcast_to(mel_full,
                                         (B,) + mel_full.shape[1:])
                hub_b = None
                if self.hubert_fe is not None:
                    hub_w = self.hubert_fe(jnp.asarray(self._audio16)[None],
                                           target_frames=T)
                    hub_b = jnp.broadcast_to(hub_w, (B,) + hub_w.shape[1:])
                out = StreamingGenerator(self.gen).generate(
                    mel_b, self.pid, self.rng, hub_b)
                tail.append(np.asarray(out[:, :T]))
            elif T <= self._last_start + self.size:
                # the already-sampled last window covers through T: emit
                # its remaining frames (offline's final window emits its
                # full size, ddpm_beat_trainer.py:1305-1309)
                tail.append(np.asarray(
                    self._prev_out[:, self.step:self.step + (T - done)]))
            else:
                s = T - self.size                 # left-shifted final window
                mel, off = self._offline_mel()
                mel_w = mel[:, s - off:s - off + self.size]
                out = self._run_window(s, mel_w, self._window_hubert(s))
                new_from = done - s
                tail.append(np.asarray(out[:, new_from:]))
        if self.retain:
            self._chunks.extend(tail)
            tail = self._chunks
        return np.concatenate(tail, axis=1) if tail \
            else np.zeros((self.pid.shape[0], 0,
                           denoised_channels(self.cfg.model)),
                          dtype=np.float32)
