"""On-device mel spectrogram (librosa-0.9.2-compatible numerics).

The reference computes mel on host CPU with librosa
(trainers/ddpm_beat_trainer.py:1244: sr=18000, hop=1200, n_mels=128, all other
parameters default => n_fft=2048, hann window, center=True with reflect
padding, power=2, slaney mel filters, fmax=sr/2).  Frontend drift is
load-bearing: 25 denoise steps amplify small conditioning differences, so the
filterbank and framing below follow the librosa formulas exactly.

TPU-native design: framing is a strided gather, the window+FFT run under jit
(XLA lowers rfft natively), and the mel projection is a single (F, M) matmul
on the MXU.  The whole frontend is one fused jitted function; no host DSP.
"""

from __future__ import annotations

import functools


from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# mel filterbank (host, numpy, float64 — trace-time constant)
# --------------------------------------------------------------------------

def _hz_to_mel(f: np.ndarray, htk: bool = False) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, logarithmic above.
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(m: np.ndarray, htk: bool = False) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )
    return freqs


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int,
    fmin: float = 0.0, fmax: Optional[float] = None,
    htk: bool = False, norm: str = "slaney",
) -> np.ndarray:
    """Triangular mel filters, (n_mels, 1 + n_fft//2) float32.

    Matches librosa.filters.mel: band edges evenly spaced on the mel scale,
    triangle weights via the difference-ramp formulation, slaney area
    normalisation 2 / (mel_f[m+2] - mel_f[m]).
    """
    fmax = fmax if fmax is not None else sr / 2.0
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freqs)

    mel_min, mel_max = _hz_to_mel(np.array([fmin, fmax]), htk)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
        weights = weights * enorm[:, None]
    elif norm is not None:
        raise ValueError(f"unsupported mel norm {norm!r}")
    return weights.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann (scipy.signal.get_window('hann', n, fftbins=True)),
    the librosa default."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


# --------------------------------------------------------------------------
# jitted STFT + mel
# --------------------------------------------------------------------------

def frame_signal(y: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """(..., N) -> (..., T, frame_length) overlapping frames, T = 1 + (N - frame_length)//hop."""
    n = y.shape[-1]
    num_frames = 1 + (n - frame_length) // hop
    starts = jnp.arange(num_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return jnp.take(y, idx, axis=-1)


@functools.lru_cache(maxsize=4)
def _dft_matrices(n_fft: int):
    """Real-DFT basis as two (n_fft, 1+n_fft//2) f32 matmul operands.

    TPUs have no FFT unit — XLA emulates jnp.fft on TPU far below matmul
    speed (measured: 2048-point rfft over 900 frames ~39 ms vs ~1 ms as a
    DFT matmul on the MXU).  At DiffSHEG sizes the O(N^2) basis is tiny
    (2 x 16 MB constants) and numerically equivalent at f32.
    """
    k = np.arange(n_fft)[:, None] * np.arange(1 + n_fft // 2)[None, :]
    ang = -2.0 * np.pi * k / n_fft
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def stft_magsq(
    y: jax.Array, n_fft: int, hop: int, window: jax.Array,
    center: bool = True, pad_mode: str = "reflect",
    use_matmul_dft: bool = None,
) -> jax.Array:
    """|STFT|^2, shape (..., T, 1 + n_fft//2).

    ``use_matmul_dft=None`` auto-selects the MXU matmul DFT on TPU-like
    backends and native rfft on CPU (where XLA's FFT is fast and the O(N^2)
    basis would be slow).
    """
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode=pad_mode)
    frames = frame_signal(y, n_fft, hop) * window
    if use_matmul_dft is None:
        use_matmul_dft = jax.default_backend() != "cpu"
    if use_matmul_dft:
        cos_m, sin_m = _dft_matrices(n_fft)
        re = frames @ jnp.asarray(cos_m)
        im = frames @ jnp.asarray(sin_m)
        return re ** 2 + im ** 2
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


class MelFrontend:
    """Compiled mel frontend with the DiffSHEG parameters baked in.

    Usage: ``mel = MelFrontend(sr=18000, hop=1200)(audio_18k)`` where audio is
    (B, N) float32.  Output is (B, T, n_mels) with the final frame dropped
    (the reference's ``mel[..., :-1]``, ddpm_beat_trainer.py:1249) so frame
    count equals ``N // hop``.
    """

    def __init__(self, sr: int = 18000, n_fft: int = 2048, hop: int = 1200,
                 n_mels: int = 128, drop_last: bool = True,
                 pad_mode: str = "reflect"):
        self.sr, self.n_fft, self.hop, self.n_mels = sr, n_fft, hop, n_mels
        self.drop_last = drop_last
        self.pad_mode = pad_mode
        self._filters = jnp.asarray(mel_filterbank(sr, n_fft, n_mels).T)  # (F, M)
        self._window = jnp.asarray(hann_window(n_fft))
        self._jit = jax.jit(self._compute)

    def _compute(self, y: jax.Array) -> jax.Array:
        power = stft_magsq(y, self.n_fft, self.hop, self._window,
                           center=True, pad_mode=self.pad_mode)
        mel = power @ self._filters  # (..., T, M) on the MXU
        return mel

    def __call__(self, y: jax.Array) -> jax.Array:
        mel = self._jit(y)
        if self.drop_last:
            mel = mel[..., :-1, :]
        return mel
