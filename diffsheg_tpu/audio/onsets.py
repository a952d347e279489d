"""Audio onset detection for the BeatAlign metric — librosa-faithful.

The reference delegates beat-alignment scoring to the external BEAT harness
(reference trainers/ddpm_beat_trainer.py:1100-1119), which uses
``librosa.onset.onset_detect`` with library defaults.  That harness checkout
is not part of the reference tree, so the anchor here is librosa's own
documented algorithm, reproduced exactly (librosa 0.10 source):

  1. ``onset_strength``: log-power mel spectrogram via ``power_to_db``
     (10*log10, amin=1e-10, top_db=80 relative to the max), positive
     first difference with lag 1, mean over mel bands, lag-padded at the
     start;
  2. ``peak_pick`` with onset_detect's default windows, all derived from
     the frame rate ``sr/hop``:
       pre_max  = ceil(0.03 * sr/hop),  post_max = ceil(0.00 * sr/hop)+1
       pre_avg  = ceil(0.10 * sr/hop),  post_avg = ceil(0.10 * sr/hop)+1
       delta    = 0.07,                 wait     = ceil(0.03 * sr/hop)
     a frame i is an onset iff env[i] is the max of
     env[i-pre_max : i+post_max], env[i] >= mean(env[i-pre_avg :
     i+post_avg]) + delta, and i > last_onset + wait.

The mel frontend runs on device (audio/mel.py); the envelope math is tiny
host numpy.  Golden tests: tests/test_audio.py (impulse-train fixtures with
hand-computed expected onsets).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np


def power_to_db(S: np.ndarray, amin: float = 1e-10,
                top_db: float = 80.0) -> np.ndarray:
    """librosa.power_to_db with ref=1.0: 10*log10(max(S, amin)), floored at
    ``max - top_db``."""
    log_spec = 10.0 * np.log10(np.maximum(S, amin))
    return np.maximum(log_spec, log_spec.max() - top_db)


def onset_strength(mel: np.ndarray, lag: int = 1,
                   center_shift: int = 0) -> np.ndarray:
    """(T, M) power mel -> (T,) onset envelope (librosa.onset.onset_strength:
    positive lag-difference of the dB mel, mean over bands, zero-padded at
    the start and trimmed back to T).

    ``center_shift`` is librosa's centered-STFT compensation,
    ``n_fft // (2 * hop)`` extra frames of start padding (librosa
    onset_strength_multi pads ``lag + n_fft // (2*hop)`` when center=True).
    """
    T = mel.shape[0]
    S = power_to_db(mel)
    flux = np.maximum(S[lag:] - S[:-lag], 0.0).mean(axis=1)
    env = np.concatenate([np.zeros(lag + center_shift), flux])
    return env[:T]


def peak_pick(env: np.ndarray, pre_max: int, post_max: int,
              pre_avg: int, post_avg: int, delta: float,
              wait: int) -> np.ndarray:
    """librosa.util.peak_pick on a 1-D envelope -> onset frame indices.

    Window conventions match librosa exactly: the max window is
    ``env[i-pre_max : i+post_max]`` and the mean window
    ``env[i-pre_avg : i+post_avg]`` (both clipped to the array), and
    successive onsets are at least ``wait+1`` frames apart.
    """
    T = len(env)
    onsets = []
    last = -(wait + 1)
    for i in range(T):
        lo_m, hi_m = max(0, i - pre_max), min(T, i + post_max)
        lo_a, hi_a = max(0, i - pre_avg), min(T, i + post_avg)
        if env[i] != env[lo_m:hi_m].max():
            continue
        if env[i] < env[lo_a:hi_a].mean() + delta:
            continue
        if i - last <= wait:
            continue
        onsets.append(i)
        last = i
    return np.asarray(onsets, dtype=np.int64)


def pick_onsets(envelope: np.ndarray, hop_seconds: float,
                delta: float = 0.07) -> np.ndarray:
    """Onset times in seconds with librosa.onset.onset_detect's default
    window set derived from the frame rate (see module docstring).

    Matches onset_detect's ``normalize=True`` default: the envelope is
    shifted to min 0 and scaled to max 1 before peak picking, which is
    what calibrates ``delta=0.07``.
    """
    if len(envelope) == 0:
        return np.zeros((0,))
    envelope = envelope - envelope.min()
    peak = envelope.max()
    if peak > 0:
        envelope = envelope / peak
    fps = 1.0 / hop_seconds
    frames = peak_pick(
        envelope,
        pre_max=int(math.ceil(0.03 * fps)),
        post_max=int(math.ceil(0.00 * fps)) + 1,
        pre_avg=int(math.ceil(0.10 * fps)),
        post_avg=int(math.ceil(0.10 * fps)) + 1,
        delta=delta,
        wait=int(math.ceil(0.03 * fps)),
    )
    return frames * hop_seconds


def audio_onset_times(audio: np.ndarray, sr: int,
                      mel: Optional[np.ndarray] = None,
                      hop: Optional[int] = None) -> np.ndarray:
    """Waveform -> onset times in seconds (computes mel if not given)."""
    n_fft = 512  # short 32 ms analysis window: the 2048-default smears
    #              onsets ~60 ms
    if mel is None:
        import jax.numpy as jnp
        from diffsheg_tpu.audio.mel import MelFrontend
        hop = hop or sr // 100  # 10 ms frames for onset resolution
        fe = MelFrontend(sr=sr, n_fft=n_fft, hop=hop, n_mels=64,
                         drop_last=True)
        mel = np.asarray(fe(jnp.asarray(audio, dtype=jnp.float32)[None]))[0]
    else:
        assert hop is not None, "hop required when mel is precomputed"
    env = onset_strength(mel, center_shift=n_fft // (2 * hop))
    return pick_onsets(env, hop / sr)
