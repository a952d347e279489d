"""On-device MFCC frontend (librosa.feature.mfcc-compatible numerics).

The reference's SHOW cache carries an ``mfcc`` feature selectable with
``--audio_feat mfcc`` (reference options/base_options.py:43,
datasets/show.py:108-109; runner.py:210-211 sets audio_dim=64 for it).  The
cache itself is built by external TalkSHOW tooling with librosa defaults;
this module reproduces ``librosa.feature.mfcc``:

    S   = melspectrogram(y, power=2.0)        # slaney filterbank
    db  = power_to_db(S, ref=1.0, amin=1e-10, top_db=80)
    mfcc = dct(db, type=2, norm='ortho')[:n_mfcc]

TPU-native design: the mel spectrogram reuses :class:`MelFrontend` (one
fused jit); power->dB is elementwise; the DCT-II is a single (n_mels,
n_mfcc) matmul on the MXU — no host DSP.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from diffsheg_tpu.audio.mel import MelFrontend


def dct_ii_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II basis, (n_in, n_out): y = x @ M equals
    scipy.fftpack.dct(x, type=2, norm='ortho', axis=-1)[..., :n_out]."""
    n = np.arange(n_in, dtype=np.float64)
    k = np.arange(n_out, dtype=np.float64)
    basis = 2.0 * np.cos(np.pi * (2.0 * n[:, None] + 1.0) * k[None, :]
                         / (2.0 * n_in))
    # ortho: f(0)=sqrt(1/4N), f(k>0)=sqrt(1/2N), applied to the 2x basis
    scale = np.full(n_out, np.sqrt(1.0 / (2.0 * n_in)))
    scale[0] = np.sqrt(1.0 / (4.0 * n_in))
    return (basis * scale[None, :]).astype(np.float64)


def power_to_db(S: jax.Array, amin: float = 1e-10, top_db: float = 80.0
                ) -> jax.Array:
    """librosa.power_to_db with ref=1.0; the top_db floor is taken per
    sample (librosa applies it over the whole spectrogram)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    if top_db is not None:
        per_sample_max = jnp.max(log_spec, axis=tuple(range(1, S.ndim)),
                                 keepdims=True)
        log_spec = jnp.maximum(log_spec, per_sample_max - top_db)
    return log_spec


class MfccFrontend:
    """(B, N) waveform -> (B, T, n_mfcc) MFCCs, fully jitted."""

    def __init__(self, sr: int = 18000, hop: int = 600, n_mels: int = 128,
                 n_mfcc: int = 64, drop_last: bool = True):
        self.mel = MelFrontend(sr=sr, hop=hop, n_mels=n_mels,
                               drop_last=drop_last)
        self.n_mfcc = n_mfcc
        self._dct = jnp.asarray(dct_ii_matrix(n_mels, n_mfcc),
                                dtype=jnp.float32)
        self._fn = jax.jit(self._compute)

    def _compute(self, mel_power: jax.Array) -> jax.Array:
        return power_to_db(mel_power) @ self._dct

    def __call__(self, audio) -> jax.Array:
        mel = self.mel(jnp.asarray(audio, dtype=jnp.float32))
        return self._fn(mel)
