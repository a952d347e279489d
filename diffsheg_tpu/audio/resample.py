"""On-device polyphase resampling (scipy.signal.resample_poly parity).

The BEAT pipeline stores 16 kHz waveforms but computes mel at 18 kHz so that
hop 1200 lands exactly on the 15 fps motion rate
(reference trainers/ddpm_beat_trainer.py:1244-1249; our host path uses
scipy's polyphase filter, audio/wav.py).  Moving the speech frontend into
the jitted train step requires the same 9/8 resample ON DEVICE: this module
reproduces scipy's ``resample_poly`` as one strided/dilated convolution —
identical FIR taps (Kaiser beta 5.0 firwin, designed host-side with scipy),
identical output alignment — so the on-device mel matches the cached mel to
float32 rounding.

Derivation of the alignment: scipy zero-stuffs by ``up``, convolves with the
(2*half_len+1)-tap symmetric filter, downsamples by ``down`` and slices so
the group delay cancels; for a symmetric filter that collapses to a
correlation over the dilated signal with ``half_len`` left padding.  XLA's
``conv_general_dilated`` expresses exactly that (lhs_dilation=up,
window_stride=down), and the MXU executes it as a matmul.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def polyphase_taps(up: int, down: int) -> np.ndarray:
    """The exact FIR scipy.signal.resample_poly designs by default
    (window=('kaiser', 5.0), cutoff 1/max_rate, 10*max_rate half-length),
    already scaled by ``up``."""
    from scipy.signal import firwin

    g = math.gcd(up, down)
    up, down = up // g, down // g
    max_rate = max(up, down)
    half_len = 10 * max_rate
    taps = firwin(2 * half_len + 1, 1.0 / max_rate,
                  window=("kaiser", 5.0)) * up
    return taps.astype(np.float64)


def output_len(n: int, up: int, down: int) -> int:
    g = math.gcd(up, down)
    up, down = up // g, down // g
    return -(-(n * up) // down)


def resample_poly_device(x: jax.Array, up: int, down: int) -> jax.Array:
    """(B, N) float32 -> (B, output_len) — scipy.resample_poly semantics.

    One ``conv_general_dilated`` call: zero-stuff by ``up`` (lhs dilation),
    correlate with the symmetric Kaiser FIR, stride by ``down``.  Falls
    through unchanged when up == down.
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == 1 and down == 1:
        return x
    n = x.shape[-1]
    n_out = output_len(n, up, down)
    taps = polyphase_taps(up, down)
    half_len = (len(taps) - 1) // 2
    # right padding so the strided window always has data under it
    len_up = (n - 1) * up + 1
    pad_right = (n_out - 1) * down + len(taps) - 1 - half_len - (len_up - 1)
    kernel = jnp.asarray(taps, dtype=x.dtype)[None, None, :]  # (O=1, I=1, W)
    out = jax.lax.conv_general_dilated(
        x[:, None, :], kernel,
        window_strides=(down,),
        padding=((half_len, max(pad_right, 0)),),
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]
    return out[:, :n_out]
