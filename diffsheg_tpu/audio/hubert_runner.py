"""Long-audio HuBERT feature extraction with static-shape chunking.

Reference algorithm (trainers/ddpm_beat_trainer.py:1429-1475 and
datasets/extract_hubert.py:18-63): the conv frontend is equivalent to one
Conv1d with kernel 400 / stride 320, so long audio is cut into chunks of
``320*1000`` samples extended by ``kernel - stride`` to avoid frame overlap,
encoded independently, concatenated, then padded/trimmed to the expected
``(N - 80) // 320`` frames.

TPU adaptation: every chunk (including the remainder) is padded to the same
static length and encoded by ONE vmapped/batched jit call; padded frames are
sliced off afterwards.  Features are then linearly resampled to the motion
frame rate (align_corners=True, matching F.interpolate at
ddpm_beat_trainer.py:1265).
"""

from __future__ import annotations

from typing import Optional


import jax
import jax.numpy as jnp

from diffsheg_tpu.models.hubert import HubertModel, HubertConfig, normalize_waveform

KERNEL = 400
STRIDE = 320
CLIP_FRAMES = 1000
CLIP_SAMPLES = STRIDE * CLIP_FRAMES          # 320_000
CHUNK_SAMPLES = CLIP_SAMPLES - STRIDE + KERNEL  # 320_080


def expected_frames(num_samples: int) -> int:
    return (num_samples - (KERNEL - STRIDE)) // STRIDE


def linear_resample(x: jax.Array, new_len: int) -> jax.Array:
    """torch.nn.functional.interpolate(mode='linear', align_corners=True)
    along axis 1 of (B, T, C)."""
    B, T, C = x.shape
    if T == new_len:
        return x
    pos = jnp.linspace(0.0, T - 1.0, new_len)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    w = (pos - lo)[None, :, None]
    return x[:, lo] * (1.0 - w) + x[:, hi] * w


class HubertFeatureExtractor:
    """Chunked long-audio HuBERT driver.

    The entire pipeline — waveform normalization, static chunk slicing and
    padding, the batched encoder, de-chunk stitching, analytic pad/trim, and
    the motion-rate resample — compiles to ONE jit per (num_samples,
    target_frames) signature.  Host-side per-op dispatch would otherwise
    dominate the cost on a remote-device setup (each unjitted jnp op is a
    round-trip)."""

    def __init__(self, cfg: Optional[HubertConfig] = None, variables=None,
                 rng: Optional[jax.Array] = None):
        self.cfg = cfg or HubertConfig()
        self.model = HubertModel(self.cfg)
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            # host-CPU init (see models/factory.py::host_init): eager init
            # through a remote-attached device is per-op dispatch
            from diffsheg_tpu.models.factory import host_init
            variables = host_init(self.model.init, rng,
                                  jnp.zeros((1, KERNEL * 4)))
        self.variables = variables
        self._fns = {}

    def _build(self, n: int, target_frames: Optional[int]):
        """Compile the full extraction program for a fixed sample count."""
        exp_t = expected_frames(n)
        num_full = n // CLIP_SAMPLES
        # static chunk plan: (start, length, valid_frames) per chunk
        plan = []
        for i in range(num_full):
            start = CLIP_SAMPLES * i
            length = min(CHUNK_SAMPLES, n - start)
            plan.append((start, length))
        rest_start = CLIP_SAMPLES * num_full
        if n - rest_start >= KERNEL:
            plan.append((rest_start, n - rest_start))
        if not plan:  # audio shorter than one kernel: no frames
            return None

        valid_frames = [(L - KERNEL) // STRIDE + 1 for _, L in plan]
        # static per-chunk frame mask: the remainder chunk is zero-padded to
        # CHUNK_SAMPLES, and without masking its pad frames would leak into
        # the valid frames through softmax attention (the torch reference
        # encodes the remainder at natural length, extract_hubert.py:18-63;
        # masking makes the padded encode equal that bit-for-bit)
        full_frames = (CHUNK_SAMPLES - KERNEL) // STRIDE + 1
        frame_mask = None
        if any(L < CHUNK_SAMPLES for _, L in plan):
            import numpy as np
            frame_mask = jnp.asarray(
                np.arange(full_frames)[None, :]
                < np.asarray(valid_frames)[:, None])

        def fn(variables, audio):
            audio = normalize_waveform(audio)
            rows = []
            for start, length in plan:
                ch = jax.lax.slice_in_dim(audio, start, start + length,
                                          axis=1)
                if length < CHUNK_SAMPLES:
                    ch = jnp.pad(ch, ((0, 0), (0, CHUNK_SAMPLES - length)))
                rows.append(ch)
            batchd = jnp.concatenate(rows, axis=0)
            feats = self.model.apply(variables, batchd,
                                     frame_mask)  # (chunks, F, 1024)
            parts = [feats[i, :vf] for i, vf in enumerate(valid_frames)]
            seq = jnp.concatenate(parts, axis=0)[None]  # (1, T', 1024)

            # pad/trim to the analytic frame count
            # (ddpm_beat_trainer.py:1470-1474)
            T = seq.shape[1]
            if T < exp_t:
                seq = jnp.pad(seq, ((0, 0), (0, exp_t - T), (0, 0)))
            else:
                seq = seq[:, :exp_t]
            if target_frames is not None:
                seq = linear_resample(seq, target_frames)
            return seq

        return jax.jit(fn)

    def raw_fn(self, num_samples: int, target_frames: Optional[int]):
        """Unjitted extraction program for composition into a larger jit
        (e.g. the single-dispatch pipeline, sampling/pipeline.py).

        Returns ``fn(variables, audio_16k) -> (1, T, 1024)`` or None when
        the audio is shorter than one conv kernel.
        """
        jitted = self._build(num_samples, target_frames)
        return None if jitted is None else jitted.__wrapped__

    def __call__(self, audio_16k: jax.Array,
                 target_frames: Optional[int] = None) -> jax.Array:
        """audio (N,) or (1, N) float32 at 16 kHz -> (1, T, 1024).

        ``target_frames`` resamples the features to the motion frame count.
        """
        if audio_16k.ndim == 1:
            audio_16k = audio_16k[None]
        n = int(audio_16k.shape[1])
        key = (n, target_frames)
        if key not in self._fns:
            self._fns[key] = self._build(n, target_frames)
        fn = self._fns[key]
        if fn is None:
            return jnp.zeros((1, target_frames or 0, self.cfg.hidden_size))
        return fn(self.variables, audio_16k)
