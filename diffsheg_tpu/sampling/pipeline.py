"""Single-dispatch serving pipeline: raw waveforms -> motion in ONE jit.

The reference pipeline is three separately-launched stages — librosa mel on
host CPU, HuBERT on GPU, then the window loop
(trainers/ddpm_beat_trainer.py:1236-1315).  The TPU port keeps the same
stage structure under independent jits (cli/generate.py), which costs one
device dispatch per stage; on a remote-attached TPU a dispatch is ~25 ms,
comparable to the whole mel stage's compute.

``FusedPipeline`` traces mel -> HuBERT -> fused windowed sampler into ONE
compiled program: a 60 s clip costs exactly one dispatch, and XLA can
overlap the frontend with the first window's denoising.  Numerics are the
same traced functions the staged path runs (MelFrontend._compute,
HubertFeatureExtractor.raw_fn, StreamingGenerator._build_fused).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from diffsheg_tpu.sampling.streamer import StreamingGenerator, window_starts


class FusedPipeline:
    """Waveforms in, denormalized-space motion out, one dispatch per call.

    Args:
      streamer: the window-level generator to drive.
      mel_frontend: audio.mel.MelFrontend (drop_last respected).
      hubert_extractor: audio.hubert_runner.HubertFeatureExtractor or None.
    """

    def __init__(self, streamer: StreamingGenerator, mel_frontend,
                 hubert_extractor=None):
        self.stream = streamer
        self.frontend = mel_frontend
        self.hubert = hubert_extractor
        self._fns = {}

    def _num_frames(self, n_samples: int) -> int:
        """Mel frame count, derived from the frontend itself (eval_shape)
        so the pipeline cannot drift from MelFrontend's conventions."""
        fe = self.frontend
        shape = jax.eval_shape(
            fe._compute,
            jax.ShapeDtypeStruct((1, n_samples), jnp.float32)).shape
        return shape[1] - 1 if fe.drop_last else shape[1]

    def _build(self, n_mel: int, n16: Optional[int], B: int):
        fe, stream = self.frontend, self.stream
        cfg = stream.cfg
        T = self._num_frames(n_mel)
        size = cfg.data.n_poses
        step = size - cfg.stream.overlap_len
        hub_raw = (self.hubert.raw_fn(n16, T)
                   if self.hubert is not None and n16 is not None else None)

        if T <= size:
            fused = None                       # short clip: pad-and-trim
        else:
            starts = window_starts(T, size, step)
            fused = stream._build_fused(starts, size, step,
                                        cfg.stream.overlap_len, T,
                                        hub_raw is not None)
            n_keys = len(starts)

        def fn(variables, hub_vars, audio_mel, audio_16k, pid, rng):
            mel = fe._compute(audio_mel)
            if fe.drop_last:
                mel = mel[:, :-1]
            hub = hub_raw(hub_vars, audio_16k) if hub_raw is not None else None
            if B > 1:  # one audio, a batch of speaker styles
                mel = jnp.broadcast_to(mel, (B,) + mel.shape[1:])
                if hub is not None:
                    hub = jnp.broadcast_to(hub, (B,) + hub.shape[1:])
            if fused is None:
                pad = size - T
                if pad:
                    mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)),
                                  mode="edge")
                    if hub is not None:
                        hub = jnp.pad(hub, ((0, 0), (0, pad), (0, 0)),
                                      mode="edge")
                gen = stream.gen
                out = gen.sample_plain_fn(
                    variables, mel, pid, hub, rng,
                    cache=gen.build_cache_fn(variables, mel, pid, hub))
                return out[:, :T]
            # same chained key derivation as StreamingGenerator
            # .generate_fused, so the two paths are bit-comparable
            keys = []
            for _ in range(n_keys):
                rng, k = jax.random.split(rng)
                keys.append(k)
            return fused(variables, mel, pid, hub, jnp.stack(keys))

        return jax.jit(fn)

    def __call__(self, audio_mel: jax.Array, audio_16k: Optional[jax.Array],
                 person_id: jax.Array, rng: jax.Array) -> jax.Array:
        """audio_mel (1, N) at the mel rate; audio_16k (1, N16) or None;
        person_id (B, style_dim).  Returns (B, T, motion_dim)."""
        if audio_mel.ndim == 1:
            audio_mel = audio_mel[None]
        if audio_16k is not None and audio_16k.ndim == 1:
            audio_16k = audio_16k[None]
        B = person_id.shape[0]
        n16 = None if audio_16k is None else int(audio_16k.shape[1])
        key = (int(audio_mel.shape[1]), n16, B)
        if key not in self._fns:
            self._fns[key] = self._build(*key)
        hub_vars = None if self.hubert is None else self.hubert.variables
        return self._fns[key](self.stream.gen.variables, hub_vars,
                              audio_mel, audio_16k, person_id, rng)
