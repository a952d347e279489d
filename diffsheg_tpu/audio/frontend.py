"""On-device speech frontend for the jitted train step.

The reference extracts HuBERT features on the HOST before training
(trainers/ddpm_beat_trainer.py:1429-1475 feeding :383-441) and ships
mel + 1024-d HuBERT + motion to the device every step.  At batch 1024 that
is ~190 MB/batch of host->device traffic; on any weak host link the step is
feed-bound (PERF.md measures 5.4 s/step vs 261 ms resident through this
environment's tunnel).

Here the step consumes the cached RAW 16 kHz window audio
(data/beat.py:312 stores it) and computes both conditioning features
INSIDE the compiled step:

  wave16 (B, S) --+-- polyphase 16k->18k (audio/resample.py, exact scipy
                  |   parity) -> mel STFT matmul (audio/mel.py)  -> (B,T,128)
                  +-- normalize -> HuBERT encoder (models/hubert.py)
                      -> linear resample to motion rate          -> (B,T,1024)

Both branches sit under ``stop_gradient`` (the speech encoder is frozen in
the reference, ddpm_beat_trainer.py:1434) so XLA neither differentiates
through them nor keeps their activations for the backward pass.

Parity: the mel branch equals the cache-build path (host scipy resample +
the same MelFrontend) to f32 rounding; the HuBERT branch equals the offline
chunked extractor on per-window audio exactly (a training window is far
shorter than one 20 s chunk, so the chunker is a single pass there).
Tests: tests/test_frontend.py.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from diffsheg_tpu.config import Config


def make_speech_frontend(
    cfg: Config,
    hubert_variables: Optional[Any] = None,
    hubert_cfg: Optional[Any] = None,
) -> Callable[[Dict[str, jax.Array]], Dict[str, jax.Array]]:
    """Build ``frontend(batch) -> batch``: pops ``wave16`` (B, S) float32 and
    inserts ``mel`` (B, T, n_mels) (+ ``hubert`` (B, T, 1024) when
    ``model.add_hubert``).  Pure jnp — composes into any jit (the train
    step takes it via ``make_train_step(..., frontend=...)``).

    ``hubert_variables`` are the frozen encoder weights (random init when
    None, mirroring the CLI's behaviour without --hubert-checkpoint).
    """
    from diffsheg_tpu.audio.mel import MelFrontend
    from diffsheg_tpu.audio.resample import resample_poly_device

    mel_fe = MelFrontend(sr=cfg.data.mel_sr, hop=cfg.data.mel_hop,
                         n_mels=cfg.data.n_mels)

    hub_model = None
    hub_vars = None
    if cfg.model.add_hubert:
        from diffsheg_tpu.audio.hubert_runner import KERNEL
        from diffsheg_tpu.models.hubert import (HubertConfig, HubertModel,
                                                stack_layer_params)

        # the frozen encoder follows the model compute dtype (the serving
        # pipeline already runs HuBERT in bf16, PERF.md ladder step 4);
        # features re-cast to f32 below so the denoiser contract is stable
        if hubert_cfg is None:
            hubert_cfg = HubertConfig(dtype=cfg.model.compute_dtype)
        # scan_layers: the 24-layer encoder as ONE lax.scan — the unrolled
        # stack made the train-step compile pathologically slow
        hub_model = HubertModel(hubert_cfg, scan_layers=True)
        if hubert_variables is None:
            # host-CPU init (models/factory.py::host_init); params don't
            # depend on length, so init at the smallest legal waveform
            from diffsheg_tpu.models.factory import host_init
            hubert_variables = host_init(
                hub_model.init, jax.random.PRNGKey(0),
                jnp.zeros((1, KERNEL * 4)))
        elif "layer_0" in hubert_variables["params"]:
            # unrolled layout (HF conversion / extractor init) -> stacked
            hubert_variables = stack_layer_params(hubert_variables,
                                                  hubert_cfg.num_layers)
        hub_vars = hubert_variables

    def frontend(batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        batch = dict(batch)
        wave = batch.pop("wave16")
        if wave.dtype != jnp.float32:
            # int16 transport halves the host->device bytes
            wave = wave.astype(jnp.float32) / 32768.0
        T = batch["motion"].shape[1]

        # mel branch: 16k -> 18k -> log-free mel power, cropped to T frames
        # (data/beat.py::_mel_windows semantics)
        res = resample_poly_device(wave, cfg.data.mel_sr, cfg.data.audio_sr)
        # barrier: letting XLA fuse the dilated resample conv into the
        # STFT framing makes the TPU compile pathological (>8 min vs 20 s
        # with the conv materialized — measured at B=1024 on v5e)
        res = jax.lax.optimization_barrier(res)
        mel = mel_fe._compute(res)[..., :-1, :][:, :T]
        batch["mel"] = jax.lax.stop_gradient(mel)

        if hub_model is not None:
            from diffsheg_tpu.audio.hubert_runner import (
                expected_frames, linear_resample)
            from diffsheg_tpu.models.hubert import normalize_waveform

            feats = hub_model.apply(hub_vars, normalize_waveform(wave))
            exp_t = expected_frames(wave.shape[-1])
            if feats.shape[1] < exp_t:
                feats = jnp.pad(
                    feats, ((0, 0), (0, exp_t - feats.shape[1]), (0, 0)))
            else:
                feats = feats[:, :exp_t]
            feats = linear_resample(feats, T)
            batch["hubert"] = jax.lax.stop_gradient(
                feats.astype(jnp.float32))
        return batch

    return frontend
