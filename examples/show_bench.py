"""SHOW-configuration throughput benchmark (the reference's second headline).

Reference fast configuration (inference_custom_audio_show.sh:18-33): DDIM-25,
overlap 10, classifier-free guidance scale 1.15, jump_n_sample 2 — "120+ FPS"
on A100 at 30 fps output.  Same RTF method as bench.py (mel + HuBERT +
sampler for one stream), on the single-dispatch serving pipeline with CFG
batch-doubling inside the compiled program.

Run: python examples/show_bench.py   (one real TPU chip; first call compiles)
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 120.0  # A100, inference_custom_audio_show.sh:18 (jn=2)
BASELINE_FPS_JN5 = 50.0  # A100, default config, inference_custom_audio_show.sh:1-15


def main():
    from diffsheg_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor
    from diffsheg_tpu.audio.mel import MelFrontend
    from diffsheg_tpu.config import show_config
    from diffsheg_tpu.models.hubert import HubertConfig
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser
    from diffsheg_tpu.sampling.generator import WindowGenerator
    from diffsheg_tpu.sampling.pipeline import FusedPipeline
    from diffsheg_tpu.sampling.streamer import StreamingGenerator

    cfg = show_config()
    from diffsheg_tpu.utils.benchcfg import jump_config_baseline
    jn, baseline = jump_config_baseline({2: BASELINE_FPS,
                                         5: BASELINE_FPS_JN5})
    cfg = cfg.replace(diffusion=dataclasses.replace(
        cfg.diffusion, jump_n_sample=jn,
        fused_layer=os.environ.get("BENCH_FUSED_LAYER", "chain"),
        # BENCH_QUANT=int8: opt-in weight-only int8 serving (PERF.md)
        quantize=os.environ.get("BENCH_QUANT", "none")))
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype="bfloat16"))

    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))
    stream = StreamingGenerator(WindowGenerator(cfg, variables))
    frontend = MelFrontend(sr=cfg.data.mel_sr, hop=cfg.data.mel_hop,
                           n_mels=cfg.data.n_mels)
    hubert_fe = HubertFeatureExtractor(HubertConfig(dtype="bfloat16"))
    pipe = FusedPipeline(stream, frontend, hubert_fe)

    secs = 60

    def synth(sr):
        t = np.arange(secs * sr) / sr
        noise = np.random.RandomState(1).randn(secs * sr)
        return (0.3 * np.sin(2 * np.pi * 220 * t)
                + 0.1 * noise).astype(np.float32)[None]

    audio_18k = jnp.asarray(synth(cfg.data.mel_sr))
    audio_16k = jnp.asarray(synth(16000))
    pid = jax.nn.one_hot(jnp.array([1]), cfg.model.style_dim)

    out = pipe(audio_18k, audio_16k, pid, jax.random.PRNGKey(0))
    out.block_until_ready()

    totals = []
    for i in range(6):
        t0 = time.perf_counter()
        out = pipe(audio_18k, audio_16k, pid, jax.random.PRNGKey(i + 1))
        out.block_until_ready()
        totals.append(time.perf_counter() - t0)

    frames = int(out.shape[1])
    fps = frames / min(totals)
    print(f"fused pipeline (best of 6): total={min(totals):.3f}s "
          f"frames={frames} (CFG batch-doubled, overlap 10)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "show_generation_fps" + (f"_jn{jn}" if jn != 2 else ""),
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
