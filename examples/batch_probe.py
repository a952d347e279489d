"""Aggregate-throughput probe: one audio, B speaker styles in one batch.

The window stream is sequential (RePaint overlap), so aggregate throughput
comes from the free batch axis — the reference loops styles serially
(ddpm_beat_trainer.py:1189).  Run: python examples/batch_probe.py [B ...]
"""
import os, sys, time, dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np

def run(B):
    from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor
    from diffsheg_tpu.audio.mel import MelFrontend
    from diffsheg_tpu.config import beat_config
    from diffsheg_tpu.models.hubert import HubertConfig
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser
    from diffsheg_tpu.sampling.generator import WindowGenerator
    from diffsheg_tpu.sampling.pipeline import FusedPipeline
    from diffsheg_tpu.sampling.streamer import StreamingGenerator

    cfg = beat_config()
    cfg = cfg.replace(diffusion=dataclasses.replace(
        cfg.diffusion, jump_n_sample=2,
        # per-layer kernel: the chain kernel's (batch, layer) grid
        # re-streams every layer's weights once PER ROW, halving
        # aggregate throughput at B=64 (measured 6.5k vs 12.7k FPS) —
        # chain is a B=1 single-stream win only
        fused_layer=os.environ.get("BENCH_FUSED_LAYER", "auto"),
        quantize=os.environ.get("BENCH_QUANT", "none")))
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses, jax.random.PRNGKey(0))
    stream = StreamingGenerator(WindowGenerator(cfg, variables))
    frontend = MelFrontend(sr=cfg.data.mel_sr, hop=cfg.data.mel_hop, n_mels=cfg.data.n_mels)
    hub_fe = HubertFeatureExtractor(HubertConfig(dtype="bfloat16"))
    pipe = FusedPipeline(stream, frontend, hub_fe)

    secs = 60
    def synth(sr):
        t = np.arange(secs * sr) / sr
        return (0.3*np.sin(2*np.pi*220*t) + 0.1*np.random.RandomState(1).randn(secs*sr)).astype(np.float32)[None]
    a18, a16 = jnp.asarray(synth(cfg.data.mel_sr)), jnp.asarray(synth(16000))
    pid = jax.nn.one_hot(jnp.arange(B) % cfg.model.style_dim, cfg.model.style_dim)
    out = pipe(a18, a16, pid, jax.random.PRNGKey(0)); out.block_until_ready()
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        out = pipe(a18, a16, pid, jax.random.PRNGKey(i+1)); out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    frames = int(out.shape[1]) * B
    print(f"B={B}: {min(ts):.3f}s -> aggregate {frames/min(ts):.0f} FPS "
          f"({frames/min(ts)/55:.0f}x A100 single-stream)", flush=True)

for b in (sys.argv[1:] or ["8", "64"]):
    run(int(b))
