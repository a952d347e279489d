"""Sampler-stage performance probe (run on the real TPU).

Times the fused whole-stream sampler under micro-variants to guide kernel
dispatch choices:
  - Pallas fused linear attention vs the two-einsum XLA composition;
  - float32 vs bfloat16 parameters + compute.

Usage: python examples/perf_probe.py [--secs 60] [--batch 1]
Prints one line per variant; not part of the benchmark contract.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_variant(name, cfg, variables, secs, batch):
    from diffsheg_tpu.audio.mel import MelFrontend
    from diffsheg_tpu.sampling.generator import WindowGenerator
    from diffsheg_tpu.sampling.streamer import StreamingGenerator

    gen = WindowGenerator(cfg, variables)
    stream = StreamingGenerator(gen)
    frontend = MelFrontend(sr=cfg.data.mel_sr, hop=cfg.data.mel_hop,
                           n_mels=cfg.data.n_mels)
    t = np.arange(secs * cfg.data.mel_sr) / cfg.data.mel_sr
    audio = np.tile((0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
                    [None], (batch, 1))
    mel = frontend(jnp.asarray(audio))
    T = mel.shape[1]
    hubert = jnp.zeros((batch, T, cfg.model.hubert_dim))
    pid = jax.nn.one_hot(jnp.arange(batch) % cfg.model.style_dim,
                         cfg.model.style_dim)

    out = stream.generate_fused(mel, pid, jax.random.PRNGKey(0),
                                hubert=hubert)
    out.block_until_ready()  # compile
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        out = stream.generate_fused(mel, pid, jax.random.PRNGKey(i + 1),
                                    hubert=hubert)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    frames = out.shape[0] * out.shape[1]
    best = min(times)
    print(f"{name:28s} sampler={best:.3f}s  {frames / best:8.1f} fps "
          f"(frames={frames})")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=int, default=60)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import importlib

    # the ops package re-exports the function under the same name, so the
    # module must be fetched explicitly
    la = importlib.import_module("diffsheg_tpu.ops.linear_attention")
    from diffsheg_tpu.config import beat_config
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser

    cfg = beat_config()
    cfg = cfg.replace(diffusion=dataclasses.replace(cfg.diffusion,
                                                    jump_n_sample=2))
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))

    run_variant("f32 + pallas-attn", cfg, variables, args.secs, args.batch)

    orig = la.supports_pallas
    la.supports_pallas = lambda: False
    try:
        run_variant("f32 + einsum-attn", cfg, variables, args.secs,
                    args.batch)
    finally:
        la.supports_pallas = orig

    bf16_vars = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x,
        variables)
    cfg_bf16 = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype="bfloat16"))
    run_variant("bf16 params + pallas", cfg_bf16, bf16_vars, args.secs,
                args.batch)

    # weight-only int8 transformer stack on top of bf16 serving.
    # fused_layer='on' (not 'auto'): quantize requires the fast path, and
    # 'on' keeps the variant runnable off-TPU via interpret mode
    cfg_int8 = cfg_bf16.replace(diffusion=dataclasses.replace(
        cfg_bf16.diffusion, quantize="int8", fused_layer="on"))
    run_variant("bf16 + int8 weights", cfg_int8, bf16_vars, args.secs,
                args.batch)


if __name__ == "__main__":
    main()
