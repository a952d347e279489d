"""Live-session latency/quality frontier (run on the real TPU).

The live session's added latency is dominated by its *algorithmic
lookahead*: a window of size W frames cannot be denoised until its whole
audio span is captured, so a frame emitted at window position p waits
``(W - p) / fps`` seconds plus the per-window compute.  The default BEAT
window (W=34 @ 15 fps) means a 2.3 s worst-case lookahead; the denoiser is
window-length-agnostic, so ``LiveSession.create(window_frames=...)`` can
trade lookahead for quality (less audio context per window, more RePaint
seams).

This sweep measures, per window size:
  - worst/mean algorithmic latency (audio-arrival -> frame emission),
  - steady-state per-window compute (real TPU; includes dispatch),
  - real-time headroom (window audio span / compute),
  - quality drift vs the full-window OFFLINE output on the same audio:
    relative RMS and FGD between 34-frame slices embedded by a fixed
    random-init FgdFeatureNet (the available no-corpus quality proxy).

Usage: python examples/live_latency.py [--secs 40] [--sizes 34,24,16,12]
Prints one JSON line per size; the committed table is in PERF.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fgd_windows(x: np.ndarray, n_frames: int) -> np.ndarray:
    """Slice (1, T, C) motion into disjoint (N, n_frames, C) windows."""
    T = x.shape[1]
    n = T // n_frames
    return x[0, : n * n_frames].reshape(n, n_frames, x.shape[2])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=int, default=40)
    ap.add_argument("--sizes", default="34,24,16,12")
    ap.add_argument("--chunk-ms", type=int, default=100)
    args = ap.parse_args()

    from diffsheg_tpu.audio.mel import MelFrontend
    from diffsheg_tpu.config import beat_config
    from diffsheg_tpu.eval.fgd_net import FgdNetConfig, init_fgd_net
    from diffsheg_tpu.eval.metrics import frechet_from_activations
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser
    from diffsheg_tpu.sampling.generator import WindowGenerator
    from diffsheg_tpu.sampling.live import LiveSession
    from diffsheg_tpu.sampling.streamer import StreamingGenerator
    from diffsheg_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    cfg = beat_config()
    cfg = cfg.replace(
        diffusion=dataclasses.replace(
            cfg.diffusion, jump_n_sample=2,
            # live sessions keep the per-layer kernel: a single window's
            # wall time is dispatch-bound (~27 ms tunnel) and the chain
            # kernel measured no better (worse at small windows) — the
            # chain win is specific to the fused whole-stream program
            fused_layer=os.environ.get("BENCH_FUSED_LAYER", "auto"),
            quantize=os.environ.get("BENCH_QUANT", "none")),
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                  add_hubert=False),
    )
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))
    pid = jax.nn.one_hot(jnp.array([1]), cfg.model.style_dim)
    fps = cfg.data.fps
    sr = cfg.data.mel_sr
    hop = cfg.data.mel_hop

    secs = args.secs
    t = np.arange(secs * sr) / sr
    audio = (0.3 * np.sin(2 * np.pi * (200 + 30 * np.sin(2 * np.pi * t)) * t)
             + 0.05 * np.random.RandomState(0).randn(len(t))
             ).astype(np.float32)

    # offline full-window reference output
    fe = MelFrontend(sr=sr, hop=hop, n_mels=cfg.data.n_mels)
    mel = fe(jnp.asarray(audio)[None])
    offline = np.asarray(StreamingGenerator(
        WindowGenerator(cfg, variables)).generate(
            mel, pid, jax.random.PRNGKey(3)))

    fgd_frames = cfg.data.n_poses
    _, fgd_vars = init_fgd_net(FgdNetConfig(
        n_frames=fgd_frames, pose_dim=cfg.model.motion_dim))
    from diffsheg_tpu.eval.fgd_net import FgdFeatureNet
    net = FgdFeatureNet(FgdNetConfig(n_frames=fgd_frames,
                                     pose_dim=cfg.model.motion_dim))
    embed = jax.jit(lambda x: net.apply(fgd_vars, x))
    ref_lat = np.asarray(embed(jnp.asarray(fgd_windows(offline, fgd_frames))))

    chunk = int(sr * args.chunk_ms / 1000)
    for W in [int(s) for s in args.sizes.split(",") if s]:
        sess = LiveSession.create(cfg, variables, pid, jax.random.PRNGKey(3),
                                  window_frames=0 if W == cfg.data.n_poses
                                  else W)
        ov = sess.overlap
        step = sess.step
        # simulate real-time capture; time each push that completes >=1 window
        per_window = []
        emitted = 0
        for lo in range(0, len(audio), chunk):
            t0 = time.perf_counter()
            out = sess.push(audio[lo:lo + chunk])
            if out.shape[1]:
                n_win = max(1, out.shape[1] // step)
                per_window.append((time.perf_counter() - t0) / n_win)
                emitted += out.shape[1]
        live = sess.finish()

        compute_ms = float(np.median(per_window[2:] or per_window) * 1e3)
        worst_s = W / fps + compute_ms / 1e3
        mean_s = (W + ov + 1) / 2 / fps + compute_ms / 1e3
        rel_rms = float(np.sqrt(((live - offline) ** 2).mean())
                        / np.sqrt((offline ** 2).mean()))
        lat = np.asarray(embed(jnp.asarray(fgd_windows(live, fgd_frames))))
        fgd = float(frechet_from_activations(lat, ref_lat))
        print(json.dumps({
            "window": W, "overlap": ov,
            "lookahead_s": round(W / fps, 3),
            "compute_ms_per_window": round(compute_ms, 1),
            "latency_worst_s": round(worst_s, 3),
            "latency_mean_s": round(mean_s, 3),
            "realtime_headroom": round((step / fps) / (compute_ms / 1e3), 1),
            "rel_rms_vs_offline": round(rel_rms, 4),
            "fgd_vs_offline": round(fgd, 3),
            "frames": int(live.shape[1]),
        }), flush=True)


if __name__ == "__main__":
    main()
