"""Live streaming demo: simulated microphone capture -> motion.

Feeds synthetic audio to a :class:`LiveSession` in 250 ms capture chunks
and reports, per push, how many motion frames came out and the cumulative
real-time factor.  With a real checkpoint this is the skeleton of a live
avatar driver; here it demonstrates the latency profile with random
weights.

Run: python examples/live_demo.py [seconds]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(secs: float = 12.0):
    import dataclasses

    from diffsheg_tpu.config import beat_config
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser
    from diffsheg_tpu.sampling.generator import WindowGenerator
    from diffsheg_tpu.sampling.live import LiveSession
    from diffsheg_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = beat_config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                  add_hubert=False),
        diffusion=dataclasses.replace(cfg.diffusion, jump_n_sample=2))
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))
    gen = WindowGenerator(cfg, variables)
    pid = jax.nn.one_hot(jnp.array([2]), cfg.model.style_dim)
    session = LiveSession(gen, pid, jax.random.PRNGKey(1))

    sr = cfg.data.mel_sr
    chunk = int(0.25 * sr)                       # 250 ms capture blocks
    t = np.arange(int(secs * sr)) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)
             + 0.1 * np.random.RandomState(0).randn(len(t))
             ).astype(np.float32)

    total_frames, t_start = 0, time.perf_counter()
    for i in range(0, len(audio), chunk):
        t0 = time.perf_counter()
        out = session.push(audio[i:i + chunk])
        dt = time.perf_counter() - t0
        total_frames += out.shape[1]
        if out.shape[1]:
            audio_s = (i + chunk) / sr
            print(f"t={audio_s:5.2f}s  +{out.shape[1]} frames "
                  f"(window in {dt*1e3:.0f} ms, "
                  f"motion through {total_frames/cfg.data.fps:.2f}s)",
                  file=sys.stderr)
    final = session.finish()
    wall = time.perf_counter() - t_start
    print(f"session: {final.shape[1]} frames of motion for {secs:.1f}s of "
          f"audio in {wall:.2f}s wall "
          f"({final.shape[1]/cfg.data.fps/secs*100:.0f}% coverage, "
          f"first window after {cfg.data.n_poses/cfg.data.fps:.1f}s of "
          f"audio)", file=sys.stderr)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 12.0)
