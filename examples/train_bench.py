"""Training-step throughput benchmark (BEAT configuration, one TPU chip).

The reference trains with global batch 2500 over 5 GPUs (README.md:59-71,
train_test_scripts.sh) but publishes no training-throughput numbers, so
this benchmark tracks our own: windows/second through the full jitted
train step — forward (both branches), all losses (1000*masked eps-MSE +
velocity + 100*huber(x0) with semantic weighting), backward, global-norm
clip, Adam — at the shipped architecture (155M params, f32).

Run: python examples/train_bench.py [batch]   (default 256)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(batch: int = 256):
    from diffsheg_tpu.config import beat_config
    from diffsheg_tpu.diffusion.schedule import (get_named_beta_schedule,
                                                 make_schedule)
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser
    from diffsheg_tpu.train.step import create_train_state, make_train_step

    cfg = beat_config()
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))
    sched = make_schedule(get_named_beta_schedule(
        cfg.diffusion.beta_schedule, cfg.diffusion.num_steps))
    state = create_train_state(cfg, variables)
    step = make_train_step(cfg, sched)

    B, T = batch, cfg.data.n_poses
    rs = np.random.RandomState(0)
    batch_data = {
        "motion": jnp.asarray(rs.randn(B, T, cfg.model.motion_dim),
                              jnp.float32),
        "mel": jnp.asarray(rs.randn(B, T, cfg.model.audio_dim), jnp.float32),
        "pid": jax.nn.one_hot(jnp.arange(B) % cfg.model.style_dim,
                              cfg.model.style_dim),
        "hubert": jnp.asarray(rs.randn(B, T, cfg.model.hubert_dim),
                              jnp.float32),
        "sem": jnp.ones((B, T)) * 0.5,
    }

    state, terms = step(state, batch_data, jax.random.PRNGKey(1))
    jax.block_until_ready(state.params)

    times = []
    for i in range(8):
        t0 = time.perf_counter()
        state, terms = step(state, batch_data, jax.random.PRNGKey(i + 2))
        jax.block_until_ready(terms.total)
        times.append(time.perf_counter() - t0)

    dt = min(times)
    print(f"batch {B}: {dt*1e3:.1f} ms/step -> {B/dt:.0f} windows/s "
          f"({B*T/dt:.0f} frames/s), loss={float(terms.total):.2f}",
          file=sys.stderr)
    import json
    print(json.dumps({
        "metric": "beat_train_windows_per_s",
        "value": round(B / dt, 1),
        "unit": "windows/s",
        "batch": B,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
