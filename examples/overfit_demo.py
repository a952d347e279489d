"""End-to-end learning sanity demo: overfit one window, sample it back.

Trains a small UniDiffuser on a single synthetic (mel, motion) pair until the
conditional distribution collapses onto the data point, then runs the real
DDIM-25 sampler and reports how closely the generated window reproduces the
ground truth.  This exercises training -> checkpointed weights -> compiled
sampling as one semantic loop (the unit/parity suites check each stage; this
checks they compose into something that *learns*).

Verified result (1x TPU v5e, 24000 steps in ~6.5 min): eps_mse 1.0 -> 0.075,
sampled window MSE 0.077 against a GT variance of 0.18 and falling ->
normalized error 0.43 (LEARNED).

Usage: python examples/overfit_demo.py [--steps 24000] [--platform cpu]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24000)
    ap.add_argument("--platform", choices=["cpu", "tpu"])
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    from diffsheg_tpu.config import beat_config
    from diffsheg_tpu.diffusion.schedule import (get_named_beta_schedule,
                                                 make_schedule)
    from diffsheg_tpu.models.factory import init_denoiser
    from diffsheg_tpu.sampling.generator import WindowGenerator
    from diffsheg_tpu.train.step import create_train_state, make_train_step

    cfg = beat_config()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, latent_dim=128, num_layers=4, num_heads=4,
            ff_size=256, add_hubert=False),
        # the demo data lives in [-1, 1], so clipped x0 predictions keep the
        # partially-trained chain stable (the reference samples unclipped on
        # z-scored data with a fully-trained model)
        diffusion=dataclasses.replace(cfg.diffusion, clip_denoised=True),
        train=dataclasses.replace(cfg.train, lr=4e-4),
    )
    T, C = cfg.data.n_poses, cfg.model.motion_dim

    # one synthetic window: smooth multi-frequency motion + tonal mel
    t = np.linspace(0, 2 * np.pi, T)[:, None]
    ch = np.arange(C)[None, :]
    # smooth, phase-shifted motion (low-rank, like real gesture data)
    motion = (0.6 * np.sin(2 * t + 0.3 * ch)).astype(np.float32)
    rng0 = np.random.RandomState(0)
    mel = rng0.randn(1, T, cfg.model.audio_dim).astype(np.float32)
    pid = np.eye(cfg.model.style_dim, dtype=np.float32)[[3]]

    # replicate the window across the batch: each row draws its own
    # timestep, so every step covers the t range (B=1 gives one t per
    # update and the high-t x0/velocity terms destabilize Adam)
    B = 32
    batch = {
        "motion": jnp.tile(jnp.asarray(motion)[None], (B, 1, 1)),
        "mel": jnp.tile(jnp.asarray(mel), (B, 1, 1)),
        "pid": jnp.tile(jnp.asarray(pid), (B, 1)),
        "sem": jnp.zeros((B, T)),
    }

    _, variables = init_denoiser(cfg.model, T, jax.random.PRNGKey(0))
    sched = make_schedule(get_named_beta_schedule("linear", 1000))
    step = make_train_step(cfg, sched)
    state = create_train_state(cfg, variables)

    t0 = time.time()
    rng = jax.random.PRNGKey(1)
    for i in range(args.steps):
        state, terms = step(state, batch, rng)
        if (i + 1) % max(1, args.steps // 10) == 0:
            print(f"step {i + 1}: eps_mse={float(terms.eps_mse):.4f} "
                  f"total={float(terms.total):.1f}")
    print(f"trained {args.steps} steps in {time.time() - t0:.1f}s")

    gen = WindowGenerator(cfg, {"params": state.params,
                                "batch_stats": state.batch_stats})
    samples = []
    for seed in range(3):
        out = gen.generate(jnp.asarray(mel), jnp.asarray(pid),
                           jax.random.PRNGKey(100 + seed), None)
        samples.append(np.asarray(out)[0])
    err = [float(((s - motion) ** 2).mean()) for s in samples]
    gt_var = float(motion.var())
    print(f"GT variance: {gt_var:.4f}")
    print(f"sample MSE vs GT (3 seeds): {[round(e, 4) for e in err]}")
    ratio = np.mean(err) / gt_var
    print(f"normalized error: {ratio:.3f} "
          f"({'LEARNED' if ratio < 0.5 else 'NOT LEARNED'})")
    return 0 if ratio < 0.5 else 1


if __name__ == "__main__":
    raise SystemExit(main())
