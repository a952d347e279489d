"""Multi-epoch convergence demonstration (synthetic-but-learnable data).

The reference's training evidence is its published checkpoints; this
environment has no BEAT/SHOW corpora, so convergence is demonstrated on a
synthetic dataset where motion IS a deterministic function of the audio and
speaker — exactly the structure the denoiser must learn:

    motion[b, t] = tanh(mel[b, t] @ W + offset[speaker_b])

(W and the speaker offsets are fixed random matrices).  A conditional
diffusion model that uses its audio pathway drives val MSE toward the
deterministic floor; one that ignores conditioning cannot beat the marginal
variance.  The run goes through the production ``Trainer.fit`` loop with
eval cadence (DDIM sampling + FGD/MSE/PCK, ddpm_beat_trainer.py:340-653),
so it also exercises, on a real downward trend:

  - best-checkpoint rotation (``CheckpointManager.update_best``),
  - mid-run resume (a fresh ``Trainer`` + ``try_resume`` continues the
    trend rather than restarting it),
  - the metric logger's JSONL curves.

Run:  python examples/convergence_demo.py [epochs]   (default 60, CPU ok)
Writes <workdir>/metrics.jsonl and prints the eval curve; the committed
curve from a 240-epoch run lives in ``examples/curves/convergence.json``:
val MSE 1263 -> 1.9 (665x), FGD 46794 -> 23, diversity contracting to the
target distribution's.

PCK@0.5 rises 0.004 -> 0.016 and then plateaus — a measured CEILING of
the metric at this scale, not a training stall, and the curve carries
the evidence both ways:

  * the metric responds to training where it can: the diagnostic
    ``val_pck2`` track (same statistic, threshold 2.0) climbs
    0.26 -> 0.70 over the same run before saturating at the sampling
    floor;
  * the @0.5 plateau is exactly where the floor puts it: the threshold
    asks for per-joint 3-channel L2 error < 0.5 (per-channel RMSE
    < 0.29); with the demo model's DDIM-10 conditional-mean floor of
    val MSE ~1.3-1.9 per channel, an isotropic-residual model predicts
    PCK@0.5 = P(chi2_3 < 0.25/mse) ~ 0.012-0.017 — the measured value
    (0.016) sits inside that band (``tests/test_convergence.py::
    TestPckCeiling`` pins the prediction against the committed curve).

So all four tracked metrics either converge or are quantitatively
explained; nothing is flat for an unknown reason.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from typing import Dict, List, Optional

import numpy as np


def make_config(eval_every: int = 10):
    from diffsheg_tpu.config import (Config, DiffusionConfig, ModelConfig,
                                     TrainConfig)
    cfg = Config(
        model=ModelConfig(
            pose_dim=8, expression_dim=4, latent_dim=32, num_layers=2,
            num_heads=4, ff_size=64, audio_dim=16, aud_latent_dim=16,
            style_dim=4, add_hubert=False, encode_hubert=False),
        diffusion=DiffusionConfig(num_steps=100, respacing="ddim10"),
        train=TrainConfig(batch_size=32, lr=4e-4, log_every=4,
                          eval_every_epochs=eval_every, save_every_epochs=0,
                          use_sem_weighting=False, seed=0),
    )
    # 12 frames: the smallest window the FGD conv tower (k3,k3,k4s2,k3
    # VALID) still maps to >=1 output frame
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, n_poses=12))
    return cfg


class AudioDrivenDataset:
    """motion = tanh(mel @ W + speaker_offset): learnable, deterministic."""

    def __init__(self, cfg, n: int = 256, seed: int = 0):
        m = cfg.model
        T = cfg.data.n_poses
        rng = np.random.RandomState(seed)
        # smooth per-sample audio: random fourier series over the window
        t = np.linspace(0.0, 1.0, T)[None, :, None]
        freq = rng.uniform(0.5, 3.0, size=(n, 1, m.audio_dim))
        phase = rng.uniform(0, 2 * np.pi, size=(n, 1, m.audio_dim))
        mel = np.sin(2 * np.pi * freq * t + phase).astype(np.float32)
        W = rng.randn(m.audio_dim, m.motion_dim).astype(np.float32) * 0.6
        offsets = rng.randn(m.style_dim, m.motion_dim).astype(np.float32) * .3
        sid = rng.randint(0, m.style_dim, size=n)
        motion = np.tanh(mel @ W + offsets[sid][:, None, :])
        self.data = {
            "motion": motion.astype(np.float32),
            "mel": mel,
            "id": sid.reshape(n, 1).astype(np.int32),
        }
        self.n = n

    def __len__(self):
        return self.n

    def batch(self, idx):
        return {k: v[idx] for k, v in self.data.items()}


def run(workdir: str, num_epochs: int = 60, eval_every: int = 10,
        resume_at: Optional[int] = None, n_train: int = 256,
        n_val: int = 64) -> List[Dict[str, float]]:
    """Train with eval cadence; returns the eval curve (list of dicts).

    ``resume_at`` splits the run into fit(resume_at) + a FRESH Trainer that
    ``try_resume``s and fits to ``num_epochs`` — the mid-run resume check.
    """
    import jax
    from diffsheg_tpu.data.loader import ShardedBatchLoader
    from diffsheg_tpu.eval.fgd_net import FgdFeatureNet, FgdNetConfig
    from diffsheg_tpu.train.trainer import Trainer

    cfg = make_config(eval_every)
    train_ds = AudioDrivenDataset(cfg, n=n_train, seed=0)
    val_ds = AudioDrivenDataset(cfg, n=n_val, seed=1)
    train_loader = ShardedBatchLoader(
        train_ds, global_batch_size=cfg.train.batch_size, prefetch=0)
    val_loader = ShardedBatchLoader(val_ds, global_batch_size=n_val,
                                    prefetch=0, shuffle=False)

    # random-init FGD feature net: Frechet distance in a fixed random
    # feature space still contracts as the generated distribution
    # approaches the data distribution
    net = FgdFeatureNet(FgdNetConfig(n_frames=cfg.data.n_poses,
                                     pose_dim=cfg.model.motion_dim))
    fgd_vars = net.init(jax.random.PRNGKey(7),
                        np.zeros((1, cfg.data.n_poses,
                                  cfg.model.motion_dim), np.float32))

    def build():
        return Trainer(cfg, workdir, fgd_variables=fgd_vars)

    tr = build()
    tr.try_resume()
    phases = [num_epochs] if resume_at is None else [resume_at, num_epochs]
    for end in phases:
        if tr.epoch < end:
            tr.fit(train_loader, val_loader, num_epochs=end)
        if end != phases[-1]:
            tr = build()             # fresh process-equivalent: must resume
            assert tr.try_resume(), "mid-run resume found no checkpoint"
            assert tr.epoch == end

    # read back the eval curve from the logger's JSONL
    curve = []
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "val_mse" in rec:
                curve.append(rec)
    return curve


def main():
    # CPU-scale demo: force the CPU backend (the axon TPU plugin ignores
    # JAX_PLATFORMS, so set it through jax.config) and make the repo
    # importable when run as `python examples/convergence_demo.py`
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    workdir = os.environ.get("CONV_DEMO_DIR", "/tmp/convergence_demo")
    curve = run(workdir, num_epochs=epochs, resume_at=epochs // 2)
    for row in curve:
        print(json.dumps(row))
    first, last = curve[0], curve[-1]
    print(json.dumps({
        "metric": "convergence_val_mse_ratio",
        "value": round(last["val_mse"] / first["val_mse"], 4),
        "unit": "final/first",
        "evals": len(curve),
    }))
    out = os.path.join(os.path.dirname(__file__), "curves",
                       "convergence.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"epochs": epochs, "curve": curve}, f, indent=1)
    print("curve ->", out)


if __name__ == "__main__":
    main()
