"""Trainer loop integration: fit a tiny model for 2 epochs on synthetic
data, checkpoint, resume, evaluate."""

import dataclasses
import os

import numpy as np
import pytest

import jax

from diffsheg_tpu.config import beat_config
from diffsheg_tpu.data.loader import ShardedBatchLoader
from diffsheg_tpu.train.trainer import Trainer


def tiny_cfg(tmp):
    cfg = beat_config()
    return cfg.replace(
        model=dataclasses.replace(
            cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
            hubert_latent_dim=16, add_hubert=False),
        data=dataclasses.replace(cfg.data, n_poses=8),
        train=dataclasses.replace(
            cfg.train, batch_size=8, num_epochs=2, log_every=1,
            save_every_epochs=0, eval_every_epochs=0,
            checkpoints_dir=str(tmp)),
    )


class _SynthDs:
    """16 synthetic windows with the BeatDataset batch contract."""

    def __init__(self, cfg, n=16, T=8):
        rng = np.random.RandomState(0)
        m = cfg.model
        S = int(T / cfg.data.fps * cfg.data.audio_sr)
        self.data = {
            "motion": rng.randn(n, T, m.motion_dim).astype(np.float32) * .5,
            "mel": rng.randn(n, T, m.audio_dim).astype(np.float32),
            # raw 16 kHz window audio (the cache stores it; only read when
            # train.on_device_frontend is on)
            "audio": (rng.randn(n, S) * 0.1).astype(np.float32),
            "sem": rng.rand(n, T).astype(np.float32),
            "id": rng.randint(0, m.style_dim, size=(n, 1)).astype(np.int32),
        }
        self.n = n

    def __len__(self):
        return self.n

    def batch(self, idx):
        return {k: v[idx] for k, v in self.data.items()}


class TestTrainerFit:
    def test_fit_two_epochs_and_resume(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        ds = _SynthDs(cfg)
        loader = ShardedBatchLoader(ds, global_batch_size=8, prefetch=0)

        tr = Trainer(cfg, str(tmp_path / "run"))
        assert not tr.try_resume()  # nothing to resume yet
        tr.fit(loader, num_epochs=2)
        assert tr.epoch == 2
        assert tr.total_it == 4  # 2 batches/epoch * 2 epochs
        assert os.path.exists(tmp_path / "run" / "metrics.jsonl")

        # fresh trainer resumes at epoch 2 with identical params
        tr2 = Trainer(cfg, str(tmp_path / "run"))
        assert tr2.try_resume()
        assert tr2.epoch == 2
        a = jax.tree.leaves(tr.state.params)[0]
        b = jax.tree.leaves(tr2.state.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        # fit is a no-op when already at num_epochs
        tr2.fit(loader, num_epochs=2)
        assert tr2.epoch == 2

    def test_evaluate_runs(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        ds = _SynthDs(cfg)
        loader = ShardedBatchLoader(ds, global_batch_size=8, prefetch=0,
                                    shuffle=False)
        tr = Trainer(cfg, str(tmp_path / "run2"))
        res = tr.evaluate(loader, jax.random.PRNGKey(0), max_batches=1)
        assert np.isfinite(res.mse)
        assert np.isfinite(res.pck)
        assert np.isfinite(res.diversity)
        assert np.isnan(res.fgd)  # no FGD net provided


class TestOnDeviceFrontend:
    """train.on_device_frontend: the trainer ships raw int16 audio and the
    compiled step (and eval) derive mel on device (audio/frontend.py)."""

    def test_fit_and_evaluate_with_frontend(self, tmp_path):
        import dataclasses as dc
        cfg = tiny_cfg(tmp_path)
        cfg = cfg.replace(train=dc.replace(cfg.train,
                                           on_device_frontend=True))
        ds = _SynthDs(cfg)
        loader = ShardedBatchLoader(ds, global_batch_size=8, prefetch=0,
                                    shuffle=False)
        tr = Trainer(cfg, str(tmp_path / "run_fe"))
        tr.fit(loader, num_epochs=1)
        assert tr.epoch == 1
        res = tr.evaluate(loader, jax.random.PRNGKey(0), max_batches=1)
        assert np.isfinite(res.mse)
        assert np.isfinite(res.pck)

    def test_missing_audio_field_raises(self, tmp_path):
        import dataclasses as dc
        cfg = tiny_cfg(tmp_path)
        cfg = cfg.replace(train=dc.replace(cfg.train,
                                           on_device_frontend=True))
        tr = Trainer(cfg, str(tmp_path / "run_fe2"))
        with pytest.raises(ValueError, match="on_device_frontend"):
            tr._to_model_batch({"motion": np.zeros((2, 8, 1)),
                                "id": np.zeros((2, 1), np.int32)})


class TestShowTraining:
    def test_show_config_train_step(self, tmp_path):
        """SHOW preset (CFG training, speaker one-hot, no sem weighting)
        drives the trainer end to end on synthetic data."""
        import dataclasses
        from diffsheg_tpu.config import show_config
        from diffsheg_tpu.data.loader import ShardedBatchLoader

        cfg = show_config()
        cfg = cfg.replace(
            model=dataclasses.replace(
                cfg.model, latent_dim=32, num_layers=1, num_heads=2,
                ff_size=64, add_hubert=False),
            data=dataclasses.replace(cfg.data, n_poses=8),
            train=dataclasses.replace(
                cfg.train, batch_size=8, num_epochs=1, log_every=1,
                save_every_epochs=0, eval_every_epochs=0),
        )

        class _ShowSynth:
            def __init__(self, m, n=8, T=8):
                rng = np.random.RandomState(0)
                self.d = {
                    "motion": rng.randn(n, T, m.motion_dim).astype(np.float32),
                    "mel": rng.randn(n, T, m.audio_dim).astype(np.float32),
                    "speaker": np.eye(m.style_dim, dtype=np.float32)[
                        rng.randint(0, m.style_dim, n)],
                }
                self.n = n

            def __len__(self):
                return self.n

            def batch(self, idx):
                return {k: v[idx] for k, v in self.d.items()}

        ds = _ShowSynth(cfg.model)
        tr = Trainer(cfg, str(tmp_path / "show_run"))
        tr.fit(ShardedBatchLoader(ds, global_batch_size=8, prefetch=0),
               num_epochs=1)
        assert tr.total_it == 1


class TestTextEmoTraining:
    def test_train_step_with_text_emo_conditioning(self, tmp_path):
        """Regression: _to_model_batch must supply word/emo when the
        conditioning flags are on (the jitted step reads them)."""
        import dataclasses
        from diffsheg_tpu.config import beat_config
        from diffsheg_tpu.train.trainer import Trainer

        cfg = beat_config()
        cfg = cfg.replace(
            model=dataclasses.replace(
                cfg.model, latent_dim=16, num_layers=1, num_heads=2,
                ff_size=32, add_hubert=False, add_text_cond=True,
                add_emo_cond=True, word_f=12, emotion_f=6, word_vocab=64),
            data=dataclasses.replace(cfg.data, n_poses=8))
        tr = Trainer(cfg, str(tmp_path))
        B, T = 4, 8
        rs = np.random.RandomState(0)
        batch = {
            "motion": rs.randn(B, T, cfg.model.motion_dim).astype(np.float32),
            "mel": rs.randn(B, T, cfg.model.audio_dim).astype(np.float32),
            "id": np.arange(B, dtype=np.int32),
            "word": rs.randint(0, 64, (B, T)).astype(np.int32),
            "emo": rs.randint(0, 8, (B, T)).astype(np.int32),
        }
        mb = tr._to_model_batch(batch)
        assert mb["word"].shape == (B, T) and mb["emo"].shape == (B, T)
        from diffsheg_tpu.diffusion.schedule import (get_named_beta_schedule,
                                                     make_schedule)
        from diffsheg_tpu.train.step import make_train_step
        sched = make_schedule(get_named_beta_schedule(
            cfg.diffusion.beta_schedule, cfg.diffusion.num_steps))
        step = make_train_step(cfg, sched)
        _, terms = step(tr.state, mb, jax.random.PRNGKey(0))
        assert np.isfinite(float(terms.total))
        # a batch WITHOUT labels still steps (zeros fallback)
        batch2 = {k: v for k, v in batch.items() if k not in ("word", "emo")}
        mb2 = tr._to_model_batch(batch2)
        assert (mb2["word"] == 0).all() and mb2["emo"].shape == (B, T)


def test_trainer_dumps_resolved_config(tmp_path):
    """Trainer persists the resolved config as <workdir>/config.json — the
    reference's opt.txt (options/base_options.py:166-176)."""
    import json as _json
    from diffsheg_tpu.config import Config, ModelConfig, DiffusionConfig
    from diffsheg_tpu.train.trainer import Trainer

    cfg = Config(
        model=ModelConfig(pose_dim=6, expression_dim=4, latent_dim=16,
                          num_layers=1, num_heads=2, ff_size=32,
                          audio_dim=8, aud_latent_dim=8, style_dim=2,
                          add_hubert=False, encode_hubert=False),
        diffusion=DiffusionConfig(num_steps=50, respacing=""),
    )
    wd = str(tmp_path / "run")
    Trainer(cfg, wd)
    with open(f"{wd}/config.json") as f:
        dumped = _json.load(f)
    assert dumped["model"]["latent_dim"] == 16
    assert dumped["diffusion"]["num_steps"] == 50
