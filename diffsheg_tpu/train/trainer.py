"""Training driver: epochs, logging, periodic eval, checkpoint policy.

The TPU-native re-design of the reference trainer loop (reference
trainers/ddpm_beat_trainer.py:340-653):

  - one jitted data-parallel train step (train/step.py) — DDP, grad
    all-reduce and the optimizer all live inside the compiled program;
  - host keeps only the epoch loop, the input pipeline (data/loader.py) and
    metric aggregation; under multi-process JAX the loss is already a global
    value (computed on sharded arrays), so the reference's AverageMeter
    ``dist.all_reduce`` (ddpm_beat_trainer.py:1504-1514) has no analogue —
    the mean over the global batch IS the reduced value;
  - periodic eval (eval_every_epochs): DDIM-25 windows via the compiled
    sampler, FGD / MSE / PCK / diversity (ddpm_beat_trainer.py:486-642);
  - checkpoints every epoch (latest), every save_every_epochs (tagged) and on
    best FGD/MSE/PCK (train/checkpoint.py);
  - velocity/x0 loss terms gate on epoch >= vel_loss_start
    (ddpm_beat_trainer.py:241-257 epoch gate).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffsheg_tpu.config import Config
from diffsheg_tpu.data.loader import ShardedBatchLoader
from diffsheg_tpu.diffusion.schedule import get_named_beta_schedule, make_schedule
from diffsheg_tpu.models.factory import init_denoiser
from diffsheg_tpu.parallel.mesh import make_mesh, shard_batch
from diffsheg_tpu.train.checkpoint import CheckpointManager
from diffsheg_tpu.train.step import TrainState, create_train_state, make_train_step
from diffsheg_tpu.utils.logging import MetricLogger


@dataclasses.dataclass
class EvalResult:
    fgd: float = float("nan")
    mse: float = float("nan")
    pck: float = float("nan")
    # PCK at a 2.0 threshold — diagnostic companion to the harness metric.
    # pck (@0.5, reference ddpm_beat_trainer.py:598) is in normalized
    # units: a joint counts only when its 3-channel L2 error is < 0.5,
    # i.e. per-channel RMSE < 0.29 — far below the sampling floor of
    # small/early models, where pck@0.5 sits near its chi-square ceiling
    # P(chi2_3 < 0.25/mse) and barely moves (examples/convergence_demo.py
    # documents the measured ceiling).  pck2 responds across the whole
    # training trajectory, separating "metric at its floor-imposed
    # ceiling" from "model not learning".  Best-checkpoint rotation still
    # tracks the harness pck.
    pck2: float = float("nan")
    diversity: float = float("nan")

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


class Trainer:
    """Owns mesh, compiled steps, checkpoint manager and the epoch loop."""

    def __init__(self, cfg: Config, workdir: str,
                 fgd_variables: Optional[Any] = None,
                 logger: Optional[MetricLogger] = None,
                 hubert_variables: Optional[Any] = None):
        self.cfg = cfg
        self.workdir = workdir
        if cfg.train.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.mesh = make_mesh(cfg.mesh)
        self.logger = logger or MetricLogger(workdir, name=cfg.name)

        self.model, variables = init_denoiser(
            cfg.model, cfg.data.n_poses, jax.random.PRNGKey(cfg.train.seed))
        self.schedule = make_schedule(get_named_beta_schedule(
            cfg.diffusion.beta_schedule, cfg.diffusion.num_steps))

        with self.mesh:
            self.state: TrainState = create_train_state(cfg, variables,
                                                        mesh=self.mesh)
        frontend = None
        if cfg.train.on_device_frontend:
            from diffsheg_tpu.audio.frontend import make_speech_frontend
            frontend = make_speech_frontend(cfg, hubert_variables)
        self._frontend = frontend
        # the frontend runs as its OWN jit feeding the unchanged train
        # step (train_epoch and evaluate both call it): fusing it into the
        # step program made the XLA compile pathological (>30 min vs ~80 s
        # for the pieces — measured on the v5e backend), and the split
        # costs one extra dispatch per step.  make_train_step still
        # accepts frontend= for the fused variant (tests pin equality).
        self._frontend_jit = jax.jit(frontend) if frontend else None
        # two step variants: epoch-gated velocity/x0 terms
        self._step_full = make_train_step(cfg, self.schedule, mesh=self.mesh,
                                          vel_loss_active=True)
        self._step_eps = make_train_step(cfg, self.schedule, mesh=self.mesh,
                                         vel_loss_active=False)
        self.ckpt = CheckpointManager(f"{workdir}/ckpt")
        self.epoch = 0
        self.total_it = 0
        self.fgd_variables = fgd_variables
        self._generator = None  # built lazily at first eval
        # persist the resolved config (the reference's opt.txt,
        # options/base_options.py:166-176); process 0 only
        if jax.process_index() == 0:
            os.makedirs(workdir, exist_ok=True)
            with open(os.path.join(workdir, "config.json"), "w") as f:
                f.write(cfg.to_json())

    # -- checkpoint --------------------------------------------------------
    def try_resume(self) -> bool:
        """Resume from the newest checkpoint (reference --resume,
        ddpm_beat_trainer.py:349-354)."""
        restored = self.ckpt.restore_latest(
            jax.tree.map(np.asarray, self.state))
        if restored is None:
            return False
        state, meta = restored
        self.state = jax.tree.map(jnp.asarray, state)
        self.epoch = int(meta.get("epoch", 0))
        self.total_it = int(meta.get("total_it", 0))
        if self.cfg.train.reset_lr:
            from diffsheg_tpu.train.step import reset_learning_rate
            self.state = self.state._replace(opt_state=reset_learning_rate(
                self.state.opt_state, self.cfg.train.lr))
            self.logger.log_text(f"reset_lr: optimizer lr forced to "
                                 f"{self.cfg.train.lr}")
        self.logger.log_text(f"resumed at epoch {self.epoch} "
                             f"(it {self.total_it})")
        return True

    def _meta(self) -> Dict:
        return {"epoch": self.epoch, "total_it": self.total_it,
                "config": self.cfg.to_json()}

    # -- core loops --------------------------------------------------------
    def train_epoch(self, loader: ShardedBatchLoader,
                    rng: jax.Array) -> Dict[str, float]:
        cfg = self.cfg.train
        vel_on = (cfg.vel_loss_start >= 0
                  and self.epoch >= cfg.vel_loss_start) or cfg.vel_loss_start < 0
        step_fn = self._step_full if vel_on else self._step_eps
        loader.set_epoch(self.epoch)
        sums: Dict[str, float] = {}
        count = 0
        t0 = time.time()
        with self.mesh:
            for batch in loader:
                batch = shard_batch(self.mesh, self._to_model_batch(batch))
                if self._frontend_jit is not None:
                    batch = self._frontend_jit(batch)
                self.state, terms = step_fn(self.state, batch, rng)
                self.total_it += 1
                count += 1
                if cfg.debug and count >= 1:  # smoke mode: one batch
                    break
                if self.total_it % cfg.log_every == 0:
                    vals = {k: float(v) for k, v in terms._asdict().items()}
                    for k, v in vals.items():
                        sums[k] = sums.get(k, 0.0) + v
                    self.logger.log_metrics(
                        step=self.total_it,
                        metrics={**vals, "epoch": self.epoch,
                                 "it_per_s": count / (time.time() - t0)})
        self.epoch += 1
        n = max(1, count // max(1, cfg.log_every))
        return {k: v / n for k, v in sums.items()}

    def _to_model_batch(self, batch: Dict[str, np.ndarray]
                        ) -> Dict[str, np.ndarray]:
        """Dataset dict -> train-step contract {motion, mel, pid, hubert?, sem?}
        (assembly the reference does inline, ddpm_beat_trainer.py:383-441)."""
        mode = self.cfg.model.branch_mode
        if mode == "expression_only" and "facial" in batch:
            motion = batch["facial"]
        elif mode in ("gesture_only", "exp_condition_gesture") \
                and "pose_axis_angle" in batch:
            motion = batch["pose_axis_angle"]
        else:
            motion = batch["motion"]
        out = {"motion": motion}
        on_device_fe = self.cfg.train.on_device_frontend
        if on_device_fe:
            if "audio" not in batch:
                raise ValueError(
                    "train.on_device_frontend requires the cache's raw "
                    "'audio' field in batches (BeatDataset(..., "
                    "include_audio=True); the cache builder stores it by "
                    "default, data/beat.py)")
            # int16 transport: halves the host->device bytes; the source
            # PCM was int16, so the quantization is below the original
            # recording's own resolution (frontend dequantizes on device)
            out["wave16"] = np.clip(
                np.asarray(batch["audio"], np.float32) * 32768.0,
                -32768, 32767).astype(np.int16)
        else:
            out["mel"] = batch["mel"]
        if mode == "exp_condition_gesture":
            out["exp_cond"] = batch["facial"]
        if "pid" in batch:
            out["pid"] = batch["pid"]
        elif "speaker" in batch:
            out["pid"] = batch["speaker"]
        else:
            ids = batch["id"].reshape(-1).astype(np.int32)
            out["pid"] = np.eye(self.cfg.model.style_dim,
                                dtype=np.float32)[ids % self.cfg.model.style_dim]
        if on_device_fe:
            pass  # the in-step frontend computes mel + hubert from wave16
        elif "hubert" in batch:
            out["hubert"] = batch["hubert"]
        elif self.cfg.model.add_hubert:
            # no cached features: zero conditioning keeps shapes static —
            # but warn once, because the model then learns to ignore its
            # speech pathway (pass a hubert cache or set add_hubert=false)
            if not getattr(self, "_warned_zero_hubert", False):
                self._warned_zero_hubert = True
                self.logger.log_text(
                    "WARNING: model.add_hubert is on but the dataset "
                    "provides no 'hubert' features; training with ZERO "
                    "speech conditioning. Provide --hubert-cache or set "
                    "model.add_hubert=false.")
            B, T = batch["motion"].shape[:2]
            out["hubert"] = np.zeros((B, T, self.cfg.model.hubert_dim),
                                     dtype=np.float32)
        if "sem" in batch:
            out["sem"] = batch["sem"]
        # text/emotion conditioning labels (train/step.py reads these when
        # the flags are on); -1 sentinels clamp to index 0 in the model
        B, T = out["motion"].shape[:2]
        if self.cfg.model.add_text_cond:
            out["word"] = np.asarray(
                batch.get("word", np.zeros((B, T))), dtype=np.int32)
        if self.cfg.model.add_emo_cond:
            out["emo"] = np.asarray(
                batch.get("emo", np.zeros((B, T))), dtype=np.int32)
        return out

    # -- eval --------------------------------------------------------------
    def _get_generator(self):
        if self._generator is None:
            from diffsheg_tpu.sampling.generator import WindowGenerator
            self._generator = WindowGenerator(
                self.cfg,
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats})
        else:
            self._generator.variables = {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats}
        return self._generator

    def evaluate(self, loader: ShardedBatchLoader,
                 rng: jax.Array, max_batches: int = 0) -> EvalResult:
        """DDIM sampling + FGD/MSE/PCK/diversity on the val split
        (reference ddpm_beat_trainer.py:486-642)."""
        from diffsheg_tpu.eval.metrics import diversity as div_fn
        from diffsheg_tpu.eval.metrics import (frechet_from_activations,
                                               mse_pck_channels)

        gen = self._get_generator()
        mses, pcks, pck2s = [], [], []
        # streaming diversity: score each disjoint 50-sample group as it
        # fills instead of retaining every generated batch in memory
        div_carry, carry_n = [], 0
        div_total, div_groups = 0.0, 0
        gen_lat, real_lat = [], []
        fgd_embed = None
        if self.fgd_variables is not None:
            from diffsheg_tpu.eval.fgd_net import FgdFeatureNet, FgdNetConfig
            net = FgdFeatureNet(FgdNetConfig(
                n_frames=self.cfg.data.n_poses,
                pose_dim=self.cfg.model.motion_dim))
            fgd_embed = jax.jit(lambda x: net.apply(self.fgd_variables, x))

        for bi, batch in enumerate(loader):
            if max_batches and bi >= max_batches:
                break
            mb = self._to_model_batch(batch)
            if self._frontend_jit is not None:
                # on-device frontend: derive mel (+hubert) from the raw
                # window audio exactly as the train step does
                feats = self._frontend_jit(
                    {"wave16": jnp.asarray(mb.pop("wave16")),
                     "motion": jnp.asarray(mb["motion"])})
                mb["mel"] = feats["mel"]
                if "hubert" in feats:
                    mb["hubert"] = feats["hubert"]
            rng, k = jax.random.split(rng)
            out = gen.generate(jnp.asarray(mb["mel"]), jnp.asarray(mb["pid"]),
                               k, hubert=jnp.asarray(mb["hubert"])
                               if "hubert" in mb else None)
            out_np = np.asarray(out)
            tgt = np.asarray(mb["motion"])
            m, p = mse_pck_channels(out_np, tgt)
            mses.append(m); pcks.append(p)
            pck2s.append(mse_pck_channels(out_np, tgt,
                                          pck_threshold=2.0)[1])
            div_carry.append(out_np)
            carry_n += len(out_np)
            while carry_n >= 50:
                pool = np.concatenate(div_carry)
                div_total += div_fn(pool[:50], batch=50)
                div_groups += 1
                rest = pool[50:]
                div_carry = [rest] if len(rest) else []
                carry_n = len(rest)
            if fgd_embed is not None:
                gen_lat.append(np.asarray(fgd_embed(out)))
                real_lat.append(np.asarray(fgd_embed(jnp.asarray(tgt))))

        # diversity over 50-sample groups of the pooled outputs — the
        # protocol batch from Ye et al. ECCV'22 (ddpm_beat_trainer.py:601),
        # regardless of the loader's batch size
        if div_groups:
            div_val = div_total / div_groups
        elif div_carry:  # fewer than 50 samples total: one smaller group
            div_val = div_fn(np.concatenate(div_carry), batch=50)
        else:
            div_val = float("nan")
        res = EvalResult(
            mse=float(np.mean(mses)) if mses else float("nan"),
            pck=float(np.mean(pcks)) if pcks else float("nan"),
            pck2=float(np.mean(pck2s)) if pck2s else float("nan"),
            diversity=div_val,
            fgd=(frechet_from_activations(np.concatenate(gen_lat),
                                          np.concatenate(real_lat))
                 if gen_lat else float("nan")),
        )
        self.logger.log_metrics(step=self.total_it,
                                metrics={f"val_{k}": v
                                         for k, v in res.as_dict().items()})
        return res

    # -- top-level fit -----------------------------------------------------
    def fit(self, train_loader: ShardedBatchLoader,
            val_loader: Optional[ShardedBatchLoader] = None,
            num_epochs: Optional[int] = None) -> None:
        cfg = self.cfg.train
        num_epochs = num_epochs or cfg.num_epochs
        rng = jax.random.PRNGKey(cfg.seed + 1)
        while self.epoch < num_epochs:
            rng, k_train, k_eval = jax.random.split(rng, 3)
            losses = self.train_epoch(train_loader, k_train)
            self.logger.log_text(
                f"epoch {self.epoch}/{num_epochs} " +
                " ".join(f"{k}={v:.4f}" for k, v in losses.items()))

            self.ckpt.save_latest(self.epoch, jax.tree.map(np.asarray,
                                                           self.state),
                                  self._meta())
            if cfg.save_every_epochs and \
                    self.epoch % cfg.save_every_epochs == 0:
                self.ckpt.save_tagged(f"epoch_{self.epoch:04d}",
                                      jax.tree.map(np.asarray, self.state),
                                      self._meta())
            if (val_loader is not None and cfg.eval_every_epochs
                    and self.epoch % cfg.eval_every_epochs == 0):
                res = self.evaluate(val_loader, k_eval)
                state_np = jax.tree.map(np.asarray, self.state)
                if np.isfinite(res.fgd):
                    self.ckpt.update_best("fgd", res.fgd, state_np,
                                          self._meta())
                if np.isfinite(res.mse):
                    self.ckpt.update_best("mse", res.mse, state_np,
                                          self._meta())
                if np.isfinite(res.pck):
                    self.ckpt.update_best("pck", res.pck, state_np,
                                          self._meta(), lower_is_better=False)
