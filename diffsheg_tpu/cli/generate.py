"""Custom-audio generation pipeline (the flagship inference path).

End-to-end equivalent of the reference's ``test_custom_aud``
(reference trainers/ddpm_beat_trainer.py:1123-1346):

  wav -> [device] mel frontend (18 kHz, hop 1200) + HuBERT features
      -> windowed streaming DDIM+RePaint generation (compiled scans)
      -> [device] de-normalize, axis-angle -> euler degrees
      -> [host] BVH template rewrite + face JSON export

TPU-native differences: the mel frontend and HuBERT run jitted on device; all
speaker styles generate as ONE batch instead of a serial python loop
(ddpm_beat_trainer.py:1189); the per-stage RTF accounting matches the
reference's measurement (frames / (t_mel + t_hubert + t_sampler), :1315).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffsheg_tpu.config import Config
from diffsheg_tpu.utils.profiling import StageTimer


@dataclasses.dataclass
class GenerationResult:
    motion: np.ndarray            # (B, T, motion_dim) normalized model output
    fps: float                    # generated frames per wall-second
    rtf: float                    # real-time factor
    stages: Dict[str, float]      # per-stage seconds


class CustomAudioPipeline:
    """Owns the compiled frontend + sampler for a checkpoint."""

    def __init__(self, cfg: Config, variables,
                 hubert_variables=None,
                 motion_mean: Optional[np.ndarray] = None,
                 motion_std: Optional[np.ndarray] = None):
        from diffsheg_tpu.audio.mel import MelFrontend
        from diffsheg_tpu.sampling.generator import WindowGenerator
        from diffsheg_tpu.sampling.streamer import StreamingGenerator

        self.cfg = cfg
        self.mel_frontend = MelFrontend(
            sr=cfg.data.mel_sr, hop=cfg.data.mel_hop, n_mels=cfg.data.n_mels,
            drop_last=True)
        self.generator = WindowGenerator(cfg, variables)
        self.streamer = StreamingGenerator(self.generator)
        self.motion_mean = motion_mean
        self.motion_std = motion_std
        self._pipe = None  # lazy FusedPipeline (single-dispatch serving)
        self._exporter = None  # lazy BeatMotionExporter (jits kept warm)
        self.hubert_extractor = None
        if cfg.model.add_hubert:
            import sys
            from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor
            if hubert_variables is None:
                print(
                    "WARNING: model.add_hubert is on but no HuBERT weights "
                    "were given — speech features come from a RANDOM-INIT "
                    "encoder. Pass hubert_variables (see "
                    "compat.hubert_ckpt.load_hf_hubert) or set "
                    "model.add_hubert=false.", file=sys.stderr)
            self.hubert_extractor = HubertFeatureExtractor(
                variables=hubert_variables)

    # -- stages ------------------------------------------------------------
    def _load_audio(self, wav_path: str):
        """Host-side load + resample: (mel-rate waveform, 16k waveform or
        None).  The single source of audio-loading conventions for both
        the staged and single-dispatch paths."""
        from diffsheg_tpu.audio.wav import load_wav, resample_poly

        y, sr = load_wav(wav_path)
        y_mel = jnp.asarray(resample_poly(y, sr, self.cfg.data.mel_sr))
        y16 = (jnp.asarray(resample_poly(y, sr, 16000))
               if self.hubert_extractor is not None else None)
        return y_mel, y16

    def prepare_audio(self, wav_path: str, timer: StageTimer):
        """Load + resample host-side, mel + HuBERT on device."""
        y_mel, y16 = self._load_audio(wav_path)
        with timer.stage("mel"):
            mel = self.mel_frontend(y_mel[None])  # (1, T, M)
            mel.block_until_ready()
        T = mel.shape[1]
        hubert = None
        if y16 is not None:
            with timer.stage("hubert"):
                hubert = self.hubert_extractor(y16, target_frames=T)
                hubert.block_until_ready()
        return mel, hubert

    def _sample(self, mel_b, pid, rng, hub_b):
        if self.cfg.stream.same_overlap_noisy:
            return self.streamer.generate(mel_b, pid, rng, hub_b)
        return self.streamer.generate_fused(mel_b, pid, rng, hub_b)

    def generate(self, wav_path: str, speaker_ids: Sequence[int],
                 seed: int = 0) -> GenerationResult:
        """Generate all requested speaker styles in one batch.

        With ``stream.single_dispatch`` (the default) the whole device
        pipeline — mel, HuBERT, windowed sampler — runs as ONE compiled
        program (sampling/pipeline.py): a clip costs a single dispatch.
        ``--set stream.single_dispatch=false`` restores the staged path
        with the reference-style per-stage RTF breakdown
        (ddpm_beat_trainer.py:1233-1315).
        """
        timer = StageTimer()
        pid = jax.nn.one_hot(jnp.asarray(speaker_ids),
                             self.cfg.model.style_dim)
        if getattr(self.cfg.stream, "single_dispatch", False) \
                and not self.cfg.stream.same_overlap_noisy:
            y_mel, y16 = self._load_audio(wav_path)
            if self._pipe is None:
                from diffsheg_tpu.sampling.pipeline import FusedPipeline
                self._pipe = FusedPipeline(self.streamer, self.mel_frontend,
                                           self.hubert_extractor)
            with timer.stage("pipeline"):
                out = self._pipe(y_mel[None],
                                 None if y16 is None else y16[None],
                                 pid, jax.random.PRNGKey(seed))
                out.block_until_ready()
        else:
            mel, hubert = self.prepare_audio(wav_path, timer)
            B = len(speaker_ids)
            mel_b = jnp.tile(mel, (B, 1, 1))
            hub_b = jnp.tile(hubert, (B, 1, 1)) if hubert is not None else None
            with timer.stage("sampler"):
                out = self._sample(mel_b, pid, jax.random.PRNGKey(seed),
                                   hub_b)
                out.block_until_ready()
        T = out.shape[1]
        return GenerationResult(
            motion=np.asarray(out),
            fps=timer.fps(T),
            rtf=timer.rtf(T, self.cfg.data.fps),
            stages=timer.report(),
        )

    def warmup(self, seconds: float, num_speakers: int = 1,
               sr: int = 16000) -> None:
        """Trigger every jit compile with synthetic audio of the target
        length, so subsequent :meth:`generate` timings measure steady-state
        serving (first-call timings are compile-dominated; the reference's
        RTF print has no compile phase to exclude because torch is eager)."""
        import tempfile, wave as wave_mod
        t = np.arange(int(seconds * sr)) / sr
        sig = (0.1 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            with wave_mod.open(f.name, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes((sig * 32767).astype("<i2").tobytes())
            self.generate(f.name, list(range(num_speakers)), seed=0)

    # -- postprocess / export ---------------------------------------------
    def export_beat(self, motion: np.ndarray, out_dir: str, name: str,
                    template_bvh: Optional[str] = None,
                    player: bool = False) -> List[str]:
        """De-normalize, convert to euler degrees, write BVH + face JSON
        (reference ddpm_beat_trainer.py:1322-1341); ``player`` adds the
        self-contained HTML viewer per clip."""
        from diffsheg_tpu.sampling.export import BeatMotionExporter

        assert self.motion_mean is not None, "need dataset stats for export"
        # one exporter per pipeline: its axis-angle->euler jit stays warm
        # across clips instead of retracing per export
        if self._exporter is None or \
                self._exporter.template_bvh != template_bvh or \
                self._exporter.player != player:
            self._exporter = BeatMotionExporter(
                self.cfg.model.pose_dim, self.cfg.data.fps,
                self.motion_mean, self.motion_std, template_bvh,
                player=player)
        exporter = self._exporter
        written: List[str] = []
        for b in range(motion.shape[0]):
            written += exporter.export(motion[b], out_dir, f"{name}_{b}")
        return written

    def export_show(self, motion: np.ndarray, out_dir: str, name: str,
                    stats=None) -> List[str]:
        """SHOW export: inv-standardize and save npy (reference
        ddpm_show_trainer.py:913-935; visualization is external)."""
        os.makedirs(out_dir, exist_ok=True)
        written = []
        for b in range(motion.shape[0]):
            out = motion[b]
            if stats is not None:
                from diffsheg_tpu.data.show import inv_standardize
                out = inv_standardize(out, stats.motion_mean, stats.motion_std)
            p = os.path.join(out_dir, f"{name}_{b}.npy")
            np.save(p, out)
            written.append(p)
        return written
