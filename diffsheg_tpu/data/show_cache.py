"""SHOW / TalkSHOW cache builder.

The reference consumes a pre-built LMDB produced by external TalkSHOW
tooling (reference datasets/show.py:30, README.md:148); there is no in-repo
builder.  Here the builder is first-class: it ingests per-sequence SMPL-X
arrays (raw 165-d pose, 100-d expression, 16 kHz audio, speaker id), windows
them into ``n_poses``-frame clips (88 @ 30 fps for the shipped config), computes
the mel conditioning on-device, and writes the memory-mapped cache that
:class:`diffsheg_tpu.data.show.ShowDataset` reads.

Input sources:
  - :func:`iter_npz_dir` — a directory of ``.npz`` files with keys
    {pose, expression, audio, speaker};
  - any iterable of dicts with those keys (e.g. adapters over the TalkSHOW
    pickles).
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, Iterable, Iterator, Optional

import numpy as np

from diffsheg_tpu.data.cache import CacheWriter


@dataclasses.dataclass
class ShowBuildConfig:
    n_poses: int = 88            # training window (reference runner.py:196)
    stride: int = 10
    pose_fps: float = 30.0
    audio_sr: int = 16000
    mel_sr: int = 18000
    mel_hop: int = 600           # mel_sr / fps
    n_mels: int = 128
    n_mfcc: int = 64             # --audio_feat mfcc dims (runner.py:210-211)
    num_speakers: int = 4
    speaker_id_offset: int = 20  # reference ids 20..23 -> one-hot 0..3
                                 # (ddpm_show_trainer.py:385 'speaker-20')


def iter_npz_dir(path: str) -> Iterator[Dict[str, np.ndarray]]:
    for f in sorted(glob.glob(os.path.join(path, "*.npz"))):
        with np.load(f, allow_pickle=False) as z:
            yield {k: z[k] for k in ("pose", "expression", "audio", "speaker")}


def _mel(audio_windows: np.ndarray, cfg: ShowBuildConfig, n_poses: int
         ) -> np.ndarray:
    from diffsheg_tpu.audio.mel import MelFrontend
    from diffsheg_tpu.audio.wav import resample_poly

    res = np.stack([resample_poly(a, cfg.audio_sr, cfg.mel_sr)
                    for a in audio_windows])
    frontend = MelFrontend(sr=cfg.mel_sr, hop=cfg.mel_hop,
                           n_mels=cfg.n_mels, drop_last=False)
    return np.asarray(frontend(res))[:, :n_poses]


def _mfcc(audio_windows: np.ndarray, cfg: ShowBuildConfig, n_poses: int
          ) -> np.ndarray:
    from diffsheg_tpu.audio.mfcc import MfccFrontend
    from diffsheg_tpu.audio.wav import resample_poly

    res = np.stack([resample_poly(a, cfg.audio_sr, cfg.mel_sr)
                    for a in audio_windows])
    frontend = MfccFrontend(sr=cfg.mel_sr, hop=cfg.mel_hop,
                            n_mels=cfg.n_mels, n_mfcc=cfg.n_mfcc,
                            drop_last=False)
    return np.asarray(frontend(res))[:, :n_poses]


def build_show_cache(
    sequences: Iterable[Dict[str, np.ndarray]],
    out_dir: str,
    cfg: Optional[ShowBuildConfig] = None,
    is_test: bool = False,
    log=print,
) -> int:
    """Window SMPL-X sequences into the ShowDataset cache.  Returns count.

    Each sequence dict: pose (T, 165) float, expression (T, 100) float,
    audio (N,) float 16 kHz, speaker scalar int (raw TalkSHOW id or 0-based).
    Test split stores whole clips (ragged), mirroring the BEAT convention.
    """
    cfg = cfg or ShowBuildConfig()
    writer = CacheWriter(out_dir, meta={
        "n_poses": cfg.n_poses, "stride": cfg.stride, "is_test": is_test,
        "fps": cfg.pose_fps,
    })

    for si, seq in enumerate(sequences):
        pose = np.asarray(seq["pose"], dtype=np.float32)
        expr = np.asarray(seq["expression"], dtype=np.float32)
        audio = np.asarray(seq["audio"], dtype=np.float32)
        spk = int(np.asarray(seq["speaker"]).reshape(()))
        if spk >= cfg.speaker_id_offset:
            spk -= cfg.speaker_id_offset
        one_hot = np.eye(cfg.num_speakers,
                         dtype=np.float32)[spk % cfg.num_speakers]

        T = min(pose.shape[0], expr.shape[0],
                int(len(audio) / cfg.audio_sr * cfg.pose_fps))
        if is_test:
            length, stride = T, T
        else:
            length, stride = cfg.n_poses, cfg.stride
        if T < length:
            log(f"[show-cache] seq {si}: too short ({T} frames), skipped")
            continue

        num_windows = (T - length) // stride + 1
        audio_len = int(length / cfg.pose_fps * cfg.audio_sr)
        p_w, e_w, a_w = [], [], []
        for i in range(num_windows):
            s = i * stride
            a_s = int(s / cfg.pose_fps * cfg.audio_sr)
            p_w.append(pose[s:s + length])
            e_w.append(expr[s:s + length])
            a_w.append(audio[a_s:a_s + audio_len])
        mel = _mel(np.stack(a_w), cfg, length)
        mfcc = _mfcc(np.stack(a_w), cfg, length)
        for i in range(num_windows):
            writer.add({
                "pose": p_w[i],
                "expression": e_w[i],
                "mel": mel[i].astype(np.float32),
                "mfcc": mfcc[i].astype(np.float32),
                "speaker": one_hot,
                "audio": a_w[i],
            })
        log(f"[show-cache] seq {si}: {num_windows} windows (speaker {spk})")

    writer.finalize()
    log(f"[show-cache] wrote {len(writer)} samples to {out_dir}")
    return len(writer)


def compute_show_stats(sequences: Iterable[Dict[str, np.ndarray]]
                       ) -> Dict[str, np.ndarray]:
    """Mean/std dict in the reference's ``talkshow_mean_std.npy`` layout
    (pose_mean/std over 165 dims, expression_mean/std over 100), consumed by
    :class:`diffsheg_tpu.data.show.ShowStats`."""
    p_sum = p_sq = e_sum = e_sq = None
    n = 0
    for seq in sequences:
        pose = np.asarray(seq["pose"], dtype=np.float64)
        expr = np.asarray(seq["expression"], dtype=np.float64)
        if p_sum is None:
            p_sum = np.zeros(pose.shape[1]); p_sq = np.zeros(pose.shape[1])
            e_sum = np.zeros(expr.shape[1]); e_sq = np.zeros(expr.shape[1])
        m = min(pose.shape[0], expr.shape[0])
        p_sum += pose[:m].sum(0); p_sq += (pose[:m] ** 2).sum(0)
        e_sum += expr[:m].sum(0); e_sq += (expr[:m] ** 2).sum(0)
        n += m
    assert n > 0
    std = lambda sq, s: np.sqrt(np.maximum(sq / n - (s / n) ** 2, 1e-12))
    return {
        "pose_mean": p_sum / n, "pose_std": std(p_sq, p_sum),
        "expression_mean": e_sum / n, "expression_std": std(e_sq, e_sum),
    }
