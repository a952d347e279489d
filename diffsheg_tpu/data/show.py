"""SHOW / TalkSHOW dataset: SMPL-X channel carpentry + window dataset.

Behavioural port of the reference ShowDataset (reference
datasets/show.py:14-162):

  - the raw 165-d SMPL-X pose vector splits into jaw(3) / leye(3) / reye(3) /
    global_orient(3) / body(63) / hands(90); the body further splits into
    alternating lower/upper groups [6,3,6,3,6,3,6,30]; the model's 129-d
    gesture = 4 upper-spine triplets + final 30 upper dims + 90 hand dims
    (show.py:83-86);
  - the 103-d expression = jaw(3) ++ expression(100) (show.py:86);
  - standardization uses the TalkSHOW mean/std dict, with the quirk preserved
    that the expression *std* vector's first 3 entries are the jaw *mean*
    (show.py:46-47 uses pose_mean for both mean and std of the jaw block);
  - inv_standardize for output de-normalization (show.py:157-162).

The cache side reuses :mod:`diffsheg_tpu.data.cache`.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import numpy as np

from diffsheg_tpu.data.cache import ArrayCache

# SMPL-X layout (show.py:83)
_POSE_SPLITS = (3, 3, 3, 3, 63, 90)       # jaw, leye, reye, global, body, hands
_BODY_SPLITS = (6, 3, 6, 3, 6, 3, 6, 30)  # low1, up1, ..., low4, up4

POSE_DIM_FULL = 165
GESTURE_DIM = 3 + 3 + 3 + 30 + 90         # 129
EXPRESSION_DIM = 3 + 100                  # 103


def split_smplx_pose(pose: np.ndarray) -> Dict[str, np.ndarray]:
    """(..., 165) -> named parts."""
    idx = np.cumsum(_POSE_SPLITS)[:-1]
    jaw, leye, reye, global_orient, body, hands = np.split(pose, idx, axis=-1)
    b_idx = np.cumsum(_BODY_SPLITS)[:-1]
    low1, up1, low2, up2, low3, up3, low4, up4 = np.split(body, b_idx, axis=-1)
    return dict(jaw=jaw, leye=leye, reye=reye, global_orient=global_orient,
                low=(low1, low2, low3, low4), up=(up1, up2, up3, up4),
                hands=hands)


def extract_gesture(pose: np.ndarray) -> np.ndarray:
    """(..., 165) -> (..., 129) upper-body + hands (show.py:83-85)."""
    p = split_smplx_pose(pose)
    up1, up2, up3, up4 = p["up"]
    return np.concatenate([up1, up2, up3, up4, p["hands"]], axis=-1)


def combine_expression(pose: np.ndarray, expression: np.ndarray) -> np.ndarray:
    """jaw(3) ++ expression(100) -> (..., 103) (show.py:86)."""
    jaw = split_smplx_pose(pose)["jaw"]
    return np.concatenate([jaw, expression], axis=-1)


def reassemble_smplx(gesture: np.ndarray, expression103: np.ndarray,
                     template: Optional[np.ndarray] = None) -> np.ndarray:
    """Inverse carpentry: put generated channels back into a full 165-d
    SMPL-X pose vector (rest channels from ``template`` or zero) — the
    reference leaves this to the external TalkSHOW visualizer; natively we
    rebuild the full vector for export."""
    shape = gesture.shape[:-1]
    full = (np.tile(template, shape + (1,)) if template is not None
            else np.zeros(shape + (POSE_DIM_FULL,), dtype=gesture.dtype))
    jaw = expression103[..., :3]
    up = np.split(gesture[..., :39], np.cumsum([3, 3, 3, 30])[:-1], axis=-1)
    hands = gesture[..., 39:]

    full[..., 0:3] = jaw
    # body block starts at 12; lower/upper interleave per _BODY_SPLITS
    off = 12
    sizes = _BODY_SPLITS
    ups = iter(up)
    for k, size in enumerate(sizes):
        if k % 2 == 1:  # upper group
            full[..., off:off + size] = next(ups)
        off += size
    full[..., 75:165] = hands
    return full


@dataclasses.dataclass
class ShowStats:
    """TalkSHOW normalization stats (show.py:42-51)."""

    pose_mean: np.ndarray         # (129,)
    pose_std: np.ndarray
    expression_mean: np.ndarray   # (103,) jaw-mean ++ expression-mean
    expression_std: np.ndarray    # (103,) jaw-MEAN ++ expression-std (quirk)

    @staticmethod
    def from_raw_dict(d: Dict[str, np.ndarray]) -> "ShowStats":
        """From the reference's ``talkshow_mean_std.npy`` dict layout:
        pose_mean/pose_std are 165-d, expression_mean/std 100-d."""
        pose_mean = extract_gesture(d["pose_mean"])
        pose_std = extract_gesture(d["pose_std"])
        jaw_mean = d["pose_mean"][..., :3]
        return ShowStats(
            pose_mean=pose_mean,
            pose_std=pose_std,
            expression_mean=np.concatenate([jaw_mean, d["expression_mean"]],
                                           axis=-1),
            # reference show.py:47 uses pose_mean (not std) for the jaw slot
            expression_std=np.concatenate([jaw_mean, d["expression_std"]],
                                          axis=-1),
        )

    @staticmethod
    def load(path: str) -> "ShowStats":
        d = np.load(path, allow_pickle=True)[()]
        return ShowStats.from_raw_dict(d)

    @property
    def motion_mean(self) -> np.ndarray:
        return np.concatenate([self.pose_mean, self.expression_mean], axis=-1)

    @property
    def motion_std(self) -> np.ndarray:
        return np.concatenate([self.pose_std, self.expression_std], axis=-1)


def standardize(x: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    return (x - mean) / std


def inv_standardize(x: np.ndarray, mean: np.ndarray, std: np.ndarray
                    ) -> np.ndarray:
    """(show.py:157-162); used on generated output before export
    (ddpm_show_trainer.py:719-724,913-918)."""
    return x * std + mean


class ShowDataset:
    """Cache-backed SHOW dataset.

    Expects cache fields: pose(165), expression(100), mel, mfcc(optional),
    speaker (one-hot 4), betas(optional), hubert(optional).  Emits the
    trainer contract: gesture(129), expression(103), motion(232), mel,
    speaker.  Speaker one-hot is ``id - 20`` in the reference's 4-speaker
    convention (ddpm_show_trainer.py:385).
    """

    def __init__(self, cache_dir: str, stats: ShowStats,
                 hubert_cache_dir: Optional[str] = None,
                 remove_hand: bool = False, audio_feat: str = "mel",
                 n_mfcc: int = 64):
        self.cache = ArrayCache(cache_dir)
        self.stats = stats
        # --remove_hand: keep the 39 body dims, drop the 90 hand dims
        # (runner.py:195-197; the reference trainer's :63 slice at
        # ddpm_show_trainer.py:367 contradicts its own dim_pose=39 and
        # would crash — the runner semantics are implemented here)
        self.remove_hand = remove_hand
        # --audio_feat {mel, mfcc, raw} (base_options.py:43,
        # datasets/show.py:108-113); hubert/wav2vec2 flow through the
        # hubert cache + model.speech_encoder instead
        self.audio_feat = audio_feat
        self.n_mfcc = n_mfcc
        self._mfcc_frontend = None
        self.hubert = (ArrayCache(hubert_cache_dir)
                       if hubert_cache_dir else None)

    def __len__(self) -> int:
        return len(self.cache)

    def _aud_feat(self, s: Dict[str, np.ndarray], n_frames: int
                  ) -> np.ndarray:
        if self.audio_feat == "mel":
            return s["mel"].astype(np.float32)
        if self.audio_feat == "mfcc":
            if "mfcc" in s:
                return s["mfcc"].astype(np.float32)
            # cache built before the mfcc field existed: compute on the fly
            if self._mfcc_frontend is None:
                from diffsheg_tpu.audio.mfcc import MfccFrontend
                from diffsheg_tpu.audio.wav import resample_poly
                self._resample = resample_poly
                self._mfcc_frontend = MfccFrontend(
                    sr=18000, hop=600, n_mfcc=self.n_mfcc, drop_last=False)
            a18 = self._resample(np.asarray(s["audio"], np.float32),
                                 16000, 18000)
            return np.asarray(self._mfcc_frontend(a18[None]))[0, :n_frames]
        if self.audio_feat == "raw":
            # audio_dim=1 (runner.py:215): one scalar per motion frame.
            # The reference reads a TalkSHOW-precomputed aud_raw row; here
            # the 16 kHz window is mean-pooled into per-frame buckets.
            a = np.asarray(s["audio"], dtype=np.float32)
            n = (len(a) // n_frames) * n_frames
            return a[:n].reshape(n_frames, -1).mean(-1, keepdims=True)
        raise ValueError(f"unknown audio_feat {self.audio_feat!r}")

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        s = self.cache[idx]
        gesture = standardize(extract_gesture(s["pose"]),
                              self.stats.pose_mean, self.stats.pose_std)
        expr = standardize(combine_expression(s["pose"], s["expression"]),
                           self.stats.expression_mean,
                           self.stats.expression_std)
        if self.remove_hand:
            gesture = gesture[..., :39]
        out = {
            "gesture": gesture.astype(np.float32),
            "expression": expr.astype(np.float32),
            "motion": np.concatenate([gesture, expr], axis=-1)
                        .astype(np.float32),
            "mel": self._aud_feat(s, gesture.shape[0]),
            "speaker": s["speaker"].astype(np.float32),
        }
        if self.hubert is not None:
            from diffsheg_tpu.data.beat import _interp_frames
            out["hubert"] = _interp_frames(self.hubert[idx],
                                           gesture.shape[0])
        return out

    def batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        items = [self[int(i)] for i in indices]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}
