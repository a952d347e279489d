"""Generate librosa-anchored golden vectors for the audio frontend.

Run this ON A MACHINE THAT HAS librosa (it is not installed in the TPU
build environment — zero-egress, no pip) and commit the resulting
``librosa_golden.npz`` next to this script:

    python tests/golden/gen_librosa_golden.py

``tests/test_librosa_golden.py`` then pins `audio/mel.py`, `audio/mfcc.py`
and `audio/onsets.py` against the *actual library outputs* instead of the
library's paper description (SURVEY §7 calls librosa-exact mel
"load-bearing for checkpoint reuse" — the reference computes mel with
librosa defaults at sr=18000/hop=1200/128 mels,
reference trainers/ddpm_beat_trainer.py:1244-1249).  Until the npz is
committed the test module skips with a pointer here.

Everything is deterministic: seeded noise + fixed chirps, f64 synthesis,
f32 storage.  Two pad conventions are recorded for the mel STFT —
``reflect`` (librosa <=0.9 default, what MelFrontend uses) and the
library's current default — so a future librosa pad-mode change is
visible in the fixture rather than silently folded in.
"""

import os

import numpy as np


def make_signal(sr: int, seconds: float, seed: int) -> np.ndarray:
    """Chirp + two tones + noise bursts: broadband, with sharp onsets for
    the onset-detector rows."""
    rng = np.random.RandomState(seed)
    n = int(sr * seconds)
    t = np.arange(n, dtype=np.float64) / sr
    y = 0.30 * np.sin(2 * np.pi * (180.0 + 90.0 * t) * t)
    y += 0.20 * np.sin(2 * np.pi * 523.25 * t)
    y += 0.02 * rng.randn(n)
    # percussive onsets every ~0.5 s: 30 ms decaying noise bursts
    burst = int(0.03 * sr)
    env = np.exp(-np.linspace(0.0, 6.0, burst))
    for k in range(1, int(seconds / 0.5)):
        s = int(k * 0.5 * sr)
        y[s:s + burst] += 0.8 * env[: max(0, min(burst, n - s))] \
            * rng.randn(min(burst, n - s))
    return y.astype(np.float32)


def main() -> None:
    import librosa

    out = {}
    out["librosa_version"] = np.bytes_(librosa.__version__)

    # --- BEAT mel: sr=18000, hop=1200, n_fft=2048, 128 slaney mels -----
    y18 = make_signal(18000, 3.0, seed=0)
    out["y18"] = y18
    out["mel18_reflect"] = librosa.feature.melspectrogram(
        y=y18.astype(np.float64), sr=18000, n_fft=2048, hop_length=1200,
        n_mels=128, power=2.0, pad_mode="reflect").astype(np.float32)
    out["mel18_default"] = librosa.feature.melspectrogram(
        y=y18.astype(np.float64), sr=18000, n_fft=2048, hop_length=1200,
        n_mels=128, power=2.0).astype(np.float32)

    # --- SHOW mfcc: sr=18000, hop=600, n_mfcc=64 over 128 mels ---------
    S = librosa.feature.melspectrogram(
        y=y18.astype(np.float64), sr=18000, n_fft=2048, hop_length=600,
        n_mels=128, power=2.0, pad_mode="reflect")
    out["mfcc18"] = librosa.feature.mfcc(
        S=librosa.power_to_db(S), n_mfcc=64).astype(np.float32)

    # --- onset detector: the audio_onset_times configuration -----------
    # (sr=16000, n_fft=512, hop=160, 64 mels; audio/onsets.py)
    y16 = make_signal(16000, 4.0, seed=1)
    out["y16"] = y16
    mel16 = librosa.feature.melspectrogram(
        y=y16.astype(np.float64), sr=16000, n_fft=512, hop_length=160,
        n_mels=64, power=2.0, pad_mode="reflect")
    out["mel16"] = mel16.astype(np.float32)
    # n_fft passed so the centered-STFT start compensation uses 512 (it
    # defaults to 2048 even when S is precomputed)
    env = librosa.onset.onset_strength(
        S=mel16, sr=16000, hop_length=160, n_fft=512)
    out["onset_env16"] = env.astype(np.float32)
    out["onset_frames16"] = librosa.onset.onset_detect(
        onset_envelope=env, sr=16000, hop_length=160,
        units="frames").astype(np.int64)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "librosa_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: " + ", ".join(
        f"{k}{getattr(v, 'shape', '')}" for k, v in out.items()))


if __name__ == "__main__":
    main()
