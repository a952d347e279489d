"""Pin the audio frontend to ACTUAL librosa outputs.

The fixture ``tests/golden/librosa_golden.npz`` is generated offline by
``tests/golden/gen_librosa_golden.py`` on any machine that has librosa
(this environment does not — zero egress).  When the npz is present these
tests anchor mel / MFCC / onset parity to the library itself rather than
to its documented algorithm (PARITY.md "Known gaps"); when absent they
skip with a pointer to the generator.

Reference dependency being pinned: the BEAT trainer computes mel with
librosa defaults (trainers/ddpm_beat_trainer.py:1244-1249) and the
external harness detects beats with librosa.onset.onset_detect.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "librosa_golden.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN),
    reason="librosa fixture not generated; run "
           "tests/golden/gen_librosa_golden.py where librosa exists "
           "and commit librosa_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_mel_matches_librosa(golden):
    import jax.numpy as jnp
    from diffsheg_tpu.audio.mel import MelFrontend

    ref = golden["mel18_reflect"].T  # librosa is (M, T)
    fe = MelFrontend(sr=18000, n_fft=2048, hop=1200, n_mels=128,
                     drop_last=False, pad_mode="reflect")
    got = np.asarray(fe(jnp.asarray(golden["y18"])[None]))[0]
    assert got.shape == ref.shape
    scale = ref.max()
    assert np.abs(got - ref).max() / scale < 2e-5


def test_mfcc_matches_librosa(golden):
    import jax.numpy as jnp
    from diffsheg_tpu.audio.mfcc import MfccFrontend

    ref = golden["mfcc18"].T  # (T, 64)
    fe = MfccFrontend(sr=18000, hop=600, n_mels=128, n_mfcc=64,
                      drop_last=False)
    got = np.asarray(fe(jnp.asarray(golden["y18"])[None]))[0]
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 2e-2  # dB units


def test_onset_envelope_matches_librosa(golden):
    from diffsheg_tpu.audio.onsets import onset_strength

    mel = golden["mel16"].T  # (T, 64) power
    env = onset_strength(mel, center_shift=512 // (2 * 160))
    ref = golden["onset_env16"]
    n = min(len(env), len(ref))
    assert abs(len(env) - len(ref)) <= 1
    assert np.abs(env[:n] - ref[:n]).max() < 1e-4 * max(ref.max(), 1.0)


def test_onset_frames_match_librosa(golden):
    from diffsheg_tpu.audio.onsets import pick_onsets

    hop_seconds = 160 / 16000
    times = pick_onsets(golden["onset_env16"].astype(np.float64),
                        hop_seconds)
    frames = np.round(times / hop_seconds).astype(np.int64)
    np.testing.assert_array_equal(frames, golden["onset_frames16"])
