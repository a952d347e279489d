"""End-to-end CLI drive on the reference's shipped audio (gated).

Runs the flagship path as a *program*, not unit pieces: the reference's own
``audios/2_scott_0_3_3.wav`` through ``cli generate`` with a checkpoint
converted from a freshly-initialized reference torch UniDiffuser and a
template BVH — the TPU-native equivalent of ``inference_custom_audio_beat.sh``
+ ``ddpm_beat_trainer.py:1123-1346``.  Asserts output shapes, finite values,
BVH/JSON well-formedness, and RTF reporting.

The model is dimension-reduced (latent 64, 2 layers) so the drive stays
tractable on the CPU test platform; the weights are still genuine reference
``UniDiffuser.__init__`` tensors flowing through the .tar converter, and the
audio is the genuine shipped 24-bit wav (truncated to 8 s).
"""

import pytest

pytestmark = pytest.mark.slow  # long-running: excluded from the core tier (pytest -m "not slow")

import json
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

REF = os.environ.get("DIFFSHEG_REFERENCE", "/root/reference")
WAV = os.path.join(REF, "audios", "2_scott_0_3_3.wav")

if not (os.path.isdir(os.path.join(REF, "models")) and os.path.exists(WAV)):
    pytest.skip("reference checkout not available", allow_module_level=True)

torch = pytest.importorskip("torch")

sys.path.insert(0, REF)
try:
    import types

    try:
        import cv2  # noqa: F401
    except ImportError:
        _m = types.ModuleType("cv2")
        _m.norm = None
        sys.modules["cv2"] = _m
    from models import transformer as ref_tr  # noqa: E402
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference import failed: {e}", allow_module_level=True)


LATENT, LAYERS, HEADS, FF = 64, 2, 4, 128
P, E, S = 141, 51, 30  # BEAT dims (reference runner.py:124-187)
SECS = 8


def _ref_opt():
    return SimpleNamespace(
        cond_projection="mlp_includeX", cond_residual=True,
        classifier_free=False, null_cond_prob=0.2, cond_scale=1,
        dim_pose=P, expression_dim=E, split_pos=P,
        expression_only=False, gesture_only=False,
        expCondition_gesture_only=None, gesCondition_expression_only=False,
        ExprID_off=False, ExprID_off_uncond=False, no_style=False,
        addTextCond=False, addEmoCond=False,
        addHubert=False, addWav2Vec2=False, expAddHubert=False,
        encode_hubert=False, encode_wav2vec2=False,
        emotion_f=0, word_f=0, higher_dim=0, lower_dim=0,
        model_base="transformer_encoder", separate=None,
        unidiffuser=True, visualize_unify_x0_step=0, unify_x0_step_path="",
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_ref_audio")

    # 1. reference-init checkpoint in the reference's own .tar container
    torch.manual_seed(0)
    net = ref_tr.UniDiffuser(
        _ref_opt(), input_feats=P + E, audio_dim=128, style_dim=S,
        num_frames=34, latent_dim=LATENT, ff_size=FF, num_layers=LAYERS,
        num_heads=HEADS, dropout=0, pe_type="pe_sinu").eval()
    ckpt = str(root / "ckpt_ref_init.tar")
    torch.save({"encoder": net.state_dict(), "ep": 0}, ckpt)

    # 2. the shipped wav, truncated to SECS for CPU tractability
    from diffsheg_tpu.audio.wav import load_wav

    y, sr = load_wav(WAV)  # 24-bit mono, 16 kHz
    assert sr == 16000 and y.size >= SECS * sr
    import wave

    wav8 = str(root / "scott_8s.wav")
    with wave.open(wav8, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((y[:SECS * sr] * 32767).astype("<i2").tobytes())

    # 3. normalization stats + a vis template BVH
    from diffsheg_tpu.data.beat import BeatStats

    rng = np.random.RandomState(0)
    BeatStats(
        mean_pose=rng.randn(141).astype(np.float32),
        std_pose=(rng.rand(141) + 0.5).astype(np.float32),
        mean_axis_angle=rng.randn(141).astype(np.float32) * 0.1,
        std_axis_angle=(rng.rand(141) * 0.3 + 0.2).astype(np.float32),
        mean_facial=(rng.rand(51) * 0.5).astype(np.float32),
        std_facial=(rng.rand(51) * 0.2 + 0.1).astype(np.float32),
    ).save(str(root / "stats"))

    from diffsheg_tpu.geometry.joints import BEAT_JOINT_ORDER

    lines = ["HIERARCHY"]

    def emit(name, depth, root_joint=False):
        pad = "  " * depth
        lines.append(f"{pad}{'ROOT' if root_joint else 'JOINT'} {name}")
        lines.append(f"{pad}{{")
        lines.append(f"{pad}  OFFSET 0.0 1.0 0.0")
        ch = ("CHANNELS 6 Xposition Yposition Zposition "
              "Zrotation Xrotation Yrotation" if root_joint else
              "CHANNELS 3 Zrotation Xrotation Yrotation")
        lines.append(f"{pad}  {ch}")

    emit(BEAT_JOINT_ORDER[0], 0, root_joint=True)
    for j, name in enumerate(BEAT_JOINT_ORDER[1:]):
        emit(name, j + 1)
    nj = len(BEAT_JOINT_ORDER)
    lines += ["  " * nj + "End Site", "  " * nj + "{",
              "  " * nj + "  OFFSET 0 0.1 0", "  " * nj + "}"]
    for d in range(nj, 0, -1):
        lines.append("  " * (d - 1) + "}")
    lines += ["MOTION", "Frames: 1", "Frame Time: 0.06666667",
              " ".join(["0.0"] * 228)]
    tmpl = str(root / "template.bvh")
    with open(tmpl, "w") as f:
        f.write("\n".join(lines) + "\n")

    return SimpleNamespace(root=root, ckpt=ckpt, wav=wav8, tmpl=tmpl,
                           stats=str(root / "stats"),
                           out=str(root / "out"))


def test_generate_cli_on_reference_audio(workdir, capsys):
    from diffsheg_tpu.cli.main import main

    rc = main([
        "generate", "--dataset", "beat",
        "--audio", workdir.wav,
        "--checkpoint", workdir.ckpt,
        "--stats-dir", workdir.stats,
        "--out-dir", workdir.out,
        "--speakers", "2,4",
        "--template-bvh", workdir.tmpl,
        "--set", f"model.latent_dim={LATENT}",
        "--set", f"model.num_layers={LAYERS}",
        "--set", f"model.num_heads={HEADS}",
        "--set", f"model.ff_size={FF}",
        "--set", "model.add_hubert=false",
    ])
    assert rc == 0
    stdout = capsys.readouterr().out

    # RTF reporting, as printed by the reference at ddpm_beat_trainer.py:1315
    assert "FPS" in stdout and "real-time" in stdout
    # default serving = single-dispatch pipeline stage; staged mode
    # (stream.single_dispatch=false) reports the reference-style breakdown
    assert ("pipeline=" in stdout) or \
        ("sampler=" in stdout and "mel=" in stdout)

    T = SECS * 15  # 8 s at 15 fps
    for spk in (0, 1):  # two requested speakers -> batch indices 0,1
        motion = np.load(os.path.join(workdir.out, f"scott_8s_{spk}.npy"))
        assert motion.shape == (T, 192)
        assert np.isfinite(motion).all()

        bvh = os.path.join(workdir.out, f"scott_8s_{spk}.bvh")
        with open(bvh) as f:
            text = f.read()
        body_start = text.splitlines().index(
            next(ln for ln in text.splitlines()
                 if ln.startswith("Frame Time"))) + 1
        body = np.loadtxt(text.splitlines()[body_start:])
        assert body.shape == (T, 228)
        assert np.isfinite(body).all()
        frames_line = next(ln for ln in text.splitlines()
                           if ln.startswith("Frames:"))
        assert int(frames_line.split()[1]) == T

        face = json.load(open(
            os.path.join(workdir.out, f"scott_8s_{spk}_face.json")))
        assert len(face["names"]) == 51
        assert len(face["frames"]) == T
        dt = (face["frames"][1]["time"] - face["frames"][0]["time"])
        assert dt == pytest.approx(1.0 / 15.0, rel=1e-3)


def test_generate_cli_show_on_reference_audio(tmp_path, capsys):
    """SHOW flagship path as a program: a reference-init torch UniDiffuser in
    the SHOW configuration (CFG cond_scale 1.15, speaker-4, 129+103 dims —
    reference runner.py:188-222) through the .tar converter, the shipped wav
    through ``cli generate --dataset show``, inv-standardized npy out
    (``inference_custom_audio_show.sh`` + ``ddpm_show_trainer.py:1062-1131``).
    """
    import wave

    from diffsheg_tpu.audio.wav import load_wav

    P_, E_, S_ = 129, 103, 4   # SHOW dims (reference runner.py:191-206)
    SECS_ = 4

    opt = _ref_opt()
    opt.classifier_free = True
    opt.cond_scale = 1.15
    opt.null_cond_prob = 0.1
    opt.dim_pose = P_
    opt.expression_dim = E_
    opt.split_pos = P_
    torch.manual_seed(1)
    net = ref_tr.UniDiffuser(
        opt, input_feats=P_ + E_, audio_dim=128, style_dim=S_,
        num_frames=88, latent_dim=LATENT, ff_size=FF, num_layers=LAYERS,
        num_heads=HEADS, dropout=0, pe_type="pe_sinu").eval()
    ckpt = str(tmp_path / "ckpt_show_init.tar")
    torch.save({"encoder": net.state_dict(), "ep": 0}, ckpt)

    y, sr = load_wav(WAV)
    assert sr == 16000
    wav4 = str(tmp_path / "scott_4s.wav")
    with wave.open(wav4, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((y[:SECS_ * sr] * 32767).astype("<i2").tobytes())

    # talkshow_mean_std.npy in the reference dict layout (165-d pose,
    # 100-d expression)
    rng = np.random.RandomState(1)
    np.save(str(tmp_path / "talkshow_mean_std.npy"), {
        "pose_mean": rng.randn(165).astype(np.float32),
        "pose_std": (rng.rand(165) + 0.5).astype(np.float32),
        "expression_mean": rng.randn(100).astype(np.float32),
        "expression_std": (rng.rand(100) + 0.5).astype(np.float32),
    })

    from diffsheg_tpu.cli.main import main

    out_dir = str(tmp_path / "out")
    rc = main([
        "generate", "--dataset", "show",
        "--audio", wav4,
        "--checkpoint", ckpt,
        "--stats-dir", str(tmp_path),
        "--out-dir", out_dir,
        "--speakers", "1,3",
        "--set", f"model.latent_dim={LATENT}",
        "--set", f"model.num_layers={LAYERS}",
        "--set", f"model.num_heads={HEADS}",
        "--set", f"model.ff_size={FF}",
        "--set", "model.add_hubert=false",
    ])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "FPS" in stdout and "real-time" in stdout

    T = SECS_ * 30  # 30 fps (reference runner.py:190)
    for spk in (0, 1):
        motion = np.load(os.path.join(out_dir, f"scott_4s_{spk}.npy"))
        assert motion.shape == (T, P_ + E_)
        assert np.isfinite(motion).all()
