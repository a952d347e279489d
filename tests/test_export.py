"""BeatMotionExporter: normalized output -> denorm npy / BVH / face JSON
(reference result writing, ddpm_beat_trainer.py:1044-1089,1322-1341)."""

import json
import os

import numpy as np

from diffsheg_tpu.sampling.export import BeatMotionExporter


def _template(path):
    from diffsheg_tpu.geometry.joints import BEAT_JOINT_ORDER

    lines = ["HIERARCHY"]

    def emit(name, depth, root=False):
        pad = "  " * depth
        lines.append(f"{pad}{'ROOT' if root else 'JOINT'} {name}")
        lines.append(f"{pad}{{")
        lines.append(f"{pad}  OFFSET 0.0 1.0 0.0")
        ch = ("CHANNELS 6 Xposition Yposition Zposition "
              "Zrotation Xrotation Yrotation" if root else
              "CHANNELS 3 Zrotation Xrotation Yrotation")
        lines.append(f"{pad}  {ch}")

    emit(BEAT_JOINT_ORDER[0], 0, root=True)
    for j, n in enumerate(BEAT_JOINT_ORDER[1:]):
        emit(n, j + 1)
    nj = len(BEAT_JOINT_ORDER)
    lines += ["  " * nj + "End Site", "  " * nj + "{",
              "  " * nj + "  OFFSET 0 0.1 0", "  " * nj + "}"]
    for d in range(nj, 0, -1):
        lines.append("  " * (d - 1) + "}")
    lines += ["MOTION", "Frames: 1", "Frame Time: 0.06666667",
              " ".join(["0.0"] * 228)]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_export_writes_npy_bvh_face(tmp_path):
    rng = np.random.RandomState(0)
    T = 45
    motion = rng.randn(T, 192).astype(np.float32)
    mean = rng.randn(192).astype(np.float32)
    std = (rng.rand(192) + 0.5).astype(np.float32)
    tmpl = str(tmp_path / "tmpl.bvh")
    _template(tmpl)

    exp = BeatMotionExporter(141, 15.0, mean, std, template_bvh=tmpl)
    files = exp.export(motion, str(tmp_path / "out"), "clip_00000")
    assert [os.path.basename(f) for f in files] == [
        "clip_00000.npy", "clip_00000.bvh", "clip_00000_face.json"]

    denorm = np.load(files[0])
    np.testing.assert_allclose(denorm, motion * std + mean, rtol=1e-5)

    text = open(files[1]).read().splitlines()
    body_start = next(i for i, ln in enumerate(text)
                      if ln.startswith("Frame Time")) + 1
    body = np.loadtxt(text[body_start:])
    assert body.shape == (T, 228)
    assert np.isfinite(body).all()

    face = json.load(open(files[2]))
    assert len(face["names"]) == 51 and len(face["frames"]) == T


def test_export_without_template_skips_bvh(tmp_path):
    motion = np.zeros((10, 192), np.float32)
    exp = BeatMotionExporter(141, 15.0, np.zeros(192), np.ones(192))
    files = exp.export(motion, str(tmp_path), "c")
    assert [os.path.basename(f) for f in files] == ["c.npy", "c_face.json"]


def test_export_with_player_writes_html(tmp_path):
    rng = np.random.RandomState(1)
    T = 10
    motion = rng.randn(T, 192).astype(np.float32)
    tmpl = str(tmp_path / "tmpl.bvh")
    _template(tmpl)

    exp = BeatMotionExporter(141, 15.0, np.zeros(192), np.ones(192),
                             template_bvh=tmpl, player=True)
    files = exp.export(motion, str(tmp_path / "out"), "clip")
    assert os.path.basename(files[-1]) == "clip_player.html"
    html = open(files[-1]).read()
    assert html.startswith("<!DOCTYPE html>")
    # embeds T frames of FK positions and the 51 face names
    import re
    d = json.loads(re.search(r"const D = (\{.*?\});\n", html, re.S).group(1))
    assert len(d["positions"]) == T
    assert len(d["face"]) == T and len(d["face_names"]) == 51
