"""HTML motion player (diffsheg_tpu/viz) — the reference's pymo mocap web
player equivalent (datasets/pymo/mocapplayer/): the exported file must be
self-contained, embed the FK positions/parents/fps, and round-trip the
face JSON blendshape surface."""

import json
import os
import re

import numpy as np

from diffsheg_tpu.geometry.face import write_face_json
from diffsheg_tpu.viz.player import export_bvh_player, export_player_html

_TOY_BVH = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 0.0 0.0
  CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
  JOINT Spine
  {
    OFFSET 0.0 1.0 0.0
    CHANNELS 3 Zrotation Xrotation Yrotation
    End Site
    {
      OFFSET 0.0 0.5 0.0
    }
  }
}
MOTION
Frames: 4
Frame Time: 0.0666667
0 0 0 0 0 0 0 0 0
0 0 0 0 0 0 90 0 0
1 0 0 0 0 0 0 90 0
0 1 0 45 0 0 0 0 45
"""


def _embedded(html: str) -> dict:
    m = re.search(r"const D = (\{.*?\});\n", html, re.S)
    assert m, "player must embed the data object"
    return json.loads(m.group(1))


def test_export_player_html(tmp_path):
    T, J = 5, 3
    rng = np.random.RandomState(0)
    pos = rng.randn(T, J, 3)
    out = export_player_html(pos, [-1, 0, 1], 15.0,
                             str(tmp_path / "p.html"))
    html = open(out).read()
    assert html.startswith("<!DOCTYPE html>")
    d = _embedded(html)
    assert len(d["positions"]) == T and len(d["positions"][0]) == J
    assert d["parents"] == [-1, 0, 1]
    assert d["fps"] == 15.0
    np.testing.assert_allclose(d["positions"], np.round(pos, 3))


def test_export_bvh_player_with_face(tmp_path):
    bvh = tmp_path / "clip.bvh"
    bvh.write_text(_TOY_BVH)
    face_w = np.random.RandomState(1).rand(4, 51)
    face = tmp_path / "clip_face.json"
    write_face_json(face_w, str(face), fps=15.0)

    out = export_bvh_player(str(bvh), str(tmp_path / "player.html"),
                            face_json=str(face))
    d = _embedded(open(out).read())
    assert len(d["positions"]) == 4          # frames
    assert len(d["positions"][0]) == 3       # Hips, Spine, End Site
    assert d["parents"] == [-1, 0, 1]
    assert len(d["face"]) == 4 and len(d["face"][0]) == 51
    assert d["face_names"][0] == "browDownLeft"
    # FK sanity: frame 0 is the rest pose — Spine sits 1 above the root
    np.testing.assert_allclose(d["positions"][0][1], [0.0, 1.0, 0.0],
                               atol=1e-3)


def test_cli_view(tmp_path):
    from diffsheg_tpu.cli.main import main

    bvh = tmp_path / "clip.bvh"
    bvh.write_text(_TOY_BVH)
    rc = main(["view", "--bvh", str(bvh)])
    assert rc == 0
    out = str(tmp_path / "clip_player.html")
    assert os.path.exists(out)
    assert len(_embedded(open(out).read())["positions"]) == 4
