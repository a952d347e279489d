"""Geometry tests: conversion round-trips, scipy oracle parity, BVH IO/FK.

Oracle strategy per SURVEY.md §4: scipy.spatial.transform.Rotation provides an
independent implementation of every conversion; BVH IO is checked by
parse -> write -> parse round-trip; FK by hand-built 2-joint chains.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from diffsheg_tpu.geometry import (
    axis_angle_to_euler,
    axis_angle_to_matrix,
    axis_angle_to_quaternion,
    euler_to_axis_angle,
    euler_to_matrix,
    matrix_to_axis_angle,
    matrix_to_euler,
    matrix_to_quaternion,
    quaternion_to_matrix,
)
from diffsheg_tpu.geometry import bvh as bvh_mod
from diffsheg_tpu.geometry import joints as joints_mod
from diffsheg_tpu.geometry import quaternion as quat_mod


def _rand_euler(n=64, seed=0, scale=2.5):
    rng = np.random.RandomState(seed)
    return rng.uniform(-scale, scale, size=(n, 3))


class TestRotationsAgainstScipy:
    def test_euler_to_matrix_matches_scipy_intrinsic_xyz(self):
        e = _rand_euler()
        ours = np.asarray(euler_to_matrix(jnp.asarray(e), "XYZ"))
        ref = R.from_euler("XYZ", e).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_matrix_to_quaternion_matches_scipy(self):
        e = _rand_euler(seed=1)
        m = R.from_euler("XYZ", e).as_matrix()
        ours = np.asarray(matrix_to_quaternion(jnp.asarray(m)))
        ref = R.from_matrix(m).as_quat()  # xyzw
        ref_wxyz = np.concatenate([ref[:, 3:], ref[:, :3]], axis=1)
        # canonical sign: compare up to sign via abs of dot
        dots = np.abs(np.sum(ours * ref_wxyz, axis=1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-5)

    def test_axis_angle_roundtrip_via_scipy(self):
        rng = np.random.RandomState(2)
        aa = rng.uniform(-2, 2, size=(64, 3))
        m_ref = R.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(
            np.asarray(axis_angle_to_matrix(jnp.asarray(aa))), m_ref, atol=1e-5)
        aa_back = np.asarray(matrix_to_axis_angle(jnp.asarray(m_ref)))
        np.testing.assert_allclose(
            R.from_rotvec(aa_back).as_matrix(), m_ref, atol=1e-5)

    def test_matrix_to_euler_roundtrip(self):
        e = _rand_euler(seed=3, scale=1.2)  # inside gimbal-safe range
        m = np.asarray(euler_to_matrix(jnp.asarray(e), "XYZ"))
        e_back = np.asarray(matrix_to_euler(jnp.asarray(m), "XYZ"))
        m2 = R.from_euler("XYZ", e_back).as_matrix()
        np.testing.assert_allclose(m2, m, atol=1e-5)

    def test_cache_conversion_roundtrip(self):
        """euler degrees -> axis-angle (cache build, beat.py:376-385) ->
        euler (post-process, ddpm_beat_trainer.py:815) recovers rotation."""
        deg = _rand_euler(seed=4, scale=60.0)
        rad = np.deg2rad(deg)
        aa = euler_to_axis_angle(jnp.asarray(rad), "XYZ")
        e_back = axis_angle_to_euler(aa, "XYZ")
        m0 = R.from_euler("XYZ", rad).as_matrix()
        m1 = R.from_euler("XYZ", np.asarray(e_back)).as_matrix()
        np.testing.assert_allclose(m1, m0, atol=1e-4)

    def test_tiny_angles_stable(self):
        aa = jnp.asarray([[0.0, 0.0, 0.0], [1e-8, -1e-8, 1e-9]])
        q = axis_angle_to_quaternion(aa)
        assert np.isfinite(np.asarray(q)).all()
        m = axis_angle_to_matrix(aa)
        np.testing.assert_allclose(np.asarray(m[0]), np.eye(3), atol=1e-6)


class TestQuaternionOps:
    def test_qmul_qrot_match_scipy(self):
        rng = np.random.RandomState(5)
        e = rng.uniform(-2, 2, (32, 3))
        r = R.from_euler("XYZ", e)
        q_xyzw = r.as_quat()
        q = jnp.asarray(np.concatenate([q_xyzw[:, 3:], q_xyzw[:, :3]], axis=1))
        v = jnp.asarray(rng.randn(32, 3))
        np.testing.assert_allclose(
            np.asarray(quat_mod.qrot(q, v)), r.apply(np.asarray(v)), atol=1e-5)
        q2 = quat_mod.qmul(q, q)
        np.testing.assert_allclose(
            np.asarray(quaternion_to_matrix(q2)), (r * r).as_matrix(), atol=1e-5)

    def test_qslerp_endpoints_and_midpoint(self):
        q0 = jnp.asarray([1.0, 0, 0, 0])
        q1 = quat_mod.axis_angle_to_quaternion(jnp.asarray([0.0, 0.0, np.pi / 2]))
        np.testing.assert_allclose(
            np.asarray(quat_mod.qslerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-6)
        mid = quat_mod.qslerp(q0, q1, 0.5)
        expect = quat_mod.axis_angle_to_quaternion(
            jnp.asarray([0.0, 0.0, np.pi / 4]))
        np.testing.assert_allclose(np.asarray(mid), np.asarray(expect), atol=1e-5)

    def test_cont6d_roundtrip(self):
        e = _rand_euler(seed=6)
        m = jnp.asarray(R.from_euler("XYZ", e).as_matrix())
        c = quat_mod.matrix_to_cont6d(m)
        np.testing.assert_allclose(
            np.asarray(quat_mod.cont6d_to_matrix(c)), np.asarray(m), atol=1e-5)


class TestJointMaps:
    def test_beat_channel_table_totals(self):
        assert joints_mod.BEAT_TOTAL_CHANNELS == 228
        assert len(joints_mod.BEAT_JOINT_ORDER) == 75
        assert joints_mod.BEAT_CHANNELS["Hips"] == (6, 6)
        assert joints_mod.BEAT_CHANNELS["Spine"] == (3, 9)
        assert joints_mod.BEAT_CHANNELS["LToeBaseEnd"] == (3, 228)
        # spot-check reference channel ends (data_tools.py:220-307)
        assert joints_mod.BEAT_CHANNELS["HeadEnd"] == (3, 30)
        assert joints_mod.BEAT_CHANNELS["RHandT1"] == (3, 102)
        assert joints_mod.BEAT_CHANNELS["LShoulder"] == (3, 114)
        assert joints_mod.BEAT_CHANNELS["RUpLeg"] == (3, 195)

    def test_spine_neck_subset(self):
        assert len(joints_mod.SPINE_NECK_141_ORDER) == 47
        assert joints_mod.SPINE_NECK_DIM == 141
        idx = joints_mod.SPINE_NECK_141_IN_BEAT
        assert idx.shape == (141,)
        assert len(np.unique(idx)) == 141
        # Spine rotations live at channels 6:9 of the full frame
        np.testing.assert_array_equal(idx[:3], [6, 7, 8])

    def test_scatter_subset(self):
        rest = np.arange(228, dtype=np.float64)
        sub = np.full((5, 141), -1.0)
        out = joints_mod.scatter_subset_into_full(sub, rest)
        assert out.shape == (5, 228)
        np.testing.assert_array_equal(out[:, joints_mod.SPINE_NECK_141_IN_BEAT],
                                      sub)
        untouched = np.setdiff1d(np.arange(228),
                                 joints_mod.SPINE_NECK_141_IN_BEAT)
        np.testing.assert_array_equal(out[0, untouched], rest[untouched])


_TOY_BVH = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 0.0 0.0
  CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
  JOINT Spine
  {
    OFFSET 0.0 1.0 0.0
    CHANNELS 3 Zrotation Xrotation Yrotation
    JOINT Head
    {
      OFFSET 0.0 1.0 0.0
      CHANNELS 3 Zrotation Xrotation Yrotation
      End Site
      {
        OFFSET 0.0 0.5 0.0
      }
    }
  }
}
MOTION
Frames: 2
Frame Time: 0.066667
0 0 0 0 0 0 0 0 0 0 0 0
0 0 0 0 0 0 90 0 0 0 0 0
"""


class TestBvh:
    def test_parse(self):
        d = bvh_mod.parse_bvh(_TOY_BVH)
        assert d.names == ["Hips", "Spine", "Head"]
        assert d.frames.shape == (2, 12)
        assert abs(d.fps - 15.0) < 0.1
        spine = d.joints[1]
        assert d.rotation_order(spine) == "ZXY"
        np.testing.assert_array_equal(spine.offset, [0, 1, 0])

    def test_write_roundtrip(self):
        d = bvh_mod.parse_bvh(_TOY_BVH)
        d2 = bvh_mod.parse_bvh(bvh_mod.write_bvh(d))
        assert d2.names == d.names
        np.testing.assert_allclose(d2.frames, d.frames, atol=1e-6)
        assert [j.channels for j in d2.joints] == [j.channels for j in d.joints]

    def test_fk_rest_pose(self):
        d = bvh_mod.parse_bvh(_TOY_BVH)
        pos = bvh_mod.forward_kinematics(d)
        # frame 0: identity -> stacked offsets
        np.testing.assert_allclose(pos[0, 0], [0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(pos[0, 1], [0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(pos[0, 2], [0, 2, 0], atol=1e-6)
        np.testing.assert_allclose(pos[0, 3], [0, 2.5, 0], atol=1e-6)

    def test_fk_bent_spine(self):
        d = bvh_mod.parse_bvh(_TOY_BVH)
        pos = bvh_mod.forward_kinematics(d)
        # frame 1: spine Z+90deg -> head offset (0,1,0) maps to (-1,0,0)
        np.testing.assert_allclose(pos[1, 1], [0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(pos[1, 2], [-1, 1, 0], atol=1e-5)
        np.testing.assert_allclose(pos[1, 3], [-1.5, 1, 0], atol=1e-5)

    def test_fk_root_translation(self):
        d = bvh_mod.parse_bvh(_TOY_BVH)
        frames = d.frames.copy()
        frames[:, 0:3] = [5.0, 6.0, 7.0]
        pos = bvh_mod.forward_kinematics(d, frames)
        np.testing.assert_allclose(pos[0, 0], [5, 6, 7], atol=1e-6)
        np.testing.assert_allclose(pos[0, 2], [5, 8, 7], atol=1e-6)


class TestTemplateRewrite:
    def _template(self, header_lines):
        """Tiny stand-in template: header + rest-pose line."""
        hdr = ["HIERARCHY"] + [f"// pad {i}" for i in range(header_lines - 3)]
        hdr += ["Frames: 1", "Frame Time: 0.0666"]
        rest = " ".join(str(float(i)) for i in range(228))
        return "\n".join(hdr + [rest])

    def test_rewrite(self):
        tmpl = self._template(10)
        gen = np.full((4, 141), 9.5)
        out = bvh_mod.rewrite_template(tmpl, gen, header_lines=10)
        lines = out.splitlines()
        assert lines[8] == "Frames: 4"
        body = np.loadtxt(lines[10:])
        assert body.shape == (4, 228)
        np.testing.assert_allclose(
            body[:, joints_mod.SPINE_NECK_141_IN_BEAT], gen)
        untouched = np.setdiff1d(np.arange(228),
                                 joints_mod.SPINE_NECK_141_IN_BEAT)
        np.testing.assert_allclose(body[0, untouched],
                                   np.arange(228.0)[untouched])


class TestFaceJson:
    def test_write_read_roundtrip(self, tmp_path):
        from diffsheg_tpu.geometry import face as face_mod
        w = np.random.RandomState(0).rand(6, 51)
        p = str(tmp_path / "face.json")
        face_mod.write_face_json(w, p, fps=15.0)
        back = face_mod.read_face_json(p)
        np.testing.assert_allclose(back, w, atol=1e-12)
        mean, std = w.mean(0), w.std(0) + 1e-6
        normed = face_mod.read_face_json(p, mean, std)
        np.testing.assert_allclose(normed, (w - mean) / std, atol=1e-9)

    def test_names_list_length(self):
        from diffsheg_tpu.geometry.face import ARKIT_FACIAL_51
        assert len(ARKIT_FACIAL_51) == 51
        assert ARKIT_FACIAL_51[0] == "browDownLeft"
        assert ARKIT_FACIAL_51[-1] == "noseSneerRight"


class TestFaceJsonSingleFrame:
    def test_single_frame_roundtrip(self, tmp_path):
        """T=1 must stay one 51-weight frame (regression: squeeze collapsed
        (1,51) into 51 scalar frames)."""
        from diffsheg_tpu.geometry import face as face_mod
        w = np.random.RandomState(0).rand(1, 51)
        p = str(tmp_path / "one.json")
        face_mod.write_face_json(w, p, fps=15.0)
        back = face_mod.read_face_json(p)
        assert back.shape == (1, 51)
        np.testing.assert_allclose(back, w)


class TestQuaternionExtendedOracle:
    """qfix/expmap/euler_to_quaternion/qpow vs the reference's own
    implementations imported from the mounted tree (numpy/torch)."""

    @staticmethod
    def _ref():
        import importlib.util, os
        path = "/root/reference/utils/quaternion.py"
        if not os.path.exists(path):
            import pytest as _pt
            _pt.skip("reference tree not mounted")
        spec = importlib.util.spec_from_file_location("_ref_quat", path)
        mod = importlib.util.module_from_spec(spec)
        # the reference predates numpy 1.24's removal of the np.float
        # alias; shim it for the duration of the module exec + calls
        if not hasattr(np, "float"):
            np.float = float  # noqa: NPY001
        spec.loader.exec_module(mod)
        return mod

    def test_qfix_matches_reference(self):
        import jax.numpy as jnp
        from diffsheg_tpu.geometry.quaternion import qfix, qnormalize
        ref = self._ref()
        rng = np.random.RandomState(0)
        q = np.asarray(qnormalize(jnp.asarray(rng.randn(20, 5, 4))),
                       np.float64)
        np.testing.assert_allclose(np.asarray(qfix(jnp.asarray(q))),
                                   ref.qfix(q.copy()), atol=1e-6)

    def test_qfix_is_continuous(self):
        import jax.numpy as jnp
        from diffsheg_tpu.geometry.quaternion import qfix, qnormalize
        rng = np.random.RandomState(1)
        q = qnormalize(jnp.asarray(rng.randn(30, 3, 4)))
        out = np.asarray(qfix(q))
        dots = np.sum(out[1:] * out[:-1], axis=-1)
        assert (dots >= -1e-6).all()

    def test_expmap_matches_reference(self):
        import jax.numpy as jnp
        from diffsheg_tpu.geometry.quaternion import expmap_to_quaternion
        ref = self._ref()
        rng = np.random.RandomState(2)
        e = rng.randn(64, 3) * 2.0
        np.testing.assert_allclose(
            np.asarray(expmap_to_quaternion(jnp.asarray(e))),
            ref.expmap_to_quaternion(e), atol=1e-6)

    def test_euler_to_quaternion_matches_reference(self):
        import jax.numpy as jnp
        from diffsheg_tpu.geometry.quaternion import euler_to_quaternion
        ref = self._ref()
        rng = np.random.RandomState(3)
        e = rng.uniform(-np.pi, np.pi, size=(32, 3))
        for order in ("xyz", "zyx", "zxy"):
            np.testing.assert_allclose(
                np.asarray(euler_to_quaternion(jnp.asarray(e), order)),
                ref.euler_to_quaternion(e, order), atol=1e-6)

    def test_qpow_properties(self):
        import jax.numpy as jnp
        from diffsheg_tpu.geometry.quaternion import (
            axis_angle_to_quaternion, qmul, qnormalize, qpow)
        rng = np.random.RandomState(4)
        axis = rng.randn(8, 3)
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        q = axis_angle_to_quaternion(jnp.asarray(axis * 0.7))
        # q^2 == q * q;  q^1 == q
        np.testing.assert_allclose(np.asarray(qpow(q, 2.0)),
                                   np.asarray(qnormalize(qmul(q, q))),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(qpow(q, 1.0)), np.asarray(q),
                                   atol=1e-5)
