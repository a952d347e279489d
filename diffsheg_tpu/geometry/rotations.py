"""Rotation-representation conversions, vectorized for JAX.

Covers the conversion surface the reference uses (reference
datasets/rotation_converter.py:12-381): euler <-> matrix <-> quaternion <->
axis-angle.  Unlike the reference (PyTorch3D-derived, with boolean-mask
indexing that cannot be jit-compiled), every function here is pure jnp with
``jnp.where`` select logic, so the whole geometry post-process — denormalise,
axis-angle -> euler degrees, renormalise (reference
trainers/ddpm_beat_trainer.py:1322-1333) — runs on-device inside one jit.

Conventions (matching the reference):
  - quaternions are (w, x, y, z), real part first;
  - euler angles are intrinsic rotations applied in the convention string's
    order, i.e. ``"XYZ"`` means ``R = Rx(a) @ Ry(b) @ Rz(c)``;
  - axis-angle magnitude is the rotation angle in radians.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def _axis_rotation_matrix(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix about a principal axis; angle shape (...,) -> (...,3,3)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        rows = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        rows = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        rows = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(f"bad axis {axis!r}")
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_to_matrix(euler: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """(..., 3) euler radians -> (..., 3, 3) rotation matrices."""
    if len(convention) != 3:
        raise ValueError(convention)
    m = _axis_rotation_matrix(convention[0], euler[..., 0])
    for i in (1, 2):
        m = m @ _axis_rotation_matrix(convention[i], euler[..., i])
    return m


def _safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz.  Branch-free Shepperd-style selection:
    compute all four candidate quaternions and pick the one keyed on the
    largest squared component (numerically stable everywhere, and jit-safe
    where the reference's version relies on host-side argmax gather)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # 4*q_i^2 for i in (w, x, y, z)
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    # candidate quaternions, one per dominant component
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)[..., None]
    cand = jnp.stack([cw, cx, cy, cz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cand, best[..., None], axis=-2)[..., 0, :]
    denom = 2.0 * _safe_sqrt(jnp.take_along_axis(mags, best, axis=-1))
    q = q / jnp.maximum(denom, _EPS)
    # canonical sign: non-negative real part
    return jnp.where(q[..., :1] < 0, -q, q)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz -> (..., 3, 3)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    )
    return jnp.stack(rows, axis=-1).reshape(q.shape[:-1] + (3, 3))


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz -> (..., 3) axis*angle.  Taylor fallback for tiny angles
    (reference rotation_converter.py:12-41)."""
    norm = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norm, q[..., :1])
    angle = 2.0 * half
    small = jnp.abs(angle) < _EPS
    # sin(x/2)/x ~= 1/2 - x^2/48 near zero
    ratio = jnp.where(
        small,
        0.5 - angle * angle / 48.0,
        jnp.sin(jnp.where(small, 1.0, half)) / jnp.where(small, 1.0, angle),
    )
    return q[..., 1:] / ratio


def axis_angle_to_quaternion(aa: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 4) wxyz (reference rotation_converter.py:204-233)."""
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = jnp.abs(angle) < _EPS
    ratio = jnp.where(
        small,
        0.5 - angle * angle / 48.0,
        jnp.sin(half) / jnp.where(small, 1.0, angle),
    )
    return jnp.concatenate([jnp.cos(half), aa * ratio], axis=-1)


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_matrix(axis_angle_to_quaternion(aa))


def matrix_to_axis_angle(m: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(m))


def euler_to_axis_angle(euler: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Cache-build conversion (reference datasets/beat.py:376-385)."""
    return matrix_to_axis_angle(euler_to_matrix(euler, convention))


def _index_of(letter: str) -> int:
    return "XYZ".index(letter)


def matrix_to_euler(m: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) euler radians, intrinsic ``convention``
    (reference rotation_converter.py:342-381)."""
    i0, i2 = _index_of(convention[0]), _index_of(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(m[..., i0, i2] * (-1.0 if i0 - i2 in (-1, 2) else 1.0),
                     -1.0, 1.0)
        )
    else:
        central = jnp.arccos(jnp.clip(m[..., i0, i0], -1.0, 1.0))

    def angle_from_tan(axis, other_axis, data, horizontal):
        # ``data`` is column i2 (vertical) or row i0 (horizontal) of m.
        i1, i2_ = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
        if horizontal:
            i1, i2_ = i2_, i1
        even = axis + other_axis in ("XY", "YZ", "ZX")
        if horizontal == even:
            return jnp.arctan2(data[..., i1], data[..., i2_])
        if tait_bryan:
            return jnp.arctan2(-data[..., i2_], data[..., i1])
        return jnp.arctan2(data[..., i2_], -data[..., i1])

    o0 = angle_from_tan(convention[0], convention[1], m[..., :, i2], False)
    o2 = angle_from_tan(convention[2], convention[1], m[..., i0, :], True)
    return jnp.stack([o0, central, o2], axis=-1)


def axis_angle_to_euler(aa: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Output post-process conversion (reference rotation_converter.py:282-297,
    used at trainers/ddpm_beat_trainer.py:815,1330)."""
    return matrix_to_euler(axis_angle_to_matrix(aa), convention)
