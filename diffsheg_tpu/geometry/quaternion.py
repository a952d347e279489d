"""Quaternion algebra + continuous 6D rotation representation (jnp).

Functional surface of the reference's quaternion toolkit (reference
utils/quaternion.py:16-412): Hamilton product, vector rotation, euler
extraction, slerp, and the 6D continuous representation.  All ops are
batched, jit-safe jnp; quaternions are (w, x, y, z).
"""

from __future__ import annotations

import jax.numpy as jnp

from diffsheg_tpu.geometry.rotations import (
    axis_angle_to_quaternion,
    quaternion_to_axis_angle,
    quaternion_to_matrix,
)

__all__ = [
    "qmul", "qinv", "qrot", "qeuler", "qslerp", "qnormalize", "qbetween",
    "axis_angle_to_quaternion", "quaternion_to_axis_angle",
    "matrix_to_cont6d", "cont6d_to_matrix", "quaternion_to_cont6d",
    "qfix", "qpow", "expmap_to_quaternion", "euler_to_quaternion",
]


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)


def qmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, (..., 4) each (reference utils/quaternion.py:16)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a unit quaternion (reference utils/quaternion.py:36)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)
    (reference utils/quaternion.py:42-59), via the cross-product form:
    v + 2 w (u x v) + 2 u x (u x v)."""
    u, w = q[..., 1:], q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def qeuler(q: jnp.ndarray, order: str = "xyz", epsilon: float = 0.0
           ) -> jnp.ndarray:
    """Unit quaternion -> euler angles for the six proper orders
    (reference utils/quaternion.py:62-117)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    clip = lambda v: jnp.clip(v, -1.0 + epsilon, 1.0 - epsilon)
    if order == "xyz":
        e = (jnp.arctan2(2 * (x * w - y * z), 1 - 2 * (x * x + y * y)),
             jnp.arcsin(clip(2 * (x * z + y * w))),
             jnp.arctan2(2 * (z * w - x * y), 1 - 2 * (y * y + z * z)))
    elif order == "yzx":
        e = (jnp.arcsin(clip(2 * (x * w + y * z))),
             jnp.arctan2(2 * (y * w - z * x), 1 - 2 * (x * x + y * y)),
             jnp.arctan2(2 * (z * w - x * y), 1 - 2 * (x * x + z * z)))
    elif order == "zxy":
        e = (jnp.arcsin(clip(2 * (x * w + y * z))),
             jnp.arctan2(2 * (y * w - x * z), 1 - 2 * (x * x + y * y)),
             jnp.arctan2(2 * (z * w - x * y), 1 - 2 * (x * x + z * z)))
    elif order == "xzy":
        e = (jnp.arctan2(2 * (x * w + y * z), 1 - 2 * (x * x + z * z)),
             jnp.arctan2(2 * (y * w + x * z), 1 - 2 * (y * y + z * z)),
             jnp.arcsin(clip(2 * (z * w - x * y))))
    elif order == "yxz":
        e = (jnp.arcsin(clip(2 * (x * w - y * z))),
             jnp.arctan2(2 * (x * z + y * w), 1 - 2 * (x * x + y * y)),
             jnp.arctan2(2 * (x * y + z * w), 1 - 2 * (x * x + z * z)))
    elif order == "zyx":
        e = (jnp.arctan2(2 * (x * w + y * z), 1 - 2 * (x * x + y * y)),
             jnp.arcsin(clip(2 * (y * w - x * z))),
             jnp.arctan2(2 * (x * y + z * w), 1 - 2 * (y * y + z * z)))
    else:
        raise ValueError(order)
    return jnp.stack(e, axis=-1)


def qslerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation with shortest-path sign flip
    (reference utils/quaternion.py:366-412)."""
    q0, q1 = qnormalize(q0), qnormalize(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    near = sin_theta < 1e-6
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta)
                   / jnp.where(near, 1.0, sin_theta))
    w1 = jnp.where(near, t, jnp.sin(t * theta)
                   / jnp.where(near, 1.0, sin_theta))
    return qnormalize(w0 * q0 + w1 * q1)


def qbetween(v0: jnp.ndarray, v1: jnp.ndarray) -> jnp.ndarray:
    """Minimal rotation taking v0 to v1 (reference utils/quaternion.py:351)."""
    w = (jnp.linalg.norm(v0, axis=-1, keepdims=True)
         * jnp.linalg.norm(v1, axis=-1, keepdims=True)
         + jnp.sum(v0 * v1, axis=-1, keepdims=True))
    return qnormalize(jnp.concatenate([w, jnp.cross(v0, v1)], axis=-1))


def matrix_to_cont6d(m: jnp.ndarray) -> jnp.ndarray:
    """First two matrix columns, flattened (reference utils/quaternion.py:272)."""
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


def quaternion_to_cont6d(q: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_cont6d(quaternion_to_matrix(q))


def cont6d_to_matrix(c: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt reconstruction (reference utils/quaternion.py:286-305)."""
    a1, a2 = c[..., :3], c[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def qfix(q: jnp.ndarray) -> jnp.ndarray:
    """Enforce sign continuity along the leading (time) axis: flip each
    frame's quaternion to the hemisphere of its predecessor (reference
    utils/quaternion.py:149-167, there via boolean-mask assignment —
    branch-free cumulative-parity form here).  (L, ..., 4) -> same shape."""
    dots = jnp.sum(q[1:] * q[:-1], axis=-1)
    flip = (jnp.cumsum((dots < 0).astype(jnp.int32), axis=0) % 2) == 1
    sign = jnp.where(flip, -1.0, 1.0)
    sign = jnp.concatenate([jnp.ones_like(sign[:1]), sign], axis=0)
    return q * sign[..., None]


def expmap_to_quaternion(e: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (exponential map) (*, 3) -> quaternion (*, 4); the
    sinc-stable half-angle formula (reference utils/quaternion.py:214-231)."""
    theta = jnp.linalg.norm(e, axis=-1, keepdims=True)
    w = jnp.cos(0.5 * theta)
    xyz = 0.5 * jnp.sinc(0.5 * theta / jnp.pi) * e
    return jnp.concatenate([w, xyz], axis=-1)


def euler_to_quaternion(e: jnp.ndarray, order: str = "xyz",
                        degrees: bool = False) -> jnp.ndarray:
    """Euler angles (*, 3) -> quaternion (*, 4), composing per-axis
    half-angle quaternions in ``order`` (reference
    utils/quaternion.py:169-272 euler2quat/euler_to_quaternion; their
    ``deg=True`` default is ``degrees=True`` here).  For right-handed
    orders (xyz/yzx/zxy) the antipodal flip keeps w >= 0, matching the
    reference's sign convention."""
    if degrees:
        e = e * (jnp.pi / 180.0)
    half = 0.5 * e
    c, s = jnp.cos(half), jnp.sin(half)
    zero = jnp.zeros_like(c[..., 0])
    axis_q = {
        "x": jnp.stack([c[..., 0], s[..., 0], zero, zero], axis=-1),
        "y": jnp.stack([c[..., 1], zero, s[..., 1], zero], axis=-1),
        "z": jnp.stack([c[..., 2], zero, zero, s[..., 2]], axis=-1),
    }
    out = axis_q[order[0]]
    for axis in order[1:]:
        out = qmul(out, axis_q[axis])
    if order in ("xyz", "yzx", "zxy"):
        out = -out
    return out


def qpow(q: jnp.ndarray, t) -> jnp.ndarray:
    """Quaternion power q**t via the axis-angle logarithm (reference
    utils/quaternion.py:344-367).  ``t`` broadcasts against q[..., 0];
    near-identity quaternions are epsilon-guarded like the reference."""
    q = qnormalize(q)
    theta0 = jnp.arccos(jnp.clip(q[..., 0], -1.0, 1.0))
    theta0 = jnp.where(jnp.abs(theta0) <= 1e-9, 1e-9, theta0)
    v0 = q[..., 1:] / jnp.sin(theta0)[..., None]
    theta = jnp.asarray(t) * theta0
    return jnp.concatenate(
        [jnp.cos(theta)[..., None], v0 * jnp.sin(theta)[..., None]],
        axis=-1)
