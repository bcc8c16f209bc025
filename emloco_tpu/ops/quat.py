"""Batched quaternion / rotation algebra on jnp arrays.

Convention: quaternions are stored **[x, y, z, w]** (w-last), matching the
semantics of the reference stack's rotation utilities
(/root/reference/pacer/pacer/utils/torch_utils.py:14-196 and
/root/reference/pacer/poselib/poselib/core/rotation3d.py) so that obs kernels,
motion data and AMP features are directly comparable.

All functions broadcast over arbitrary leading batch dimensions; the trailing
axis is the component axis. Everything is jit/vmap/grad-safe (no data-dependent
control flow; singularities handled with `where` masks).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize, keeping w >= 0 is NOT enforced (sign is meaningful for slerp)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def identity_like(shape_prefix, dtype=jnp.float32) -> jnp.ndarray:
    q = jnp.zeros(tuple(shape_prefix) + (4,), dtype=dtype)
    return q.at[..., 3].set(1.0)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b (rotation b followed by a when rotating column vectors)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


inverse = conjugate  # unit quaternions


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q.

    Matches `my_quat_rotate` (reference torch_utils.py:14-24): 2-cross-product
    form, cheap and fusion-friendly on the VPU.
    """
    qvec = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qvec, v)
    return v + qw * t + jnp.cross(qvec, t)


def rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return rotate(conjugate(q), v)


def from_angle_axis(angle: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """angle: (...,), axis: (..., 3) unit vectors -> (..., 4)."""
    half = 0.5 * angle[..., None]
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


def normalize_angle(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


def to_angle_axis(q: jnp.ndarray):
    """Inverse of from_angle_axis; angle normalized to [-pi, pi].

    Semantics of reference torch_utils.py:quat_to_angle_axis (lines 27-47):
    below the sin(theta) threshold returns angle 0 and the +z axis.
    """
    qw = jnp.clip(q[..., 3], -1.0, 1.0)
    # max against a small positive keeps sqrt's gradient finite at |qw| = 1
    sin_half = jnp.sqrt(jnp.maximum(1.0 - qw * qw, _EPS * _EPS))
    angle = normalize_angle(2.0 * jnp.arccos(qw))
    safe = sin_half > 1e-5
    axis = q[..., :3] / jnp.maximum(sin_half[..., None], _EPS)
    default_axis = jnp.zeros_like(axis).at[..., 2].set(1.0)
    angle = jnp.where(safe, angle, 0.0)
    axis = jnp.where(safe[..., None], axis, default_axis)
    return angle, axis


def to_exp_map(q: jnp.ndarray) -> jnp.ndarray:
    angle, axis = to_angle_axis(q)
    return angle[..., None] * axis


def exp_map_to_quat(exp_map: jnp.ndarray) -> jnp.ndarray:
    # safe norm: jnp.linalg.norm has a NaN gradient at exactly zero
    angle = jnp.sqrt(jnp.sum(exp_map * exp_map, axis=-1) + _EPS * _EPS)
    safe = jnp.abs(angle) > 1e-5
    axis = exp_map / jnp.maximum(angle[..., None], _EPS)
    default_axis = jnp.zeros_like(exp_map).at[..., 2].set(1.0)
    axis = jnp.where(safe[..., None], axis, default_axis)
    angle = jnp.where(safe, normalize_angle(angle), 0.0)
    return from_angle_axis(angle, axis)


def to_tan_norm(q: jnp.ndarray) -> jnp.ndarray:
    """6-D rotation features: rotated x-axis (tangent) ++ rotated z-axis (normal).

    Matches reference torch_utils.py:quat_to_tan_norm (lines 66-79).
    """
    ex = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 0].set(1.0)
    ez = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 2].set(1.0)
    return jnp.concatenate([rotate(q, ex), rotate(q, ez)], axis=-1)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation, shortest arc; t broadcasts against batch dims."""
    cos_half = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(cos_half[..., None] < 0, -q1, q1)
    cos_half = jnp.abs(cos_half)[..., None]
    cos_half_c = jnp.clip(cos_half, 0.0, 1.0 - 1e-7)
    half = jnp.arccos(cos_half_c)
    sin_half = jnp.sqrt(1.0 - cos_half_c * cos_half_c)
    t = jnp.asarray(t)
    tb = t[..., None] if t.ndim < q0.ndim else t
    ratio_a = jnp.sin((1 - tb) * half) / jnp.maximum(sin_half, _EPS)
    ratio_b = jnp.sin(tb * half) / jnp.maximum(sin_half, _EPS)
    out = ratio_a * q0 + ratio_b * q1
    lin = (1 - tb) * q0 + tb * q1  # near-parallel fallback
    out = jnp.where(sin_half < 1e-3, lin, out)
    return jnp.where(cos_half >= 1.0, q0, out)


def calc_heading(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw of the rotated x-axis (reference torch_utils.py:calc_heading, 141-152)."""
    ex = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 0].set(1.0)
    d = rotate(q, ex)
    return jnp.arctan2(d[..., 1], d[..., 0])


def heading_quat(q: jnp.ndarray) -> jnp.ndarray:
    h = calc_heading(q)
    ez = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 2].set(1.0)
    return from_angle_axis(h, ez)


def heading_quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    h = calc_heading(q)
    ez = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 2].set(1.0)
    return from_angle_axis(-h, ez)


def from_euler_xyz(roll, pitch, yaw) -> jnp.ndarray:
    """Intrinsic x-y-z Euler angles to quaternion (isaacgym torch_utils semantics)."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., 3, 3) rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) [x,y,z,w]. Branch-free Shepperd via 4-way select."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate (unnormalized) quats, one per dominant diagonal entry;
    # select by the largest to keep the divisor well-conditioned.
    q_w = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 1.0 + tr], axis=-1)
    q_x = jnp.stack([1.0 + m00 - m11 - m22, (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1)
    q_y = jnp.stack([(m01 + m10), 1.0 - m00 + m11 - m22, (m12 + m21), (m02 - m20)], axis=-1)
    q_z = jnp.stack([(m02 + m20), (m12 + m21), 1.0 - m00 - m11 + m22, (m10 - m01)], axis=-1)

    cand = jnp.stack([q_x, q_y, q_z, q_w], axis=-2)  # (..., 4cand, 4comp)
    diag = jnp.stack([m00, m11, m22, tr], axis=-1)
    idx = jnp.argmax(diag, axis=-1)
    sel = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return normalize(sel)


def angular_velocity(q0: jnp.ndarray, q1: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Finite-difference world-frame angular velocity taking q0 -> q1 over dt."""
    dq = mul(q1, conjugate(q0))
    angle, axis = to_angle_axis(dq)
    return axis * (angle / dt)[..., None]
