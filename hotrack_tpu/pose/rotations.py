"""Rotation-representation conversions, batched and jittable.

Semantics match the reference conversion zoo (/root/reference/pose_utils/
rotations.py:105-435): quaternions are (w, x, y, z); `matrix_to_unit_quaternion`
uses the trace-based branch only (clamped, eps-regularized) exactly like
rotations.py:116-132; ortho-6d Gram-Schmidt follows rotations.py:356-369.

Everything here is pure jnp — no host round-trips, arbitrary leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def normalize_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternion(s) along last dim (reference rotations.py:6-9)."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / (norm + EPS)


def quat_multiply(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (w,x,y,z) quaternions (rotations.py:50-60)."""
    w1, v1 = q[..., :1], q[..., 1:]
    w2, v2 = r[..., :1], r[..., 1:]
    w = w1 * w2 - jnp.sum(v1 * v2, axis=-1, keepdims=True)
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([w, v], axis=-1)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v by unit quaternions q (rotations.py:69-88)."""
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    out = quat_multiply(quat_multiply(q, qv), quat_conjugate(q))
    return out[..., 1:]


def unit_quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(.., 4) unit quaternion -> (.., 3, 3) rotation (rotations.py:105-113)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    m = jnp.stack(
        [
            1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w,
            2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w,
            2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y,
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_unit_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """(.., 3, 3) rotation -> (.., 4) quaternion, trace branch w/ eps
    (rotations.py:116-132; the reference intentionally uses only this branch)."""
    trace = 1.0 + m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    trace = jnp.clip(trace, min=0.0)
    r = jnp.sqrt(trace)
    s = 1.0 / (2.0 * r + 1e-7)
    w = 0.5 * r
    x = (m[..., 2, 1] - m[..., 1, 2]) * s
    y = (m[..., 0, 2] - m[..., 2, 0]) * s
    z = (m[..., 1, 0] - m[..., 0, 1]) * s
    return normalize_quat(jnp.stack([w, x, y, z], axis=-1))


def axis_theta_to_quater(axis: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """axis (.., 3), theta (..,) -> quaternion (rotations.py:135-141)."""
    w = jnp.cos(theta / 2.0)
    u = jnp.sin(theta / 2.0)
    xyz = axis * u[..., None]
    return normalize_quat(jnp.concatenate([w[..., None], xyz], axis=-1))


def quater_to_axis_theta(q: jnp.ndarray):
    """quaternion -> (axis, theta) (rotations.py:144-152)."""
    q = normalize_quat(q)
    cosa = q[..., 0]
    sina = jnp.sqrt(jnp.clip(1.0 - cosa**2, min=0.0))
    norm = sina[..., None]
    mask = (norm < 1e-8).astype(q.dtype)
    axis = q[..., 1:] / jnp.maximum(norm, mask)
    theta = 2.0 * jnp.arccos(jnp.clip(cosa, -1.0, 1.0))
    return axis, theta


def axis_theta_to_matrix(axis, theta):
    return unit_quaternion_to_matrix(axis_theta_to_quater(axis, theta))


def matrix_to_axis_theta(m):
    return quater_to_axis_theta(matrix_to_unit_quaternion(m))


def rotvec_to_axis_theta(rotvec: jnp.ndarray):
    """(.., 3) rotation vector -> (axis, theta) (rotations.py:171-176)."""
    theta = jnp.linalg.norm(rotvec, axis=-1, keepdims=True)
    mask = (theta < 1e-8).astype(rotvec.dtype)
    axis = rotvec / jnp.maximum(theta, mask)
    return axis, theta[..., 0]


def rotvec_to_matrix(rotvec: jnp.ndarray) -> jnp.ndarray:
    axis, theta = rotvec_to_axis_theta(rotvec)
    return axis_theta_to_matrix(axis, theta)


def matrix_to_rotvec(m: jnp.ndarray) -> jnp.ndarray:
    axis, theta = matrix_to_axis_theta(m)
    return axis * theta[..., None]


def mano_axisang2quat(axisang: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """(.., 3K) axis-angle blocks -> (.., 4K) quaternions
    (reference hand_utils.py:21-28, using its epsilon-regularized axis)."""
    lead = axisang.shape[:-1]
    aa = axisang.reshape(lead + (-1, 3))
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    axis = aa / (theta + eps)
    q = axis_theta_to_quater(axis, theta[..., 0])
    return q.reshape(lead + (-1,))


def mano_quat2axisang(quat: jnp.ndarray) -> jnp.ndarray:
    """(.., 4K) quaternions -> (.., 3K) axis-angle (hand_utils.py:13-19)."""
    lead = quat.shape[:-1]
    q = quat.reshape(lead + (-1, 4))
    axis, theta = quater_to_axis_theta(q)
    aa = axis * theta[..., None]
    return aa.reshape(lead + (-1,))


def rot_diff_rad(rot1: jnp.ndarray, rot2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation distance in radians (rotations.py:284-289)."""
    mat_diff = jnp.matmul(rot1, jnp.swapaxes(rot2, -1, -2))
    diff = mat_diff[..., 0, 0] + mat_diff[..., 1, 1] + mat_diff[..., 2, 2]
    diff = jnp.clip((diff - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(diff)


def rot_diff_degree(rot1, rot2):
    return rot_diff_rad(rot1, rot2) / jnp.pi * 180.0


def normalize_vector(v: jnp.ndarray) -> jnp.ndarray:
    """Safe normalize with [1,0,0] fallback for ~zero vectors
    (rotations.py:328-340)."""
    mag = jnp.linalg.norm(v, axis=-1, keepdims=True)
    valid = (mag > EPS).astype(v.dtype)
    backup = jnp.zeros_like(v).at[..., 0].set(1.0)
    out = v / jnp.maximum(mag, EPS)
    return out * valid + backup * (1.0 - valid)


def compute_rotation_matrix_from_ortho6d(poses: jnp.ndarray) -> jnp.ndarray:
    """(.., 6) -> (.., 3, 3) via Gram-Schmidt; columns = (x, y, z)
    (rotations.py:356-369)."""
    x_raw = poses[..., 0:3]
    y_raw = poses[..., 3:6]
    x = normalize_vector(x_raw)
    z = normalize_vector(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def rotvec_to_euler(rotvec: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector -> (heading, attitude, bank) euler angles
    (rotations.py:184-216, euclideanspace.com angle->euler recipe with the
    +/-0.998 gimbal-lock branches)."""
    axis, theta = rotvec_to_axis_theta(rotvec)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    s, c = jnp.sin(theta), jnp.cos(theta)
    t = 1.0 - c
    lock = x * y * t + z * s

    heading_l = 2.0 * jnp.arctan2(x * jnp.sin(theta / 2.0),
                                  jnp.cos(theta / 2.0))
    half_pi = jnp.full_like(heading_l, jnp.pi / 2.0)
    zero = jnp.zeros_like(heading_l)
    euler_n = jnp.stack([heading_l, half_pi, zero], axis=-1)
    euler_s = jnp.stack([-heading_l, -half_pi, zero], axis=-1)

    heading = jnp.arctan2(y * s - x * z * t, 1.0 - (y * y + z * z) * t)
    attitude = jnp.arcsin(jnp.clip(lock, -1.0, 1.0))
    bank = jnp.arctan2(x * s - y * z * t, 1.0 - (x * x + z * z) * t)
    euler = jnp.stack([heading, attitude, bank], axis=-1)

    mask_n = (lock > 0.998)[..., None]
    mask_s = (lock < -0.998)[..., None]
    return jnp.where(mask_n, euler_n, jnp.where(mask_s, euler_s, euler))


def euler_to_rotvec(euler: jnp.ndarray) -> jnp.ndarray:
    """(heading, attitude, bank) euler angles -> rotation vector
    (rotations.py:218-243)."""
    heading, attitude, bank = euler[..., 0], euler[..., 1], euler[..., 2]
    c1, s1 = jnp.cos(heading / 2.0), jnp.sin(heading / 2.0)
    c2, s2 = jnp.cos(attitude / 2.0), jnp.sin(attitude / 2.0)
    c3, s3 = jnp.cos(bank / 2.0), jnp.sin(bank / 2.0)
    w = c1 * c2 * c3 - s1 * s2 * s3
    xyz = jnp.stack([c1 * c2 * s3 + s1 * s2 * c3,
                     s1 * c2 * c3 + c1 * s2 * s3,
                     c1 * s2 * c3 - s1 * c2 * s3], axis=-1)
    angle = 2.0 * jnp.arccos(jnp.clip(w, -1.0, 1.0))
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    degenerate = (norm < 1e-8).astype(euler.dtype)
    axis = xyz / jnp.maximum(norm, degenerate)
    unit_x = jnp.zeros_like(axis).at[..., 0].set(1.0)
    axis = degenerate * unit_x + (1.0 - degenerate) * axis
    return axis * angle[..., None]


def compute_rotation_matrix_from_3d(vec: jnp.ndarray) -> jnp.ndarray:
    """(.., 3) direction -> (.., 3, 3) with the normalized vector as the
    middle column (y axis), completed by x=[1,0,0] cross products
    (rotations.py:423-435) — the rotation head for axially symmetric parts."""
    y = normalize_vector(vec)
    x_raw = jnp.zeros_like(y).at[..., 0].set(1.0)
    z = normalize_vector(jnp.cross(x_raw, y))
    x = jnp.cross(y, z)
    return jnp.stack([x, y, z], axis=-1)


def compute_rotation_matrix_from_9d(m: jnp.ndarray) -> jnp.ndarray:
    """Symmetric orthogonalization of (.., 3, 3) onto SO(3) via SVD
    (rotations.py:402-420 — batched XLA SVD, no CPU detour, grads are fine)."""
    u, s, vh = jnp.linalg.svd(m, full_matrices=False)
    det = jnp.linalg.det(jnp.matmul(u, vh))
    vh = jnp.concatenate([vh[..., :2, :], vh[..., 2:, :] * det[..., None, None]], axis=-2)
    return jnp.matmul(u, vh)


def generate_random_quaternion(key: jax.Array, shape) -> jnp.ndarray:
    """Uniform random unit quaternions (rotations.py:296-300)."""
    return normalize_quat(jax.random.normal(key, shape))


def jitter_quaternion(key: jax.Array, q: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Perturb q by angle theta toward a random orthogonal quaternion
    (rotations.py:246-256; theta has shape q.shape[:-1] + (1,))."""
    new_q = generate_random_quaternion(key, q.shape)
    dot = jnp.sum(q * new_q, axis=-1, keepdims=True)
    q_orth = normalize_quat(new_q - q * dot)
    return q * jnp.cos(theta / 2.0) + q_orth * jnp.sin(theta / 2.0)


def noisy_rot_matrix(key: jax.Array, matrix: jnp.ndarray, rad, kind: str = "normal") -> jnp.ndarray:
    """Random rotation noise of scale `rad` (rotations.py:303-311)."""
    k1, k2 = jax.random.split(key)
    base = matrix[..., 0, 0]
    if kind == "normal":
        theta = jnp.abs(jax.random.normal(k1, base.shape)) * rad
    elif kind == "uniform":
        theta = jax.random.uniform(k1, base.shape) * rad
    else:
        raise ValueError(kind)
    quat = matrix_to_unit_quaternion(matrix)
    return unit_quaternion_to_matrix(jitter_quaternion(k2, quat, theta[..., None]))


def rotate_around_point(points, rotation, pivot):
    """Rotate point sets about pivots (rotations.py:321-325)."""
    pivot = pivot[..., None, :]
    return jnp.matmul(points - pivot, jnp.swapaxes(rotation, -1, -2)) + pivot
