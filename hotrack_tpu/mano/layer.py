"""Differentiable MANO forward (LBS) as pure jittable functions.

Reimplements the reference's OurManoLayer.forward
(/root/reference/third_party/mano/our_mano.py:218-360) in vectorized JAX:
axis-angle -> rotation matrices (with the reference's +1e-8 norm shift,
our_mano.py:99-110), shape/pose blendshapes, the explicit 3-level kinematic
chain (our_mano.py:286-316), LBS skinning via one MXU matmul, 5 fingertip
vertices, 21-kp reorder, and the wrist-recentred output convention
(our_mano.py:351-354).

The reference's `register_beta` mutable fast path (our_mano.py:211-216) —
used so the 5120-particle optimizers skip the shape blend — becomes the
functional `shape_hand()` whose result is passed back in via `shaped=`.

Everything is batched over a leading axis and safe under jit/vmap/grad.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .model import (
    KP_REORDER,
    LEV1_IDXS,
    LEV2_IDXS,
    LEV3_IDXS,
    REORDER_IDXS,
    ManoModel,
)


def mano_rodrigues(axisang: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 3, 3) rotations.

    Matches batch_rodrigues (our_mano.py:99-110): the angle is the norm of
    (axisang + 1e-8) — a componentwise shift, not an epsilon under the sqrt —
    and the quaternion axis divides the *unshifted* vector by that angle.
    """
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    w = jnp.cos(half)[..., 0]
    xyz = jnp.sin(half) * axis
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    # quaternion already unit-norm by construction (our_mano.py:72-97)
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(axisang.shape[:-1] + (3, 3))


def pca_comps2pose(model: ManoModel, pca: jnp.ndarray, ncomps: int = 10) -> jnp.ndarray:
    """PCA coefficients (..., ncomps) -> 45-dof axis-angle pose
    (our_mano.py:208-209)."""
    return jnp.matmul(pca, model.hands_components[:ncomps])


def shape_hand(model: ManoModel, betas: jnp.ndarray):
    """Shape blend: betas (B, 10) -> (v_shaped (B, 778, 3), joints (B, 16, 3)).

    Functional replacement for register_beta (our_mano.py:211-216)."""
    v_shaped = jnp.einsum("vcs,bs->bvc", model.shapedirs, betas) + model.v_template
    joints = jnp.einsum("jv,bvc->bjc", model.j_regressor, v_shaped)
    return v_shaped, joints


def _kinematic_chain(rot_mats, joints):
    """Base-to-tips chain, 3 levels of 5 fingers (our_mano.py:286-316).

    Composed as (R, t) pairs with broadcast-multiply-reduce instead of
    homogeneous 4x4 jnp.matmul: at (B, 5) batches of 3x3 the MXU path costs
    more in bf16-cast + layout copies than it computes (profiled ~1 ms/iter
    of pure copies in the 5120-candidate optimizer program); the elementwise
    form fuses on the VPU, in full f32.

    Returns (r_all (B,16,3,3), t_all (B,16,3) posed joints, t_rel (B,16,3)
    = t_all - r_all @ rest_joints, the LBS translation — our_mano.py:322-324).
    """
    def _compose(rp, tp, rl, tl):
        r = jnp.sum(rp[..., :, :, None] * rl[..., None, :, :], axis=-2)
        t = jnp.sum(rp * tl[..., None, :], axis=-1) + tp
        return r, t

    root_rot = rot_mats[:, 0]
    root_j = joints[:, 0]
    lev1, lev2, lev3 = list(LEV1_IDXS), list(LEV2_IDXS), list(LEV3_IDXS)
    r1, t1 = _compose(root_rot[:, None], root_j[:, None],
                      rot_mats[:, lev1], joints[:, lev1] - root_j[:, None])
    r2, t2 = _compose(r1, t1, rot_mats[:, lev2],
                      joints[:, lev2] - joints[:, lev1])
    r3, t3 = _compose(r2, t2, rot_mats[:, lev3],
                      joints[:, lev3] - joints[:, lev2])
    order = list(REORDER_IDXS)
    r_all = jnp.concatenate([root_rot[:, None], r1, r2, r3], axis=1)[:, order]
    t_all = jnp.concatenate([root_j[:, None], t1, t2, t3], axis=1)[:, order]
    t_rel = t_all - jnp.sum(r_all * joints[..., None, :], axis=-1)
    return r_all, t_all, t_rel


@partial(jax.jit, static_argnames=("original_version", "root_palm",
                                   "channels_first"))
def mano_forward(
    model: ManoModel,
    pose_coeffs: jnp.ndarray,
    betas: jnp.ndarray | None = None,
    trans: jnp.ndarray | None = None,
    shaped=None,
    original_version: bool = False,
    root_palm: bool = False,
    channels_first: bool = False,
):
    """MANO LBS forward. pose_coeffs (B, 48) = 3 global + 45 joint axis-angle.

    Returns (verts (B, 778, 3), keypoints (B, 21, 3)), wrist-centred unless
    `original_version` (our_mano.py:351-354). `shaped` short-circuits the
    shape blend with a precomputed `shape_hand` result; its batch dim may be 1
    (broadcast) or B.

    `channels_first=True` returns verts as (3, B, 778) instead — the layout
    the fused hand-energy Pallas kernel consumes as a flat (3, B*778) bitcast.
    The transpose folds into the skinning dot's output indexing; emitting
    (B, 778, 3) and transposing afterwards costs ~2 ms/iteration of pure
    data-formatting (while-loop of row dynamic-update-slices) in the
    5120-candidate optimizer program.
    """
    b = pose_coeffs.shape[0]
    rot_mats = mano_rodrigues(pose_coeffs.reshape(b, 16, 3))  # (B, 16, 3, 3)
    root_rot = rot_mats[:, 0]
    eye = jnp.eye(3, dtype=pose_coeffs.dtype)
    pose_map = (rot_mats[:, 1:] - eye).reshape(b, 135)

    if shaped is not None:
        v_shaped, joints = shaped
        v_shaped = jnp.broadcast_to(v_shaped, (b,) + v_shaped.shape[1:])
        joints = jnp.broadcast_to(joints, (b,) + joints.shape[1:])
    else:
        if betas is None:
            betas = jnp.zeros((1, model.shapedirs.shape[-1]), pose_coeffs.dtype)
        if betas.shape[0] == 1 and b > 1:
            betas = jnp.broadcast_to(betas, (b, betas.shape[-1]))
        v_shaped, joints = shape_hand(model, betas)

    v_posed = v_shaped + jnp.einsum("vcp,bp->bvc", model.posedirs, pose_map)

    r_all, t_all, t_rel = _kinematic_chain(rot_mats, joints)

    jtr = t_all  # posed joints (B, 16, 3)

    # LBS skinning on (R | t) directly — (778,16) x (B,16,...) matmuls ride
    # the MXU (vs. the reference's (B,4,4,16)x(16,778) layout,
    # our_mano.py:326-335); no homogeneous column, so the per-vertex blend
    # materializes 9+3 components instead of 16
    skin_r = jnp.einsum("vj,bjxy->bvxy", model.weights, r_all)
    if channels_first:
        verts = (jnp.einsum("bvxy,bvy->xbv", skin_r, v_posed)
                 + jnp.einsum("vj,bjx->xbv", model.weights, t_rel))
        tips = jnp.moveaxis(verts[:, :, model.tips], 0, -1)   # (B, 5, 3)
        if root_palm:
            palm = ((verts[:, :, 95] + verts[:, :, 22]) / 2.0).T[:, None]
            jtr = jnp.concatenate([palm, jtr[:, 1:]], axis=1)
        jtr = jnp.concatenate([jtr, tips], axis=1)[:, list(KP_REORDER)]
        if not original_version:
            center = jtr[:, :1]
            jtr = jtr - center
            verts = verts - jnp.moveaxis(center, -1, 0)       # (3, B, 1)
        if trans is not None:
            jtr = jtr + trans[:, None]
            verts = verts + trans.T[:, :, None]
        return verts, jtr

    skin_t = jnp.einsum("vj,bjx->bvx", model.weights, t_rel)
    verts = jnp.einsum("bvxy,bvy->bvx", skin_r, v_posed) + skin_t

    tips = verts[:, model.tips]
    if root_palm:
        palm = (verts[:, 95] + verts[:, 22])[:, None] / 2.0
        jtr = jnp.concatenate([palm, jtr[:, 1:]], axis=1)
    jtr = jnp.concatenate([jtr, tips], axis=1)[:, list(KP_REORDER)]

    if not original_version:
        center = jtr[:, :1]
        jtr = jtr - center
        verts = verts - center

    if trans is not None:
        jtr = jtr + trans[:, None]
        verts = verts + trans[:, None]
    return verts, jtr


def mano_skin_inputs(model: ManoModel, pose_coeffs: jnp.ndarray,
                     trans: jnp.ndarray, shaped):
    """Keypoints + per-candidate skinning inputs for the fused
    skinning+energy Pallas kernel (ops/pallas/hand_energy_skin.py).

    The kernel computes verts(v) = R_skin(v) vp(v) + t_skin(v) + offset in
    VMEM, where vp = v_shaped + posedirs @ pose_map and [R_skin | t_skin] is
    the per-vertex weight blend of (r_all, t_rel) — exactly mano_forward's
    LBS. offset = trans - wrist_center reproduces the wrist-centred +
    translated convention, so in-kernel verts match
    mano_forward(..., channels_first=True) up to dot-precision (in-kernel
    dots run f32; XLA einsums default to bf16 on TPU).

    Returns (kp (B,21,3), pose_map (B,135), rt_flat (B*12,16),
    offset (B,3)). The 21 keypoints use a 5-vertex mini-skin for the
    fingertips (same per-element dots as the full path).
    """
    b = pose_coeffs.shape[0]
    rot_mats = mano_rodrigues(pose_coeffs.reshape(b, 16, 3))
    eye = jnp.eye(3, dtype=pose_coeffs.dtype)
    pose_map = (rot_mats[:, 1:] - eye).reshape(b, 135)

    v_shaped, joints = shaped
    v_shaped = jnp.broadcast_to(v_shaped, (b,) + v_shaped.shape[1:])
    joints = jnp.broadcast_to(joints, (b,) + joints.shape[1:])
    r_all, t_all, t_rel = _kinematic_chain(rot_mats, joints)

    # fingertip mini-skin (5 verts)
    w5 = model.weights[model.tips]                       # (5, 16)
    pd5 = model.posedirs[model.tips]                     # (5, 3, 135)
    vp5 = v_shaped[:, model.tips] + jnp.einsum("vcp,bp->bvc", pd5, pose_map)
    r5 = jnp.einsum("vj,bjxy->bvxy", w5, r_all)
    t5 = jnp.einsum("vj,bjx->bvx", w5, t_rel)
    tips = jnp.einsum("bvxy,bvy->bvx", r5, vp5) + t5

    jtr = jnp.concatenate([t_all, tips], axis=1)[:, list(KP_REORDER)]
    center = jtr[:, :1]
    kp = jtr - center + trans[:, None]
    offset = trans - center[:, 0]

    rt = jnp.concatenate([r_all.reshape(b, 16, 9), t_rel], axis=-1)
    rt_flat = jnp.swapaxes(rt, 1, 2).reshape(b * 12, 16)
    return kp, pose_map, rt_flat, offset


def mano_keypoints(model: ManoModel, pose_coeffs, betas=None, trans=None,
                   shaped=None):
    """Keypoints-only forward (drops the vertex output for callers that only
    need the 21 kps, e.g. the bone-length shape optimizer)."""
    _, kp = mano_forward(model, pose_coeffs, betas, trans, shaped)
    return kp


def template_keypoints(model: ManoModel, betas: jnp.ndarray | None = None):
    """Rest-pose 21 keypoints (wrist-centred) — the palm-template source used
    by the tracking drivers (track_network.py:150-152)."""
    if betas is None:
        betas = jnp.zeros((1, model.shapedirs.shape[-1]), model.v_template.dtype)
    pose = jnp.zeros((betas.shape[0], 48), model.v_template.dtype)
    _, kp = mano_forward(model, pose, betas)
    return kp
