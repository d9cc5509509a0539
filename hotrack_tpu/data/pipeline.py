"""Device-side batch preparation: the jitted half of the data pipeline.

Replaces the reference's in-worker GPU preprocessing
(SimGrasp_dataset.py:38-128 generate_shapenet_data): FPS to num_points, MANO
ground-truth keypoints + palm template, keypoint jitter, and object-pose
jitter all run as one batched jit on device. RNG is an explicit PRNG key
(reproducible; the reference relies on global torch/np seeds).

Output keys mirror the reference `full_data` dict (SimGrasp_dataset.py:110-128).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..mano.layer import mano_forward
from ..mano.model import ManoModel
from ..models.hand_utils import handkp2palmkp
from ..ops.pointops import farthest_point_sample, index_points
from ..pose.rotations import noisy_rot_matrix, rotvec_to_matrix
from .schema import RawFrame


def jitter_hand_kp(key: jax.Array, kp: jnp.ndarray, scale, kind: str = "normal"):
    """Per-coordinate keypoint noise (data_utils.py:133-148)."""
    if kind == "uniform":
        noise = (jax.random.uniform(key, kp.shape) * 2.0 - 1.0) * scale
    else:
        noise = jax.random.normal(key, kp.shape) * scale
    return kp + noise


def jitter_obj_pose(key: jax.Array, rotation, translation, scale,
                    cfg: dict, kind: str = "normal"):
    """Object pose noise (data_utils.py:91-120): rotation by |N|*r radians
    toward a random orthogonal quaternion; translation along a random unit
    direction with N*t magnitude; scale + N*s."""
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def rand(k, shape):
        if kind == "uniform":
            return jax.random.uniform(k, shape) * 2.0 - 1.0
        return jax.random.normal(k, shape)

    new_rot = noisy_rot_matrix(k1, rotation, cfg["rotation"], kind)
    new_scale = scale + rand(k2, scale.shape) * cfg["scale"]
    norm = rand(k3, scale.shape) * cfg["translation"]
    direction = rand(k4, translation[..., 0].shape)
    direction = direction / jnp.clip(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), min=1e-9)
    new_trans = translation + (direction * norm[..., None])[..., None]
    return new_rot, new_trans, new_scale


def _random_subset(key, valid, num_points: int):
    """Uniform without-replacement subset of the valid points per batch row
    (invalid points selected only when fewer than num_points are valid) —
    the reference CPU fallback's np.random.permutation(len)[:n] at fixed
    shapes."""
    scores = jax.random.uniform(key, valid.shape)
    scores = jnp.where(valid, scores, scores - 2.0)
    _, idx = jax.lax.top_k(scores, num_points)
    return idx


@partial(jax.jit, static_argnames=("num_points", "jitter_kind",
                                   "obj_jitter_kind", "template_with_theta",
                                   "include_obb", "sample_kind"))
def prepare_batch(
    mano_model: ManoModel,
    raw: RawFrame,                  # batched (leading axis B)
    key: jax.Array,
    num_points: int,
    hand_jitter_scale: float = 0.0,
    jitter_kind: str = "normal",
    obj_jitter: dict | None = None,  # {'rotation' rad, 'translation', 'scale'}
    obj_jitter_kind: str = "normal",
    template_with_theta: bool = False,
    include_obb: bool = False,       # handframe='OBB': per-frame OBB canon pose
    sample_kind: str = "fps",        # 'fps' (reference GPU semantics; the
                                     # >5*num_points random presubsample
                                     # happens host-side in the readers'
                                     # pad_points — see `presample: fresh`
                                     # for its per-epoch redraw) |
                                     # 'random' (its CPU fallback: a fresh
                                     # uniform subset every draw,
                                     # data_utils.py:246-249)
) -> dict:
    """RawFrame batch -> full_data dict of device arrays.

    Keys (channels-last): hand_points/obj_points (B, num_points, 3) +
    *_valid masks, gt_hand_kp, jittered_hand_kp (B, 21, 3), gt_hand_pose
    {rotation, translation, scale, mano_pose, mano_trans, mano_beta,
    palm_template}, gt_obj_pose / jittered_obj_pose {rotation, translation,
    scale}, pred_obj_pose, projection.
    """
    b = raw.hand_points.shape[0]
    k_kp, k_obj = jax.random.split(key)

    # --- cloud downsampling at fixed shapes (replaces the worker-side CUDA
    # FPS, data_utils.py:225-249). 'fps' is deterministic per cloud;
    # 'random' redraws a uniform valid subset every call — the reference's
    # CPU fallback, whose per-epoch resampling acts as augmentation (the
    # knob exists so framework A/Bs can run at protocol parity) ---
    if sample_kind == "random":
        k_kp, k_s1, k_s2 = jax.random.split(k_kp, 3)
        hand_idx = _random_subset(k_s1, raw.hand_valid, num_points)
        obj_idx = _random_subset(k_s2, raw.obj_valid, num_points)
    else:
        hand_idx = farthest_point_sample(raw.hand_points, num_points,
                                         raw.hand_valid)
        obj_idx = farthest_point_sample(raw.obj_points, num_points,
                                        raw.obj_valid)
    hand_points = index_points(raw.hand_points, hand_idx)
    hand_valid = jnp.take_along_axis(raw.hand_valid, hand_idx, axis=1)
    obj_points = index_points(raw.obj_points, obj_idx)
    obj_valid = jnp.take_along_axis(raw.obj_valid, obj_idx, axis=1)

    # --- MANO ground truth (SimGrasp_dataset.py:85-97) ---
    _, mano_kp = mano_forward(mano_model, raw.mano_pose, betas=raw.mano_beta,
                              trans=raw.mano_trans, original_version=True)
    if template_with_theta:
        # HO3D/DexYCB: rest template keeps the annotated finger pose with the
        # global rotation zeroed (HO3D_dataset.py:186-191)
        template_pose = raw.mano_pose.at[:, :3].set(0.0)
    else:
        template_pose = jnp.zeros((b, 48), mano_kp.dtype)
    _, template_kp = mano_forward(mano_model, template_pose,
                                  betas=raw.mano_beta)
    palm_template = handkp2palmkp(template_kp)
    # HO3D/DexYCB annotate the 21 gt keypoints directly
    # (HO3D_dataset.py:157-161); SimGrasp derives them from MANO
    has = raw.has_annot_kp[:, None, None]
    gt_kp = jnp.where(has, raw.annot_hand_kp, mano_kp)
    world_trans = gt_kp[:, 0]  # wrist in camera frame
    hand_rotation = rotvec_to_matrix(raw.mano_pose[:, :3])

    jittered_kp = jitter_hand_kp(k_kp, gt_kp, hand_jitter_scale, jitter_kind)

    gt_obj = {"rotation": raw.obj_rotation,
              "translation": raw.obj_translation,
              "scale": raw.obj_scale}
    if obj_jitter is not None:
        jr, jt, js = jitter_obj_pose(k_obj, raw.obj_rotation,
                                     raw.obj_translation, raw.obj_scale,
                                     obj_jitter, obj_jitter_kind)
        jittered_obj = {"rotation": jr, "translation": jt, "scale": js}
    else:
        jittered_obj = dict(gt_obj)

    out_extra = {}
    if include_obb:
        # OBB canonical frame of the sampled hand cloud (data_utils.py:169-202,
        # computed in the reference's loader for handframe='OBB')
        from ..models.hand_utils import obb_frame
        obb = obb_frame(hand_points)
        out_extra["OBB_pose"] = {"rotation": obb.rotation,
                                 "translation": obb.translation,
                                 "scale": obb.scale}

    return {
        **out_extra,
        "hand_points": hand_points,
        "hand_valid": hand_valid,
        "obj_points": obj_points,
        "obj_valid": obj_valid,
        "gt_hand_kp": gt_kp,
        "jittered_hand_kp": jittered_kp,
        "gt_hand_pose": {
            "rotation": hand_rotation,
            "translation": world_trans[..., None],
            "scale": jnp.full((b,), 0.2, gt_kp.dtype),
            "mano_pose": raw.mano_pose,
            "mano_trans": raw.mano_trans,
            "mano_beta": raw.mano_beta,
            "palm_template": palm_template,
        },
        "gt_obj_pose": gt_obj,
        "jittered_obj_pose": jittered_obj,
        "pred_obj_pose": {"rotation": raw.pred_obj_rotation,
                          "translation": raw.pred_obj_translation},
        "projection": raw.projection,
        "frame_valid": raw.valid,
    }
