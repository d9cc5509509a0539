"""MANO hand pose optimizer vs. object SDF + silhouette (gradient-free).

Parity: gf_optimize_hand_pose (/root/reference/network/models/
optimization_hand.py:127-394): 5 iterations x 5120 particles over 16 dims
(3 rot-quat + 3 trans + 10 MANO PCA comps, theta_scale=30). Energy terms
(:277-293), weighted by cfg opt/energy_weight:

  - sil_loss: project the 778 MANO verts with the camera intrinsics and count
    hits on the background mask (:234-240);
  - penetrate_sum_loss: max |SDF| over verts inside the object (:264-268);
  - vis/invis_regu_loss: keypoint distance to the HandTrackNet prediction,
    split by the visibility mask (:228-232);
  - attraction_loss: pull invisible fingertips' contact zones onto the object
    surface, gated on particle-0 penetration (:242-250, :284-287);
  - temporal_smooth: distance to last frame's keypoints (:270-275).

The per-frame silhouette file I/O of the reference (:316-333) is hoisted out:
the caller passes the background mask as an array (pre-loaded per sequence).
The whole optimization is one jitted lax.fori_loop device program.
"""

from __future__ import annotations

import pickle
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..mano.layer import mano_forward, pca_comps2pose, shape_hand
from ..mano.model import ManoModel
from ..pose.rotations import (
    mano_quat2axisang,
    matrix_to_unit_quaternion,
    unit_quaternion_to_matrix,
)
from ..sdf.volume import nearest_sdf
from .obj_pose import _reproject_so3
from .particle import (
    ParticleSpec,
    normalize_quat_head,
    quat_extend,
    run_particle_opt,
)

POSE_SPEC = ParticleSpec(iterations=5, scaling_coefficient2=0.1, beta=0.9)
INITIAL_SCALE = 0.005       # (optimization_hand.py:150)
THETA_SCALE = 30.0          # (optimization_hand.py:145)
NCOMPS = 10
# fingertip keypoint ids checked for visibility (optimization_hand.py:244)
TIP_KP_IDS = (8, 12, 16, 20, 4)


class ContactZones(NamedTuple):
    """Fingertip contact-zone vertex ids, padded per finger.

    tips_idx (5, K) int32 vertex ids; tips_mask (5, K) bool valid entries.
    Sourced from the Obman contact_zones.pkl (optimization_hand.py:162-171).
    """

    tips_idx: jnp.ndarray
    tips_mask: jnp.ndarray


def load_contact_zones(path: str | None = None) -> ContactZones:
    """Load Obman contact zones (zones 1..5 are the fingertips). Without the
    asset, fall back to the MANO fingertip vertex neighborhoods — enough for
    tests and synthetic rigs."""
    if path is not None:
        with open(path, "rb") as f:
            contact_data = pickle.load(f)
        zones = [np.asarray(contact_data["contact_zones"][i + 1]) for i in range(5)]
    else:
        from ..mano.model import TIPS_RIGHT
        zones = [np.arange(t - 8, t + 8) % 778 for t in TIPS_RIGHT]
    kmax = max(len(z) for z in zones)
    idx = np.zeros((5, kmax), np.int32)
    mask = np.zeros((5, kmax), bool)
    for i, z in enumerate(zones):
        idx[i, :len(z)] = z
        mask[i, :len(z)] = True
    return ContactZones(jnp.asarray(idx), jnp.asarray(mask))


def world2point2d(xyz, fx, fy, cx, cy):
    """Project (..., 3) camera-frame points to (y, x) pixel coords
    (optimization_hand.py:13-21)."""
    x = xyz[..., 0] / xyz[..., 2] * fx + cx
    y = xyz[..., 1] / xyz[..., 2] * fy + cy
    return jnp.stack([y, x], axis=-1)


@partial(jax.jit, static_argnames=("iterations",))
def optimize_hand_pose(
    mano_model: ManoModel,
    presampled: jnp.ndarray,         # (P, 16) fixed particle bank
    zones: ContactZones,
    sdf_volume: jnp.ndarray,         # (V, V, V) object SDF (151^3 @ 3 mm)
    hand_shape: jnp.ndarray,         # (1, 10) optimized beta
    init_rotation: jnp.ndarray,      # (1, 3, 3) global hand rotation
    init_translation: jnp.ndarray,   # (1, 3, 1)
    init_theta: jnp.ndarray,         # (1, 45) MANO joint axis-angles
    pred_kp: jnp.ndarray,            # (1, 21, 3) HandTrackNet prediction
    vis_mask: jnp.ndarray,           # (1, 21) bool keypoint visibility
    last_frame_kp: jnp.ndarray,      # (1, 21, 3); pass pred_kp + has_last=0 on frame 0
    has_last: jnp.ndarray,           # () float {0., 1.}
    obj_rotation: jnp.ndarray,       # (3, 3) object pose (for SDF frame)
    obj_translation: jnp.ndarray,    # (3,)
    background_mask: jnp.ndarray,    # (H, W) bool: True = background pixel
    intrinsics: dict,                # fx, fy, cx, cy scalars
    energy_weight: dict,             # the cfg opt/energy_weight map
    voxel_scale: float = 0.003,
    iterations: int = POSE_SPEC.iterations,
    distilled=None,                  # DistilledSDF: MXU-bound queries instead
                                     # of the gather-bound nearest-voxel lookup
):
    """Returns (final_kp (1,21,3), theta (1,45), rotation (1,3,3),
    translation (1,3,1), final_energy)."""
    import os

    spec = POSE_SPEC._replace(iterations=iterations)
    h, w = background_mask.shape
    use_packed_mask = (jax.default_backend() == "tpu"
                       and not os.environ.get("HOTRACK_NO_PALLAS_MASK"))
    if use_packed_mask:
        # gather-free silhouette lookups (ops/pallas/mask_lookup.py): the
        # (5120 x 778)-point mask gather was 68 ms/iter on v5e — pack rows
        # once per frame, then look bits up with one-hot MXU matmuls
        from ..ops.pallas.mask_lookup import pack_mask, packed_mask_lookup
        packed = pack_mask(background_mask)
    shaped = shape_hand(mano_model, hand_shape)  # register_beta fast path
    # fingertip-zone SDF selection as a one-hot matmul (exact — one-hot rows
    # select single elements). Standalone the (P, 5, K)-from-(P, 778) gather
    # measures ~2x the matmul; inside the full program it's neutral, but the
    # matmul form keeps the energy free of TPU scalar-gather paths.
    zone_onehot = jax.nn.one_hot(zones.tips_idx.reshape(-1), 778,
                                 dtype=jnp.float32)          # (5K, 778)
    vis = vis_mask.astype(jnp.float32)
    invis_finger = 1.0 - vis[0, list(TIP_KP_IDS)]  # (5,)

    use_fused = (use_packed_mask and distilled is not None
                 and not os.environ.get("HOTRACK_NO_FUSED_ENERGY"))
    # skin+energy in ONE kernel (ops/pallas/hand_energy_skin.py): vertices
    # never reach HBM — kills the skinning einsum materializations and the
    # ~1.1 ms/iter tiled->flat relayout of the (..., 778) vertex arrays
    use_skin = use_fused and not os.environ.get("HOTRACK_NO_FUSED_SKIN")
    n_verts = mano_model.weights.shape[0]
    if use_skin:
        vp_pad = (n_verts + 127) // 128 * 128
        pad = ((0, 0), (0, 0), (0, vp_pad - n_verts))
        # per-call constants for the kernel (pad verts produce garbage in
        # discarded lanes only; outputs are sliced [:, :n_verts])
        posed_cf = jnp.pad(jnp.transpose(mano_model.posedirs, (1, 2, 0)),
                           pad)                               # (3, 135, VP)
        vshap_cf = jnp.pad(jnp.swapaxes(shaped[0][0], 0, 1),
                           pad[1:])                           # (3, VP)
        w_t = jnp.pad(jnp.swapaxes(mano_model.weights, 0, 1),
                      pad[1:])                                # (16, VP)

    def candidate_pose(params, sample_ext):
        r, t, theta = params
        new_r = jnp.matmul(r, unit_quaternion_to_matrix(sample_ext[:, :4]))
        new_t = t + sample_ext[:, 4:7, None]
        new_theta = theta + pca_comps2pose(
            mano_model, sample_ext[:, 7:], NCOMPS) * THETA_SCALE
        axisang = mano_quat2axisang(matrix_to_unit_quaternion(new_r))
        return jnp.concatenate([axisang, new_theta], axis=-1), new_t

    def forward_candidates(params, sample_ext):
        pose, new_t = candidate_pose(params, sample_ext)
        # fused path takes verts channels-first (3, P, 778): the layout the
        # Pallas kernel bitcasts to (3, M) — see mano_forward channels_first
        hand, kp = mano_forward(mano_model, pose, trans=new_t[..., 0],
                                shaped=shaped, channels_first=use_fused)
        return hand, kp

    def energy_fn(params, sample_ext):
        if use_skin:
            from ..mano.layer import mano_skin_inputs
            from ..ops.pallas.hand_energy_skin import fused_hand_energy_skin
            from ..sdf.distill import sdf_compute_dtype
            pose, new_t = candidate_pose(params, sample_ext)
            kp, pose_map, rt_flat, offset = mano_skin_inputs(
                mano_model, pose, new_t[..., 0], shaped)
            sdf_p, hits_p = fused_hand_energy_skin(
                distilled, packed, obj_rotation, obj_translation,
                intrinsics["fx"], intrinsics["fy"], intrinsics["cx"],
                intrinsics["cy"], pose_map, rt_flat, offset, posed_cf,
                vshap_cf, w_t, (h, w), compute_dtype=sdf_compute_dtype())
            sdf = sdf_p[:, :n_verts]
            sil = jnp.sum(hits_p[:, :n_verts], axis=-1) / n_verts
            return _terms(sdf, sil, kp)

        hand, kp = forward_candidates(params, sample_ext)  # (P,778,3) (P,21,3)

        if use_fused:
            # one kernel pass for both per-vertex terms
            # (ops/pallas/hand_energy.py)
            from ..ops.pallas.hand_energy import fused_hand_energy
            from ..sdf.distill import sdf_compute_dtype
            sdf, hits = fused_hand_energy(
                distilled, packed, obj_rotation, obj_translation,
                intrinsics["fx"], intrinsics["fy"], intrinsics["cx"],
                intrinsics["cy"], hand, (h, w),
                compute_dtype=sdf_compute_dtype(), cbv=True)
            sil = jnp.sum(hits, axis=-1) / hits.shape[-1]
        else:
            # object-frame SDF at hand verts (optimization_hand.py:252-262)
            if distilled is not None:
                from ..sdf.distill import eval_distilled_sdf_cf, sdf_compute_dtype
                # channels-first (P, 3, 778): the transpose folds into the
                # dot's dimension numbers, and no (..., 3)-minor array
                # reaches the Pallas kernel boundary
                obj_frame_cf = jnp.einsum("pnj,ji->pin",
                                          hand - obj_translation[None, None],
                                          obj_rotation)
                sdf = eval_distilled_sdf_cf(distilled, obj_frame_cf,
                                            compute_dtype=sdf_compute_dtype())
            else:
                obj_frame = jnp.matmul(hand - obj_translation[None, None],
                                       obj_rotation)
                sdf = nearest_sdf(sdf_volume, obj_frame, voxel_scale,
                                  sdf_volume.shape[0])  # (P, 778)

            # silhouette (:234-240); pixel coords computed per-axis so no
            # (..., 2)-minor array materializes (TPU lane-pads size-2 minors)
            pz = hand[..., 2]
            iy = jnp.clip((hand[..., 1] / pz * intrinsics["fy"]
                           + intrinsics["cy"]).astype(jnp.int32), 0, h - 1)
            ix = jnp.clip((hand[..., 0] / pz * intrinsics["fx"]
                           + intrinsics["cx"]).astype(jnp.int32), 0, w - 1)
            if use_packed_mask:
                hits = packed_mask_lookup(packed, iy, ix)      # (P, 778)
                sil = jnp.sum(hits, axis=-1) / hand.shape[1]
            else:
                sil = jnp.sum(background_mask[iy, ix],
                              axis=-1) / hand.shape[1]

        return _terms(sdf, sil, kp)

    def _terms(sdf, sil, kp):
        # penetration (:264-268)
        pen = jnp.max(jnp.abs(sdf) * (sdf < 0.0), axis=-1)

        # keypoint regularization vs. the network prediction (:228-232)
        err = jnp.linalg.norm(kp - pred_kp, axis=-1)  # (P, 21)
        vis_regu = jnp.sum(err * vis[0], -1) / jnp.clip(jnp.sum(vis[0]), min=1.0)
        invis_regu = jnp.sum(err * (1 - vis[0]), -1) / jnp.clip(
            jnp.sum(1 - vis[0]), min=1.0)

        # temporal smoothness (:270-275)
        smooth = jnp.mean(jnp.linalg.norm(kp - last_frame_kp, axis=-1), -1) * has_last

        # fingertip attraction, gated on particle-0 penetration (:242-250,284-287)
        # Precision.HIGHEST keeps the one-hot selection bit-exact on TPU too
        # (default f32 matmul precision there is bf16: ~0.4% rel error on the
        # selected SDF values, breaking the 'exact' claim the gather parity
        # relies on); one-hot rows select single elements so HIGHEST is exact.
        region = jnp.matmul(sdf, zone_onehot.T,
                            precision=jax.lax.Precision.HIGHEST).reshape(
            sdf.shape[0], *zones.tips_idx.shape)  # (P, 5, K)
        region = region * (region > 0.0)
        region = jnp.where(zones.tips_mask[None], region, jnp.inf)
        per_finger = jnp.min(region, axis=-1)  # (P, 5)
        attr = jnp.sum(per_finger * invis_finger, axis=-1) * (pen[0] != 0.0)

        energy = (energy_weight["sil_loss"] * sil
                  + energy_weight["penetrate_sum_loss"] * pen
                  + energy_weight["vis_regu_loss"] * vis_regu
                  + energy_weight["invis_regu_loss"] * invis_regu
                  + energy_weight["temporal_smooth"] * smooth
                  + energy_weight["attraction_loss"] * attr)
        return energy, energy

    def apply_mean(params, mean_ext):
        r, t, theta = params
        r = jnp.matmul(r, unit_quaternion_to_matrix(mean_ext[None, :4]))
        r = _reproject_so3(r)
        t = t + mean_ext[4:7, None]
        theta = theta + pca_comps2pose(
            mano_model, mean_ext[None, 7:], NCOMPS) * THETA_SCALE
        return r, t, theta

    params = (init_rotation, init_translation, init_theta)
    (r, t, theta), last_energy = run_particle_opt(
        spec, presampled, INITIAL_SCALE, params, energy_fn, apply_mean,
        extend_sample=quat_extend,
        postprocess_mean=normalize_quat_head,
        search_slice=lambda m: m[1:],
    )

    axisang = mano_quat2axisang(matrix_to_unit_quaternion(r))
    _, final_kp = mano_forward(
        mano_model, jnp.concatenate([axisang, theta], -1),
        trans=t[..., 0], shaped=shaped)
    return final_kp, theta, r, t, last_energy
