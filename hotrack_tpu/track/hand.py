"""Hand tracking driver: the per-sequence frame loop as one lax.scan.

Parity: HandTrackModel (/root/reference/network/models/track_network.py:
96-320). Semantics preserved:

  - palm template initialised from the rest-pose MANO (track_network.py:150-152),
    replaced by the optimized-shape template when shape mode is on;
  - per frame, the previous frame's keypoints are re-centred by the current
    cloud mean as the tracker init ("this trick is important for fast motion",
    track_network.py:161-163, 212-213);
  - optional MANO shape particle optimization at frame 0 (mode 1) or every 10
    frames (mode 2) from the HandTrackNet prediction (track_network.py:174-188);
  - optional IKNet -> MANO theta; optional per-frame hand pose particle
    optimization vs. the object SDF (track_network.py:203-211).

The reference iterates frames in Python with per-frame GPU dispatches; here
the whole sequence is a single jitted lax.scan whose carry is
(last_kp, palm_template, shape_code) — frame-to-frame state never leaves the
device. Shape re-optimization inside the scan is a lax.cond on i % 10 == 0
(same fixed iteration counts, so both branches have static shapes).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..mano.layer import mano_forward
from ..mano.model import ManoModel
from ..models.hand_network import (
    HandTrackNet,
    IKNet,
    iknet_predict_kp,
    precompute_backbone_indices,
)
from ..models.hand_utils import handkp2palmkp
from ..opt.hand_pose import ContactZones, optimize_hand_pose
from ..opt.hand_shape import kp2length, optimize_hand_shape
from .types import HandTrackResult


def _rest_palm_template(mano_model: ManoModel, beta: jnp.ndarray) -> jnp.ndarray:
    """Rest-pose palm keypoints for the given shape (track_network.py:150-152,
    176-178)."""
    _, kp = mano_forward(mano_model, jnp.zeros((1, 48), beta.dtype), betas=beta)
    return handkp2palmkp(kp)


def _make_hand_step(handnet, variables, mano_model, iknet=None,
                    ik_variables=None, use_opt=False, shape_mode=False,
                    shape_particles=None, pose_particles=None, zones=None,
                    sdf_volume=None, energy_weight=None,
                    sdf_voxel_scale=0.003, distilled=None,
                    dtype=jnp.float32):
    """Build the per-frame tracking step — the single definition shared by
    the lax.scan sequence driver (`track_hand_sequence`) and the streaming
    API (`track/stream.HandTracker`), so offline and online tracking are the
    same computation by construction.

    carry = (last_kp (1,21,3), palm_template (1,6,3), shape_code (1,10)
    [, bone_history (64,15), hist_count ()]); xs = per-frame dict with
    i / hand_points (N,3) / jittered_hand_kp (21,3) / bg_mask (H,W)
    (+ obj_rotation/obj_translation/projection when use_opt; + 'pre'
    hoisted backbone indices optionally). Returns (step, run_handnet)."""
    use_iknet = iknet is not None

    def run_handnet(hand_points, jittered_kp, palm_template, pre_indices=None):
        return handnet.apply(
            variables, hand_points, jittered_kp, palm_template,
            compute_visibility=use_iknet, train=False,
            pre_indices=pre_indices)

    def step(carry, xs):
        i, hand_points, jittered_kp0, bg_mask = (
            xs["i"], xs["hand_points"], xs["jittered_hand_kp"], xs["bg_mask"])
        last_kp, palm_template, shape_code = carry[:3]
        hand_points = hand_points[None]  # (1, N, 3)

        cloud_mean = jnp.mean(hand_points, axis=-2, keepdims=True)
        # frame 0 uses the dataset's jittered init; later frames re-centre the
        # previous prediction by the current cloud mean (track_network.py:161-163)
        jittered_kp = jnp.where(i == 0, jittered_kp0[None], last_kp + cloud_mean)

        pre = (jax.tree.map(lambda a: a[None], xs["pre"])
               if "pre" in xs else None)
        ret = run_handnet(hand_points, jittered_kp, palm_template, pre)
        baseline_kp = ret["pred_kp"]
        pred_kp = baseline_kp

        theta = jnp.zeros((1, 45), dtype)
        global_r = ret["canon_pose"].rotation
        global_t = ret["canon_pose"].translation

        if use_iknet:
            # periodic shape re-optimization (mode 2, track_network.py:179-183)
            if shape_mode == 2:
                def reopt(sc):
                    new_shape, _ = optimize_hand_shape(
                        mano_model, shape_particles, kp2length(baseline_kp))
                    return new_shape, _rest_palm_template(mano_model, new_shape)

                def keep(sc):
                    return sc, palm_template

                shape_code, palm_template = jax.lax.cond(
                    (i % 10 == 0) & (i > 0), reopt, keep, shape_code)
            elif shape_mode == 3:
                # mode 3 (track_network.py:184-188): accumulate the per-frame
                # predicted bone lengths (set_init_para use_old,
                # optimization_hand.py:63-72) in a fixed-size ring buffer and
                # re-optimize against the whole history every 10 frames
                bone_history, hist_count = carry[3], carry[4]
                slot = jnp.mod(hist_count, bone_history.shape[0])
                bone_history = bone_history.at[slot].set(
                    kp2length(baseline_kp)[0])
                hist_count = hist_count + 1

                def reopt(sc):
                    n = bone_history.shape[0]
                    filled = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                              < jnp.minimum(hist_count, n))
                    # pad unused slots with the newest row (weightless repeat
                    # keeps the mean |bone diff| energy semantics intact)
                    newest = bone_history[slot]
                    hist = jnp.where(filled, bone_history, newest)
                    new_shape, _ = optimize_hand_shape(
                        mano_model, shape_particles, hist)
                    return new_shape, _rest_palm_template(mano_model, new_shape)

                def keep(sc):
                    return sc, palm_template

                shape_code, palm_template = jax.lax.cond(
                    (i % 10 == 0) & (i > 0), reopt, keep, shape_code)

            ik_ret = iknet.apply(ik_variables, baseline_kp, palm_template,
                                 train=False)
            theta = ik_ret["MANO_theta"]
            global_r = ik_ret["global_pose"].rotation
            global_t = ik_ret["global_pose"].translation

            if use_opt:
                obj_r = xs["obj_rotation"]
                obj_t = xs["obj_translation"][..., 0]
                intr = {"fx": xs["projection"][0], "fy": xs["projection"][1],
                        "cx": xs["projection"][2], "cy": xs["projection"][3]}
                opt_kp, theta, global_r, global_t, _ = optimize_hand_pose(
                    mano_model, pose_particles, zones, sdf_volume,
                    hand_shape=shape_code,
                    init_rotation=global_r, init_translation=global_t,
                    init_theta=theta,
                    pred_kp=baseline_kp, vis_mask=ret["pred_kp_vis_mask"],
                    last_frame_kp=jnp.where(i == 0, baseline_kp,
                                            last_kp + cloud_mean),
                    has_last=(i > 0).astype(dtype),
                    obj_rotation=obj_r, obj_translation=obj_t,
                    background_mask=bg_mask, intrinsics=intr,
                    energy_weight=energy_weight,
                    voxel_scale=sdf_voxel_scale, distilled=distilled)
                pred_kp = opt_kp
            else:
                pred_kp = iknet_predict_kp(mano_model, ik_ret, shape_code)

        new_last = pred_kp - cloud_mean  # (track_network.py:212-213)
        new_carry = (new_last, palm_template, shape_code)
        if shape_mode == 3:
            new_carry = new_carry + (bone_history, hist_count)
        out = {
            "pred_kp": pred_kp[0],
            "baseline_pred_kp": baseline_kp[0],
            "canon_rotation": ret["canon_pose"].rotation[0],
            "canon_translation": ret["canon_pose"].translation[0],
            "global_rotation": global_r[0] if global_r.ndim == 3 else global_r,
            "global_translation": global_t[0] if global_t.ndim == 3 else global_t,
            "MANO_theta": theta[0],
        }
        return new_carry, out

    return step, run_handnet


@partial(jax.jit, static_argnames=("handnet", "iknet", "use_opt", "shape_mode",
                                   "use_pred_obj_pose", "sdf_voxel_scale"))
def track_hand_sequence(
    handnet: HandTrackNet,
    variables: Any,                  # handnet flax variables
    mano_model: ManoModel,
    frames: dict,                    # arrays with leading T (from prepare_batch, B=1 squeezed)
    iknet: IKNet | None = None,
    ik_variables: Any = None,
    use_opt: bool = False,
    shape_mode: int | bool = False,  # False: gt beta; 1: opt @ frame 0;
                                     # 2: re-opt every 10 frames;
                                     # 3: every 10 frames on the history of
                                     #    predicted bone lengths
    shape_particles: jnp.ndarray | None = None,   # (P, 10)
    pose_particles: jnp.ndarray | None = None,    # (P, 16)
    zones: ContactZones | None = None,
    sdf_volume: jnp.ndarray | None = None,
    background_masks: jnp.ndarray | None = None,  # (T, H, W) bool
    energy_weight: dict | None = None,
    use_pred_obj_pose: bool = False,
    sdf_voxel_scale: float = 0.003,
    distilled=None,                  # DistilledSDF for the pose optimizer
) -> HandTrackResult:
    """Track one sequence. `frames` fields are (T, ...) device arrays."""
    t_total = frames["hand_points"].shape[0]
    dtype = frames["hand_points"].dtype
    use_iknet = iknet is not None

    # ---- initial palm template + shape code ----
    zero_beta = jnp.zeros((1, 10), dtype)
    if shape_mode is False or shape_mode == 0:
        shape0 = frames["gt_hand_pose"]["mano_beta"][:1] if use_iknet else zero_beta
    else:
        shape0 = zero_beta
    palm0 = _rest_palm_template(mano_model, zero_beta)

    step, run_handnet = _make_hand_step(
        handnet, variables, mano_model, iknet=iknet,
        ik_variables=ik_variables, use_opt=use_opt, shape_mode=shape_mode,
        shape_particles=shape_particles, pose_particles=pose_particles,
        zones=zones, sdf_volume=sdf_volume, energy_weight=energy_weight,
        sdf_voxel_scale=sdf_voxel_scale, distilled=distilled, dtype=dtype)

    # ---- optional: hoist backbone geometry indices out of the scan ----
    # FPS/knn/ball indices are mathematically invariant to the per-frame
    # rigid canonicalization, so all T frames could compute in parallel here.
    # OFF by default: in f32 on TPU, rotation changes distance rounding and
    # FPS's 256-step argmax chain amplifies tie-flips into a *different but
    # equally valid* sample set — harmless per frame (+1.7mm measured) but a
    # trained net is sensitive to its training-time sampling pattern and the
    # tracking feedback loop amplified it 10x (MPJPE 0.043 -> 0.395 on the
    # synthetic benchmark). Enable via HOTRACK_INDEX_HOIST=1 for throughput
    # studies or when the net was *trained* with hoisted sampling.
    import os
    hoist = handnet.handframe != "OBB" and bool(
        os.environ.get("HOTRACK_INDEX_HOIST"))
    pre_all = (precompute_backbone_indices(handnet.net_cfg,
                                           frames["hand_points"])
               if hoist else None)

    # ---- frame-0 shape optimization (track_network.py:174-178) ----
    if use_iknet and shape_mode in (1, 2, 3):
        ret0 = run_handnet(frames["hand_points"][:1],
                           frames["jittered_hand_kp"][:1], palm0,
                           jax.tree.map(lambda a: a[:1], pre_all)
                           if hoist else None)
        shape0, _ = optimize_hand_shape(
            mano_model, shape_particles, kp2length(ret0["pred_kp"]))
        palm0 = _rest_palm_template(mano_model, shape0)
    elif use_iknet and (shape_mode is False or shape_mode == 0):
        # gt shape: rest template with the annotated beta (track_network.py:189-191)
        palm0 = _rest_palm_template(mano_model, shape0)

    obj_pose_key = "pred_obj_pose" if use_pred_obj_pose else "gt_obj_pose"

    if background_masks is None:
        background_masks = jnp.zeros((t_total, 1, 1), bool)
    xs = {
        "i": jnp.arange(t_total),
        "hand_points": frames["hand_points"],
        "jittered_hand_kp": frames["jittered_hand_kp"],
        "bg_mask": background_masks,
        **({"pre": pre_all} if hoist else {}),
        "obj_rotation": frames[obj_pose_key]["rotation"],
        "obj_translation": frames[obj_pose_key]["translation"],
        "projection": frames["projection"],
    }
    carry0 = (jnp.zeros((1, 21, 3), dtype), palm0, shape0)
    if shape_mode == 3:
        # 64-frame bone-length history ring buffer (15 non-tip bones)
        carry0 = carry0 + (jnp.zeros((64, 15), dtype), jnp.asarray(0))
    final_carry, outs = jax.lax.scan(step, carry0, xs)
    shape_final = final_carry[2]

    return HandTrackResult(
        pred_kp=outs["pred_kp"],
        baseline_pred_kp=outs["baseline_pred_kp"],
        canon_rotation=outs["canon_rotation"],
        canon_translation=outs["canon_translation"],
        global_rotation=outs["global_rotation"],
        global_translation=outs["global_translation"],
        mano_theta=outs["MANO_theta"],
        pred_beta=shape_final,
    )


def track_hand_sequences_sharded(handnet, variables, mano_model,
                                 stacked_frames, devices=None,
                                 per_seq_kwargs=None, **kwargs):
    """Multi-chip tracking eval: vmap equal-length sequences and shard the
    sequence axis over a 1-D device mesh.

    This is the whole multi-chip story for tracking (SURVEY §2.3): sequences
    are embarrassingly parallel, so S sequences over D chips is a
    `NamedSharding(P("seq"))` on every leading-S input — XLA partitions the
    vmapped scan with zero collectives (params replicated, no cross-sequence
    state). `stacked_frames` is the per-sequence `frames` pytree stacked on a
    leading S axis; S must divide by the device count.

    `kwargs` pass through to `track_hand_sequence` as REPLICATED constants
    (they are closed over, never mapped). Per-sequence extras that carry a
    leading S axis (e.g. per-sequence SDF volumes or masks) go in
    `per_seq_kwargs` — those are sharded on the sequence axis and mapped
    through vmap, so each sequence sees its own slice.
    """
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices() if devices is None else devices)
    mesh = Mesh(devices, ("seq",))
    seq = NamedSharding(mesh, P("seq"))
    repl = NamedSharding(mesh, P())
    stacked_frames = jax.device_put(stacked_frames, seq)
    variables = jax.device_put(variables, repl)

    per_seq_kwargs = dict(per_seq_kwargs or {})
    names = sorted(per_seq_kwargs)
    vals = [jax.device_put(per_seq_kwargs[k], seq) for k in names]

    fn = jax.jit(jax.vmap(lambda b, *vs: track_hand_sequence(
        handnet, variables, mano_model, b,
        **dict(zip(names, vs)), **kwargs)))
    return fn(stacked_frames, *vals)
