"""3D bounding-box IoU evaluation.

Parity: /root/reference/pose_utils/bbox_utils.py — voxelized oriented-box IoU
(iou_3d :28-42), axis-aligned IoU (nocs_iou_3d :45-61), corner expansion
(tensor_bbox_from_corners :64-72), posed-box evaluation with the 20-way yaw
sweep for symmetric objects (eval_single_part_iou :147-185).

Vectorized jnp throughout: the voxel IoU evaluates all nres^3 sample points
against both boxes in one shot (the reference builds the same grid in numpy).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .part_dof import pose_with_part


def pts_inside_box(pts: jnp.ndarray, bbox: jnp.ndarray) -> jnp.ndarray:
    """pts (..., 3), bbox (8, 3) corner convention of bbox_utils.py:11-25."""
    u1 = bbox[5] - bbox[4]
    u2 = bbox[7] - bbox[4]
    u3 = bbox[0] - bbox[4]
    up = pts - bbox[4]
    inside = None
    for u in (u1, u2, u3):
        p = jnp.sum(up * u, axis=-1)
        ok = jnp.logical_and(p > 0, p < jnp.dot(u, u))
        inside = ok if inside is None else jnp.logical_and(inside, ok)
    return inside


def iou_3d(bbox1: jnp.ndarray, bbox2: jnp.ndarray, nres: int = 50):
    """Voxelized IoU of two oriented boxes (bbox_utils.py:28-42)."""
    both = jnp.concatenate([bbox1, bbox2], axis=0)
    bmin = jnp.min(both, axis=0)
    bmax = jnp.max(both, axis=0)
    lin = [jnp.linspace(bmin[i], bmax[i], nres) for i in range(3)]
    xs, ys, zs = jnp.meshgrid(*lin, indexing="ij")
    pts = jnp.stack([xs, ys, zs], axis=-1)
    f1 = pts_inside_box(pts, bbox1)
    f2 = pts_inside_box(pts, bbox2)
    inter = jnp.sum(jnp.logical_and(f1, f2))
    union = jnp.sum(jnp.logical_or(f1, f2))
    return jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1))


def aabb_iou_3d(bbox1: jnp.ndarray, bbox2: jnp.ndarray):
    """Axis-aligned IoU (nocs_iou_3d, bbox_utils.py:45-61)."""
    mx1, mn1 = jnp.max(bbox1, 0), jnp.min(bbox1, 0)
    mx2, mn2 = jnp.max(bbox2, 0), jnp.min(bbox2, 0)
    omin = jnp.maximum(mn1, mn2)
    omax = jnp.minimum(mx1, mx2)
    inter = jnp.where(jnp.min(omax - omin) < 0, 0.0, jnp.prod(omax - omin))
    union = jnp.prod(mx1 - mn1) + jnp.prod(mx2 - mn2) - inter
    return inter / union


def bbox_from_corners(corners: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, 3) min/max corners -> (..., 8, 3) box vertices in the
    reference's ordering (bbox_utils.py:64-72)."""
    pts = []
    for i in range(8):
        x, y, z = (i % 4) // 2, i // 4, i % 2
        pts.append(jnp.stack([corners[..., x, 0], corners[..., y, 1],
                              corners[..., z, 2]], axis=-1))
    return jnp.stack(pts, axis=-2)


def _y_rotation(theta: float) -> np.ndarray:
    return np.array([[np.cos(theta), 0, np.sin(theta)],
                     [0, 1, 0],
                     [-np.sin(theta), 0, np.cos(theta)]], np.float32)


def eval_single_part_iou(gt_corners, pred_corners, gt_pose: dict,
                         pred_pose: dict, nocs: bool = False,
                         sym: bool = False, nres: int = 50):
    """Posed-bbox IoU suite (bbox_utils.py:147-185). corners (B, P, 2, 3);
    poses {'rotation' (B,P,3,3), 'translation' (B,P,3,1), 'scale' (B,P)}.
    With sym=True the gt box is swept over 20 yaw angles about the *predicted*
    rotation and the best IoU is kept (bbox_utils.py:151-163).
    Returns {'npcs_iou', 'iou', 'gt_bbox_iou'} -> (B, P) arrays."""
    iou_fn = aabb_iou_3d if nocs else iou_3d
    gt_npcs = bbox_from_corners(gt_corners)
    pred_npcs = bbox_from_corners(pred_corners)

    if sym:
        gt_poses = []
        for i in range(20):
            rot = jnp.matmul(pred_pose["rotation"],
                             jnp.asarray(_y_rotation(2 * np.pi * i / 20.0)))
            gt_poses.append({"rotation": rot,
                             "translation": gt_pose["translation"],
                             "scale": gt_pose["scale"]})
    else:
        gt_poses = [gt_pose]

    pred_posed = pose_with_part(pred_pose, pred_npcs)
    pred_posed_gt = pose_with_part(pred_pose, gt_npcs)
    gt_posed = [pose_with_part(pose, gt_npcs) for pose in gt_poses]

    b, p = pred_npcs.shape[:2]

    def batch_iou(boxes1_list, boxes2):
        out = np.zeros((b, p), np.float32)
        for bi in range(b):
            for pi in range(p):
                best = 0.0
                for boxes1 in boxes1_list:
                    best = max(best, float(iou_fn(boxes1[bi, pi],
                                                  boxes2[bi, pi])))
                out[bi, pi] = best
        return out

    return {
        "npcs_iou": batch_iou([gt_npcs], pred_npcs),
        "iou": batch_iou(gt_posed, pred_posed),
        "gt_bbox_iou": batch_iou(gt_posed, pred_posed_gt),
    }
