"""Generic pose/segmentation/NOCS losses.

Parity: /root/reference/network/models/loss.py (largely legacy — shipped
configs only use the losses inside hand_network.py — but part of the public
surface). Everything is jittable jnp; the symmetric NOCS loss's per-batch
random sampling takes an explicit PRNG key instead of torch's global RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..pose.part_dof import pose_with_part
from ..pose.rotations import matrix_to_rotvec

EPS = 1e-6


def vector_loss(x, loss: str = "l2"):
    """(..., D) -> (...) vector norm (loss.py:13-20)."""
    if loss == "l2":
        return jnp.linalg.norm(x, axis=-1)
    if loss == "l1":
        return jnp.sum(jnp.abs(x), axis=-1)
    raise ValueError(loss)


def choose_coord_by_label(x, labels, last_dim: int = 3):
    """Select per-part coordinate predictions by segmentation label
    (loss.py:23-40). x (B, N, last_dim*P), labels (B, N) -> (B, N, last_dim).
    Labels >= P select zeros (the reference pads 2 zero parts)."""
    if labels is None:
        return x
    shape = x.shape
    p = shape[-1] // last_dim
    x = x.reshape(shape[:-1] + (p, last_dim))
    x = jnp.concatenate([x, jnp.zeros_like(x[..., :2, :])], axis=-2)
    return jnp.take_along_axis(
        x, labels[..., None, None].astype(jnp.int32).clip(0, p + 1), axis=-2
    )[..., 0, :]


def compute_nocs_loss(nocs_per_part, nocs_gt, labels=None, confidence=None,
                      loss: str = "l2", self_supervise: bool = True,
                      per_instance: bool = False, sym: bool = False,
                      pwm_num: int = 128, key=None):
    """NOCS regression loss incl. confidence weighting (loss.py:43-82).
    Channels-last here: nocs_per_part (B, N, 3P), nocs_gt (B, N, 3)."""
    conf = (confidence if (confidence is not None and self_supervise)
            else jnp.ones(nocs_gt.shape[:-1], nocs_gt.dtype))

    mask = None
    if labels is not None and nocs_per_part.shape[-1] > 3:
        nocs_pred = choose_coord_by_label(nocs_per_part, labels)
        num_parts = nocs_per_part.shape[-1] // 3
        mask = (labels < num_parts).astype(nocs_gt.dtype)
    else:
        nocs_pred = nocs_per_part

    if sym:
        return compute_sym_nocs_loss(nocs_pred, nocs_gt, labels,
                                     pwm_num=pwm_num, key=key)

    raw = vector_loss(nocs_pred - nocs_gt, loss=loss) * conf
    if mask is None:
        ret = jnp.mean(raw)
    else:
        ret = jnp.sum(raw * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    ret = ret - 0.1 * jnp.mean(jnp.log(conf))
    return (ret, raw) if per_instance else ret


def compute_sym_nocs_loss(nocs_pred, nocs_gt, labels, pwm_num: int = 128,
                          key=None):
    """Rotation-symmetric NOCS loss: y + radial distance, plus a pairwise
    distance-matrix consistency term on sampled part-0 points
    (loss.py:85-120)."""
    xg, yg, zg = nocs_gt[..., 0], nocs_gt[..., 1], nocs_gt[..., 2]
    xp, yp, zp = nocs_pred[..., 0], nocs_pred[..., 1], nocs_pred[..., 2]
    dist = jnp.sqrt((yg - yp) ** 2
                    + jnp.abs(xg**2 + zg**2 - xp**2 - zp**2) + 1e-8)
    mask = (labels == 0).astype(dist.dtype)
    valid = (jnp.sum(mask, axis=-1) > 0).astype(dist.dtype)
    dist_loss = jnp.sum(dist * mask) / jnp.clip(jnp.sum(mask), min=1.0)

    key = key if key is not None else jax.random.PRNGKey(0)
    b, n = labels.shape
    # sample part-0 indices per batch row (fall back to any point when empty)
    weights = mask + 1e-9
    idxs = jax.vmap(lambda k, w: jax.random.choice(
        k, n, (pwm_num,), p=w / jnp.sum(w)))(jax.random.split(key, b), weights)
    sg = jnp.take_along_axis(nocs_gt, idxs[..., None], axis=1)
    sp = jnp.take_along_axis(nocs_pred, idxs[..., None], axis=1)

    def dist_mat(pts):
        return jnp.linalg.norm(pts[:, :, None] - pts[:, None, :], axis=-1)

    pwm = jnp.mean(jnp.abs(dist_mat(sg) - dist_mat(sp)), axis=(-1, -2))
    pwm = jnp.sum(pwm * valid) / jnp.clip(jnp.sum(valid), min=1.0)
    return dist_loss, pwm


def compute_miou_loss(pred, labels, per_instance: bool = False):
    """Soft mIoU segmentation loss (loss.py:123-135). pred (B, N, P) probs,
    labels (B, N) int."""
    c = pred.shape[-1]
    gt = jax.nn.one_hot(labels, c, dtype=pred.dtype)
    inter = jnp.sum(pred * gt, axis=-2)
    union = jnp.sum(pred + gt, axis=-2) - inter
    miou = inter / (union + EPS)
    loss = 1.0 - jnp.mean(miou)
    return (loss, miou) if per_instance else loss


def compute_hard_miou_loss(pred, gt, num_parts: int, per_instance: bool = False):
    """(loss.py:138-149). pred/gt (B, N) int labels."""
    po = jax.nn.one_hot(pred, num_parts)
    go = jax.nn.one_hot(gt, num_parts)
    inter = jnp.sum(po * go, axis=-2)
    union = jnp.sum(po + go, axis=-2) - inter
    miou = inter / (union + EPS)
    loss = 1.0 - jnp.mean(miou)
    return (loss, miou) if per_instance else loss


def compute_focal_loss(inputs, targets):
    """Binary focal loss with gamma=2 on logits (loss.py:151-155)."""
    bce = jnp.maximum(inputs, 0) - inputs * targets + jnp.log1p(
        jnp.exp(-jnp.abs(inputs)))
    pt = jnp.exp(-bce)
    return jnp.mean((1 - pt) ** 2 * bce)


def rot_trace_loss(rot1, rot2, metric: str = "l1"):
    """Rotation loss family on trace/Frobenius/exp coords (loss.py:157-185)."""
    if "exp" in metric:
        diff = matrix_to_rotvec(rot1) - matrix_to_rotvec(rot2)
        return diff**2 if metric == "exp_l2" else jnp.abs(diff)
    if metric == "frob":
        d = rot1 - rot2
        m = jnp.matmul(d, jnp.swapaxes(d, -1, -2))
        return m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    m = jnp.matmul(rot1, jnp.swapaxes(rot2, -1, -2))
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    if metric == "l2":
        return (tr - 3.0) ** 2
    if metric == "l1":
        return jnp.abs(tr - 3.0)
    if "raw" in metric:
        return jnp.zeros_like(tr)
    raise ValueError(metric)


def rot_yaxis_loss(rot1, rot2, metric: str = "l2"):
    """Y-axis-only rotation loss for symmetric parts (loss.py:188-196)."""
    diff = rot1[..., 1] - rot2[..., 1]
    if metric == "l2":
        return jnp.sum(diff**2, axis=-1)
    if metric == "l1":
        return jnp.linalg.norm(diff, axis=-1)
    raise ValueError(metric)


def trans_loss(t1, t2, metric: str = "l1"):
    """(loss.py:199-206). t (..., 3, 1)."""
    d = t1 - t2
    if metric == "l2":
        return jnp.sum(d**2, axis=(-1, -2))
    if metric == "l1":
        return jnp.linalg.norm(d[..., 0], axis=-1)
    raise ValueError(metric)


def scale_loss(s1, s2, metric: str = "l1"):
    return (s1 - s2) ** 2 if metric == "l2" else jnp.abs(s1 - s2)


def compute_point_pose_loss(gt_pose: dict, pred_pose: dict, pts, metric="l1"):
    """Pose loss measured through posed canonical points (loss.py:219-231)."""
    gt_pts = pose_with_part(gt_pose, pts)
    pred_pts = pose_with_part(pred_pose, pts)
    diff = gt_pts - pred_pts
    dist = (jnp.sum(diff**2, -1) if metric == "l2"
            else jnp.linalg.norm(diff, axis=-1))
    return jnp.mean(dist), dist


def compute_part_dof_loss(gt: dict, pred: dict, pose_loss_type: dict,
                          collapse: bool = True):
    """(loss.py:234-246)."""
    loss_dict = {
        "sloss": scale_loss(gt["scale"], pred["scale"], pose_loss_type["s"]),
        "tloss": trans_loss(gt["translation"], pred["translation"],
                            pose_loss_type["t"]),
        "rloss": rot_trace_loss(gt["rotation"], pred["rotation"],
                                pose_loss_type["r"]),
    }
    if collapse:
        loss_dict = {k: jnp.mean(v) for k, v in loss_dict.items()}
    return loss_dict
