"""Online DeepSDF shape-code refinement from tracked observations.

Parity: gf_optimize_obj's shape-update path (/root/reference/network/models/
optimization_obj.py:305-397):

  - after each frame's pose solve, keep observed points with |SDF| < 2 cm,
    transform them into the instance frame, and mix them into a running
    merged cloud (1/merge_num of the buffer is replaced per frame, :310-328);
  - surface normals are estimated per frame and oriented toward the camera
    (:335-343 — the reference calls open3d; here it's local-PCA via knn +
    eigh, fully on device);
  - every 10 merges, run Adam on the latent code against normal-offset
    pseudo-SDF samples: outside = p + n*U(0,0.1) with sdf=+mu, surface sdf=0,
    inside = p - n*U(0,0.05) with sdf=-mu; soft-L1 clamped to +-0.2 with the
    sign-asymmetric weighting loss *= 1 + 0.5*sign(gt)*sign(gt-pred), plus
    1e-4 L2 on the code; lr 1e-3 halved at the halfway point (:345-384).

Everything is jittable; the latent optimization is one lax.fori_loop with an
inlined Adam (so it nests cleanly under jit without optax state plumbing).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.pointops import knn_point


@partial(jax.jit, static_argnames=("k",))
def estimate_normals(points: jnp.ndarray, camera: jnp.ndarray,
                     k: int = 30) -> jnp.ndarray:
    """Local-PCA normals oriented toward the camera.

    points (N, 3), camera (3,) -> normals (N, 3). Replaces
    open3d estimate_normals + orientation flip (optimization_obj.py:335-343).
    """
    _, idx = knn_point(k, points[None], points[None])
    nbrs = points[idx[0]]                      # (N, k, 3)
    centered = nbrs - jnp.mean(nbrs, axis=1, keepdims=True)
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    _, eigvecs = jnp.linalg.eigh(cov)          # ascending
    normals = eigvecs[..., 0]                  # smallest eigval -> normal
    toward = jnp.sum(normals * (camera - points), axis=-1, keepdims=True)
    return normals * jnp.where(toward > 0, 1.0, -1.0)


@partial(jax.jit, static_argnames=("decoder_apply", "num_iterations"))
def update_shape(decoder_apply, variables, latent: jnp.ndarray,
                 obj_pc: jnp.ndarray, normals: jnp.ndarray, key: jax.Array,
                 num_iterations: int = 100, clamp_dist: float = 0.2,
                 lr: float = 1e-3, l2reg: bool = True) -> jnp.ndarray:
    """Refine the latent code against pseudo-SDF samples; returns new latent.

    obj_pc/normals (N, 3) in the DeepSDF instance frame."""
    n = obj_pc.shape[0]
    latent = latent.reshape(-1)
    dim = latent.shape[0]

    def loss_fn(lat, mu_pos, mu_neg):
        outside = obj_pc + normals * mu_pos
        inside = obj_pc - normals * mu_neg
        xyz = jnp.concatenate([outside, obj_pc, inside], axis=0)
        sdf_gt = jnp.concatenate([mu_pos[:, 0], jnp.zeros((n,)),
                                  -mu_neg[:, 0]], axis=0)
        sdf_gt = jnp.clip(sdf_gt, -clamp_dist, clamp_dist)
        lat_in = jnp.broadcast_to(lat, (xyz.shape[0], dim))
        pred = decoder_apply(variables, jnp.concatenate([lat_in, xyz], -1))[:, 0]
        pred = jnp.clip(pred, -clamp_dist, clamp_dist)
        # soft L1 (optimization_obj.py:14-21) + sign-asymmetric weight (:377-379)
        loss = jnp.clip(jnp.abs(pred - sdf_gt), 0.0, 100.0)
        loss = loss * (1.0 + 0.5 * jnp.sign(sdf_gt) * jnp.sign(sdf_gt - pred))
        total = jnp.mean(loss)
        if l2reg:
            total = total + 1e-4 * jnp.mean(lat**2)
        return total

    b1, b2, eps = 0.9, 0.999, 1e-8

    def body(e, state):
        lat, m, v, k0 = state
        k0, k1, k2 = jax.random.split(k0, 3)
        mu_pos = jax.random.uniform(k1, (n, 1)) * 0.1
        mu_neg = jax.random.uniform(k2, (n, 1)) * 0.05
        g = jax.grad(loss_fn)(lat, mu_pos, mu_neg)
        cur_lr = jnp.where(e >= num_iterations // 2, lr / 2.0, lr)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g**2
        t = (e + 1).astype(jnp.float32)
        mhat = m / (1 - b1**t)
        vhat = v / (1 - b2**t)
        lat = lat - cur_lr * mhat / (jnp.sqrt(vhat) + eps)
        return lat, m, v, k0

    state = (latent, jnp.zeros_like(latent), jnp.zeros_like(latent), key)
    latent, _, _, _ = jax.lax.fori_loop(0, num_iterations, body, state)
    return latent


@jax.jit
def merge_observations(merged_pc, merged_normals, new_pc, new_normals,
                       new_valid, merge_num, key):
    """Mix a new frame's instance-frame observations into the fixed-size
    merged buffer (optimization_obj.py:318-328): 1/merge_num of the buffer is
    replaced by (a random subset of) the new points.

    merged_pc/normals (N, 3); new_pc/normals (M, 3) with validity mask
    new_valid (M,) (padded frames); merge_num: running count AFTER this merge.
    """
    n = merged_pc.shape[0]
    k1, k2 = jax.random.split(key)
    choose = (n / merge_num).astype(jnp.int32) if hasattr(merge_num, "dtype") \
        else jnp.asarray(n // merge_num, jnp.int32)

    # sample `n` candidate slots from the new points (valid-weighted)
    w = new_valid.astype(jnp.float32) + 1e-9
    new_idx = jax.random.choice(k1, new_pc.shape[0], (n,), p=w / jnp.sum(w))
    cand_pc = new_pc[new_idx]
    cand_nrm = new_normals[new_idx]

    # replace a random `choose`-sized subset of buffer slots
    slot_order = jax.random.permutation(k2, n)
    ranks = jnp.argsort(slot_order)
    replace = ranks < choose
    out_pc = jnp.where(replace[:, None], cand_pc, merged_pc)
    out_nrm = jnp.where(replace[:, None], cand_nrm, merged_normals)
    return out_pc, out_nrm
