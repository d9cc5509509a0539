"""Point-cloud primitive ops, XLA-native and fully jittable.

These replace the reference's custom CUDA extension
(/root/reference/network/models/pointnet_lib/src/*.cu) and its pure-torch CPU
fallbacks (/root/reference/network/models/pointnet_utils.py:12-187). Semantics
follow the CUDA kernels where the two differ, since that is what the shipped
models were trained with:

- FPS seeds at index 0 (sampling_gpu.cu:115-117), not at a random point.
- ball query keeps the first <= nsample points with d^2 < r^2 in *index* order
  and pads by repeating the first hit (ball_query_gpu.cu:34-42).
- knn returns the k smallest euclidean (sqrt'd) distances ascending
  (interpolate_gpu.cu:9-57 + pointnet2_utils.py:103).

On TPU these are distance-matrix + top-k problems: the N x M distance matrix
is one MXU matmul (square_distance), and top-k / argmax run on the VPU. The
only inherently sequential op is FPS (npoint dependent argmax steps) which is
a `lax.fori_loop`; a fused Pallas variant lives in ops/pallas/fps.py.

Gradients: index computations (FPS/knn/ball query) are non-differentiable index
ops; gather/group/interpolate differentiate through `take_along_axis`, whose
adjoint is a deterministic segment-sum (better than the reference's atomicAdd
scatter, group_points_gpu.cu:25).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared L2 distances. src (B, N, C), dst (B, M, C) -> (B, N, M).

    Expanded-form matmul (pointnet_utils.py:56-77) so the inner product rides
    the MXU instead of materializing (B, N, M, C) differences.
    """
    d = -2.0 * jnp.matmul(src, jnp.swapaxes(dst, -1, -2))
    d = d + jnp.sum(src**2, axis=-1)[..., :, None]
    d = d + jnp.sum(dst**2, axis=-1)[..., None, :]
    return d


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points (B, N, C), idx (B, S) or (B, S1, .., Sk) -> (B, *idx, C)
    (pointnet_utils.py:80-97).

    At training-scale shapes on TPU this dispatches to the one-hot-MXU
    gather kernel (ops/pallas/gather_mm.py): XLA's random row gathers run
    at a few % of HBM bandwidth and, with their scatter-add adjoints, are
    ~40% of the train step's device time (scripts/trace_train.py). The
    kernel is bit-exact forward; grads agree to f32 round-off. Small
    (batch-1 tracking scan) shapes stay on the XLA gather — they are
    launch-latency-bound, not bandwidth-bound. HOTRACK_NO_PALLAS_GATHER=1
    forces XLA everywhere.
    """
    b = points.shape[0]
    flat_idx = idx.reshape(b, -1)
    if _use_gather_mm(points, flat_idx):
        from .pallas.gather_mm import gather_rows_mm
        out = gather_rows_mm(points, flat_idx)
    else:
        out = jnp.take_along_axis(points, flat_idx[..., None], axis=1)
    return out.reshape(idx.shape + (points.shape[-1],))


def _use_gather_mm(points, flat_idx) -> bool:
    import os
    if os.environ.get("HOTRACK_NO_PALLAS_GATHER"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if points.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    b, n, c = points.shape
    rows = b * flat_idx.shape[1]
    # worth it when the flattened gather is large (training batches); the
    # VMEM-resident source block must fit comfortably (N*C + 3 bf16 planes)
    min_rows = int(os.environ.get("HOTRACK_GATHER_MM_MIN_ROWS", 16384))
    return rows >= min_rows and n * c <= 512 * 512 and n <= 1024


def gather_operation(feature: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feature (B, C, N), idx (B, S) -> (B, C, S) (pointnet_utils.py:100-103)."""
    return jnp.take_along_axis(feature, idx[:, None, :], axis=2)


def group_operation(feature: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feature (B, C, N), idx (B, S, K) -> (B, C, S, K)
    (pointnet_utils.py:106-109)."""
    b, c, n = feature.shape
    _, s, k = idx.shape
    gathered = jnp.take_along_axis(feature, idx.reshape(b, 1, s * k), axis=2)
    return gathered.reshape(b, c, s, k)


def knn_point(k: int, query: jnp.ndarray, data: jnp.ndarray):
    """k nearest neighbors of `query` (B, S, C) among `data` (B, N, C).

    Returns (dist (B, S, k) ascending sqrt distances, idx (B, S, k)).
    Matches the CUDA knn wrapper (pointnet2_utils.py:79-109): distances are
    sqrt'd, neighbors ascend, ties resolve to the lower index, and the
    distances carry NO gradient (KNN.backward returns None — also saves the
    infinite d(sqrt)/dx at the d=0 self-match).
    """
    neg_d2 = -square_distance(query, data)  # (B, S, N)
    val, idx = jax.lax.top_k(neg_d2, k)
    dist = jnp.sqrt(jnp.clip(-val, min=0.0))
    return jax.lax.stop_gradient(dist), idx


def three_nn(query: jnp.ndarray, data: jnp.ndarray):
    """3 nearest neighbors; returns *squared* distances ascending + indices
    (pointnet_utils.py:35-43 CPU semantics, which the FP layer consumes).

    The distances carry NO gradient, matching the reference's CUDA op
    (pointnet2_utils.py:137-139: ThreeNN.backward returns None), i.e. the
    semantics its published models were trained with: the FP layer's
    1/(d^2+1e-8) interpolation weights are constants in the backward pass.
    (The reference's CPU fallback diverges from its own CUDA path here and
    DOES backprop through the sorted distances — through a self-match at
    d^2 = 0 that 1/(d^2+1e-8) turns into a ~1e16-conditioned gradient; we
    deliberately follow the CUDA semantics, which are also the only
    numerically sane choice.)"""
    neg_d2 = -square_distance(query, data)
    val, idx = jax.lax.top_k(neg_d2, 3)
    return jax.lax.stop_gradient(jnp.clip(-val, min=0.0)), idx


def three_interpolate(points: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """points (B, C, M), idx (B, N, 3), weight (B, N, 3) -> (B, C, N)
    (pointnet_utils.py:46-53). Differentiable via take_along_axis."""
    gathered = group_operation(points, idx)  # (B, C, N, 3)
    return jnp.sum(gathered * weight[:, None, :, :], axis=-1)


def farthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          valid_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Iterative farthest point sampling. xyz (B, N, 3) -> idx (B, npoint).

    Seeds deterministically at index 0 like the reference CUDA kernel
    (sampling_gpu.cu:115-117); the running min-distance recursion matches the
    CPU fallback (pointnet_utils.py:126-137). `valid_mask` (B, N) excludes
    padded points from ever being selected (TPU static-shape support for the
    reference's variable-size clouds).

    On TPU this dispatches to the Pallas kernel (ops/pallas/fps.py), which
    keeps cloud + min-distances in VMEM across the whole sequential scan —
    measured 13.7x faster than the XLA fori_loop inside a tracking scan
    (17.8 ms vs 244.6 ms per 100-frame sequence on v5e). Identical indices.
    Set HOTRACK_NO_PALLAS_FPS=1 to force the XLA path.
    """
    import os
    if (jax.default_backend() == "tpu"
            and not os.environ.get("HOTRACK_NO_PALLAS_FPS")):
        from .pallas.fps import farthest_point_sample_pallas
        return farthest_point_sample_pallas(xyz, npoint, valid_mask)
    return _farthest_point_sample_xla(xyz, npoint, valid_mask)


@partial(jax.jit, static_argnames=("npoint",))
def _farthest_point_sample_xla(xyz: jnp.ndarray, npoint: int,
                               valid_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pure-XLA FPS (fori_loop of masked argmax steps)."""
    b, n, _ = xyz.shape
    big = jnp.asarray(1e10, xyz.dtype)
    if valid_mask is None:
        distance0 = jnp.full((b, n), big)
    else:
        # invalid points get distance -1 so argmax never picks them
        distance0 = jnp.where(valid_mask, big, -1.0)
    farthest0 = jnp.zeros((b,), jnp.int32)
    centroids0 = jnp.zeros((b, npoint), jnp.int32)

    def body(i, state):
        centroids, distance, farthest = state
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return centroids, distance, farthest

    centroids, _, _ = jax.lax.fori_loop(0, npoint, body,
                                        (centroids0, distance0, farthest0))
    return centroids


def query_ball_point(radius: float, nsample: int, xyz: jnp.ndarray,
                     new_xyz: jnp.ndarray,
                     valid_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Ball query: for each center, the first <= nsample point indices with
    d^2 < radius^2 in index order, padded with the first hit
    (ball_query_gpu.cu:9-46). xyz (B, N, 3), new_xyz (B, S, 3) -> (B, S, nsample).
    """
    b, n, _ = xyz.shape
    s = new_xyz.shape[1]
    d2 = square_distance(new_xyz, xyz)  # (B, S, N)
    within = d2 < radius * radius
    if valid_mask is not None:
        within = jnp.logical_and(within, valid_mask[:, None, :])
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, s, n), dimension=2)
    cand = jnp.where(within, iota, n)
    # smallest `nsample` indices: top_k on negated values
    neg_topk, _ = jax.lax.top_k(-cand, nsample)
    group_idx = -neg_topk  # ascending index order
    first = group_idx[:, :, :1]
    first = jnp.where(first == n, 0, first)  # no hits at all -> index 0
    return jnp.where(group_idx == n, first, group_idx)


def sample_and_group_all(xyz: jnp.ndarray, points: jnp.ndarray | None):
    """Single global group (pointnet_utils.py:170-187). xyz (B, N, 3),
    points (B, N, D) -> new_xyz (B, 1, 3) zeros, new_points (B, 1, N, 3+D)."""
    b, n, c = xyz.shape
    new_xyz = jnp.zeros((b, 1, c), xyz.dtype)
    grouped = xyz.reshape(b, 1, n, c)
    if points is not None:
        grouped = jnp.concatenate([grouped, points.reshape(b, 1, n, -1)], axis=-1)
    return new_xyz, grouped
