"""Shared gradient-free particle-optimizer machinery (RoseFusion-style).

All three reference optimizers (/root/reference/network/models/
optimization_obj.py:244-333, optimization_hand.py:74-124 and :335-394) share
one update scheme:

  1. scale a fixed pre-sampled Gaussian particle bank by the current
     per-dimension search size (particle 0 is pinned to zero = "no change");
  2. extend each scaled sample to its applied form (the pose optimizers
     prepend the derived quaternion w = sqrt(1 - |qxyz|^2),
     optimization_obj.py:260-262);
  3. evaluate an energy for every perturbed candidate;
  4. keep particles strictly better than particle 0, weight them by
     improvement, and apply the weighted-mean extended delta;
  5. adapt the per-dimension search size proportionally to the weighted
     energy and the mean delta direction, with momentum beta=0.9 applied only
     on consecutive successes; on failure the parameters stay unchanged.

Here that scheme is one `lax.fori_loop` whose body is fully branch-free
(`jnp.where` on the success flag), so a whole optimization jits into a single
device program — no per-iteration host round trips like the reference's
Python while loop (optimization_obj.py:255-302).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class ParticleSpec(NamedTuple):
    """Static configuration of a particle optimizer."""

    iterations: int
    scaling_coefficient2: float      # search-size gain (update_seach_size)
    beta: float = 0.9                # search-size momentum
    weight_eps: float = 0.0          # +eps on the weight sum (obj opt: 1e-5)


def presample_particles(key: jax.Array, particle_size: int, dim: int) -> jnp.ndarray:
    """Fixed unit-Gaussian particle bank with particle 0 zeroed
    (optimization_obj.py:103-107). Sampled once per optimizer instance —
    thread an explicit PRNG key instead of the reference's global np.random
    state."""
    p = jax.random.normal(key, (particle_size, dim))
    return p.at[0].set(0.0)


def quat_extend(scaled: jnp.ndarray) -> jnp.ndarray:
    """Prepend qw = sqrt(1 - qx^2 - qy^2 - qz^2) to (P, 3+k) pose samples
    (optimization_obj.py:260-262)."""
    qw = jnp.sqrt(jnp.clip(1.0 - jnp.sum(scaled[:, :3] ** 2, axis=1), min=0.0))
    return jnp.concatenate([qw[:, None], scaled], axis=1)


def normalize_quat_head(mean_ext: jnp.ndarray) -> jnp.ndarray:
    """Normalize the leading 4 components (optimization_obj.py:285)."""
    q = mean_ext[:4] / (jnp.linalg.norm(mean_ext[:4]) + 1e-8)
    return jnp.concatenate([q, mean_ext[4:]])


def run_particle_opt(
    spec: ParticleSpec,
    presampled: jnp.ndarray,          # (P, D) fixed bank, row 0 == 0
    initial_scale,                    # scalar or (D,)
    params,                           # pytree of current parameters
    energy_fn: Callable,              # (params, sample_ext (P, De)) -> ((P,), (P,))
    apply_mean: Callable,             # (params, mean_ext (De,)) -> params
    extend_sample: Callable = lambda s: s,       # (P, D) -> (P, De)
    postprocess_mean: Callable | None = None,    # (De,) -> (De,)
    search_slice: Callable = lambda m: m,        # (De,) -> (D,)
):
    """Run the shared particle loop; returns (params, last_mean_energy).

    `energy_fn` returns (energy, aux); weighting/better-mask use `energy`, the
    search-size update uses the weighted `aux` (the obj optimizer adapts on
    raw SDF energy while ranking on the x500-scaled energy,
    optimization_obj.py:268-283 — pass aux=sdf there; elsewhere aux=energy).
    """
    dim = presampled.shape[1]
    init_scale = jnp.broadcast_to(
        jnp.asarray(initial_scale, presampled.dtype), (dim,))
    dim_ext = extend_sample(presampled[:1] * init_scale).shape[1]

    def body(_, state):
        params, search, prev_search, prev_success, _ = state
        sample_ext = extend_sample(presampled * search)  # (P, De)
        energy, aux = energy_fn(params, sample_ext)

        origin = energy[0]
        better = energy < origin
        weight = jnp.where(better, origin - energy, 0.0)
        weight_sum = jnp.sum(weight) + spec.weight_eps
        success = jnp.any(better)
        safe_sum = jnp.where(weight_sum > 0, weight_sum, 1.0)

        mean_aux = jnp.where(success, jnp.sum(aux * weight) / safe_sum, aux[0])
        mean_ext = jnp.sum(sample_ext * weight[:, None], axis=0) / safe_sum
        if postprocess_mean is not None:
            mean_ext = postprocess_mean(mean_ext)
        mean_ext = jnp.where(success, mean_ext, jnp.zeros((dim_ext,)))

        new_params = apply_mean(params, mean_ext)
        params = jax.tree.map(
            lambda new, old: jnp.where(success, new, old), new_params, params)

        # search = E * c2 * |m| / ||m|| + 1e-3 (optimization_obj.py:239-242)
        s = jnp.abs(search_slice(mean_ext)) + 1e-3
        new_search = mean_aux * spec.scaling_coefficient2 * s / jnp.linalg.norm(s) + 1e-3
        both = jnp.logical_and(prev_success, success)
        new_search = jnp.where(
            both, spec.beta * new_search + (1 - spec.beta) * prev_search, new_search)
        prev_search = jnp.where(success, new_search, prev_search)
        return params, new_search, prev_search, success, mean_aux

    state = (params, init_scale, init_scale, jnp.asarray(True), jnp.asarray(0.0))
    params, _, _, _, last_energy = jax.lax.fori_loop(
        0, spec.iterations, body, state)
    return params, last_energy
