"""Online (streaming) tracking: feed frames one at a time.

The offline drivers (`track_hand_sequence`, `track_obj_sequence`) take the
whole sequence up front and scan over it — the right shape for dataset
evaluation, but a live camera produces frames incrementally. The reference's
per-frame Python loop (track_network.py:159-226, 351-369) streams trivially;
these classes restore that capability TPU-style: the per-frame step is
jitted ONCE (compiled the first call, cached after) and carries the
frame-to-frame state explicitly, so a serving loop is

    tracker = HandTracker(handnet, variables, mano, ...)
    state = tracker.init_state(frame0_points, frame0_kp_estimate)
    for frame in camera:                       # includes frame 0
        state, out = tracker.step(state, frame["hand_points"], ...)

Parity by construction: `HandTracker` runs the SAME step function the scan
driver uses (`track/hand._make_hand_step`), so offline and online tracking
produce identical trajectories (pinned by tests/test_stream.py). The object
tracker's step is `optimize_obj_pose` itself, exactly the scan body of
`track_obj_sequence`.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Iterable, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..mano.model import ManoModel
from ..opt.hand_shape import kp2length, optimize_hand_shape
from ..opt.obj_pose import optimize_obj_pose
from .hand import _make_hand_step, _rest_palm_template


def _serve(step_fn, state, inputs: Iterable, fetch,
           depth: int = 1) -> Iterator[dict]:
    """Pipelined serving loop shared by both trackers.

    Dispatches frame f+depth BEFORE fetching frame f's outputs, and starts
    each output's device->host copy asynchronously (`copy_to_host_async`)
    the moment its step is dispatched: a blocking `np.asarray` on a device
    array costs one full relay round-trip PER ARRAY, serialized on the host
    thread (measured ~31 ms each through the axon tunnel — a 3-key fetch
    made the combined loop 81 ms/frame, no better than blocking), while the
    async copy pipelines every transfer behind the next frames' compute so
    the later `np.asarray` finds the bytes already on host (measured: obj
    serve 32.8 -> 22.9 ms/frame, combined hand+obj 81 -> ~bound —
    BENCHMARKS.md "Realistic serving loop").

    `depth` = frames of added consumer latency. depth=1 (default) hides the
    round-trip behind ONE frame of compute — enough when compute >= the
    round-trip (combined hand+obj lands within 3% of device-resident).
    When a single stream's compute is SHORTER than the round-trip
    (obj-only: ~18 ms compute vs ~31 ms RT), the exposed tail costs
    ~5-6 ms/frame (round-5 decomposition: the gap is neither upload nor
    fetch-key count); depth=2 buys a second frame of compute to hide it
    (measured: obj-only 23.7 -> ~bound). On a local-PCIe TPU host the
    round-trip is sub-ms and depth=1 is always enough."""
    from collections import deque
    pending: deque = deque()
    for inp in inputs:
        if isinstance(inp, dict):
            state, out = step_fn(state, **inp)
        else:
            state, out = step_fn(state, inp)
        sel = {k: out[k] for k in fetch} if fetch is not None else out
        for leaf in jax.tree.leaves(sel):
            try:
                leaf.copy_to_host_async()
            except (AttributeError, NotImplementedError):  # non-jax leaf
                pass
        pending.append(sel)
        if len(pending) > depth:
            yield jax.tree.map(np.asarray, pending.popleft())
    while pending:
        yield jax.tree.map(np.asarray, pending.popleft())


class HandTracker:
    """Streaming hand tracking (HandTrackNet [+ IKNet [+ pose opt]]).

    Constructor arguments mirror `track_hand_sequence`'s per-sequence
    configuration (minus the stacked `frames`/`background_masks`):
    models/variables, MANO, shape/pose particle banks, contact zones, the
    object's SDF volume + distilled model, energy weights. State is an
    opaque pytree of device arrays — hold it on device between frames; the
    per-frame step never transfers to host.
    """

    def __init__(self, handnet, variables: Any, mano_model: ManoModel,
                 iknet=None, ik_variables: Any = None, use_opt: bool = False,
                 shape_mode: int | bool = False,
                 shape_particles: jnp.ndarray | None = None,
                 pose_particles: jnp.ndarray | None = None,
                 zones=None, sdf_volume: jnp.ndarray | None = None,
                 energy_weight: dict | None = None,
                 sdf_voxel_scale: float = 0.003, distilled=None,
                 dtype=jnp.float32):
        self._mano = mano_model
        self._shape_mode = shape_mode
        self._use_iknet = iknet is not None
        self._use_opt = use_opt
        self._shape_particles = shape_particles
        self._dtype = dtype
        step, run_handnet = _make_hand_step(
            handnet, variables, mano_model, iknet=iknet,
            ik_variables=ik_variables, use_opt=use_opt,
            shape_mode=shape_mode, shape_particles=shape_particles,
            pose_particles=pose_particles, zones=zones,
            sdf_volume=sdf_volume, energy_weight=energy_weight,
            sdf_voxel_scale=sdf_voxel_scale, distilled=distilled,
            dtype=dtype)
        self._run_handnet = run_handnet

        def _step(state, xs):
            xs = dict(xs, i=state["i"], jittered_hand_kp=state["init_kp"])
            carry, out = step(state["carry"], xs)
            return dict(state, i=state["i"] + 1, carry=carry), out

        self._step = jax.jit(_step)

        def _init_shape(hand_points0, init_kp, palm0):
            ret0 = run_handnet(hand_points0[None], init_kp[None], palm0)
            shape0, _ = optimize_hand_shape(
                mano_model, shape_particles, kp2length(ret0["pred_kp"]))
            return shape0, _rest_palm_template(mano_model, shape0)

        self._init_shape = jax.jit(_init_shape)

    def init_state(self, hand_points0: jnp.ndarray, init_kp: jnp.ndarray,
                   mano_beta: jnp.ndarray | None = None) -> dict:
        """Build the tracking state from frame 0's observations.

        hand_points0 (N, 3): frame-0 hand cloud (same N every later frame —
        static shapes); init_kp (21, 3): the initial keypoint estimate (the
        dataset's jittered gt offline; any upstream detector's output live).
        mano_beta (10,): annotated shape, used when shape_mode is False/0
        with IKNet (track_network.py:189-191). Frame 0 must then be fed to
        `step` as the first frame (matching the scan, whose shape-opt
        pre-pass also sees frame 0 before the scan consumes it)."""
        dtype = self._dtype
        hand_points0 = jnp.asarray(hand_points0, dtype)
        init_kp = jnp.asarray(init_kp, dtype)
        zero_beta = jnp.zeros((1, 10), dtype)
        palm0 = _rest_palm_template(self._mano, zero_beta)
        if self._shape_mode in (1, 2, 3) and self._use_iknet:
            shape0, palm0 = self._init_shape(hand_points0, init_kp, palm0)
        elif self._use_iknet:
            # gt shape: rest template with the annotated beta
            shape0 = (zero_beta if mano_beta is None
                      else jnp.asarray(mano_beta, dtype).reshape(1, 10))
            palm0 = _rest_palm_template(self._mano, shape0)
        else:
            shape0 = zero_beta
        carry = (jnp.zeros((1, 21, 3), dtype), palm0, shape0)
        if self._shape_mode == 3:
            carry = carry + (jnp.zeros((64, 15), dtype), jnp.asarray(0))
        return {"i": jnp.asarray(0), "init_kp": init_kp, "carry": carry}

    def step(self, state: dict, hand_points: jnp.ndarray,
             background_mask: jnp.ndarray | None = None,
             obj_rotation: jnp.ndarray | None = None,
             obj_translation: jnp.ndarray | None = None,
             projection: jnp.ndarray | None = None):
        """One frame: (state, out dict with pred_kp (21, 3),
        baseline_pred_kp, global_rotation/translation, MANO_theta, ...).

        With use_opt, pass the frame's background_mask (H, W bool, True =
        background), the object pose (obj_rotation (3, 3), obj_translation
        (3, 1)) and projection (fx, fy, cx, cy, w, h) — the same per-frame
        fields the scan driver slices from `frames`."""
        xs = {"hand_points": jnp.asarray(hand_points, self._dtype),
              "bg_mask": (jnp.zeros((1, 1), bool) if background_mask is None
                          else background_mask)}
        if self._use_opt:
            xs["obj_rotation"] = obj_rotation
            xs["obj_translation"] = obj_translation
            xs["projection"] = jnp.asarray(projection, self._dtype)
        return self._step(state, xs)

    def serve(self, state: dict, frames: Iterable,
              fetch: Sequence[str] | None = ("pred_kp",),
              depth: int = 1) -> Iterator[dict]:
        """Pipelined serving: yields one host dict per frame, in
        order, fetching only the `fetch` keys (None = everything). `frames`
        is an iterable of per-frame `step` kwargs dicts (hand_points,
        background_mask, obj_rotation, obj_translation, projection) or bare
        hand_points arrays. `depth` frames of latency buy hiding the
        device->host round-trip behind that many frames of compute; use
        `step` directly when the final state must be carried onward."""
        return _serve(self.step, state, frames, fetch, depth)


class ObjTracker:
    """Streaming object 6-DoF tracking: per-frame gradient-free particle
    optimization seeded with the previous pose — exactly the scan body of
    `track_obj_sequence` (reference per-frame loop: track_network.py:
    351-369). State = (rotation (3, 3), translation (3, 1))."""

    def __init__(self, sdf_volume: jnp.ndarray, presampled: jnp.ndarray,
                 voxel_scale: float = 0.002, bbox_res: int = 201,
                 distilled=None):
        @partial(jax.jit, static_argnames=())
        def _step(state, pcld):
            r, t = state
            r, t, energy = optimize_obj_pose(
                sdf_volume, presampled, pcld, r, t,
                voxel_scale=voxel_scale, bbox_res=bbox_res,
                distilled=distilled)
            return (r, t), {"rotation": r, "translation": t,
                            "sdf_energy": energy}

        self._step = _step

    def init_state(self, rotation: jnp.ndarray, translation: jnp.ndarray):
        """Initial pose (frame 0's estimate, e.g. jittered gt offline)."""
        return (jnp.asarray(rotation), jnp.asarray(translation))

    def step(self, state, obj_points: jnp.ndarray):
        """One frame: obj_points (N, 3) -> (state, out dict)."""
        return self._step(state, obj_points)

    def serve(self, state, clouds: Iterable,
              fetch: Sequence[str] | None = ("rotation", "translation"),
              depth: int = 1) -> Iterator[dict]:
        """Pipelined serving over an iterable of (N, 3) object
        clouds; see HandTracker.serve. Through a remote relay whose
        round-trip exceeds one frame's ~18 ms compute, depth=2 recovers
        the device-resident bound (BENCHMARKS round 5)."""
        return _serve(self.step, state, clouds, fetch, depth)


def serve_combined(hand_tracker: HandTracker, obj_tracker: ObjTracker,
                   hand_state: dict, obj_state, frames: Iterable,
                   fetch: Sequence[str] | None = (
                       "pred_kp", "obj_rotation", "obj_translation"),
                   depth: int = 1) -> Iterator[dict]:
    """Joint hand + object serving: both poses out of every frame — the
    full HOTrack product shape (the reference runs both models per frame,
    track_network.py:159-226 + 351-369). One double-buffered loop drives
    both trackers, dispatching frame f+1's hand AND object steps before
    fetching frame f's selected outputs, so the device->host round-trip
    hides behind the combined compute.

    `frames` is an iterable of dicts carrying 'obj_points' (N, 3) plus the
    HandTracker.step kwargs (hand_points, background_mask, obj_rotation,
    obj_translation, projection). Object outputs are prefixed 'obj_' to
    avoid colliding with hand keys. Bitwise-equal to stepping both trackers
    explicitly in the same order (tests/test_stream.py).
    """
    def step(state, obj_points=None, **hand_kwargs):
        h_state, o_state = state
        h_state, h_out = hand_tracker.step(h_state, **hand_kwargs)
        o_state, o_out = obj_tracker.step(o_state, obj_points)
        out = dict(h_out)
        out.update({f"obj_{k}": v for k, v in o_out.items()})
        return (h_state, o_state), out

    return _serve(step, (hand_state, obj_state), frames, fetch, depth)
