"""Streaming (per-frame) latency of the full hand-stage deployment path on
device: HandTracker.step at the production operating point (512 pts,
384-dim handnet, IKNet, 5120x778x5 pose opt, distilled SDF). The scan
driver amortizes dispatch across the whole sequence; a live serving loop
pays one dispatch per frame through the axon relay — this measures that
honest per-frame latency.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HOTRACK_JAX_CACHE", ".jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench
    from hotrack_tpu.opt.hand_pose import load_contact_zones
    from hotrack_tpu.opt.particle import presample_particles
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import distill_sdf_volume
    from hotrack_tpu.track import HandTracker
    from hotrack_tpu.train.trainer import Trainer
    from hotrack_tpu.mano.model import synthetic_mano_model

    mano = synthetic_mano_model()
    cfg, batch, handnet_tr = bench._hand_setup(mano)
    ik_cfg = dict(cfg)
    ik_cfg["network"] = dict(cfg["network"], type="iknet")
    iknet_tr = Trainer(ik_cfg)
    iknet_tr.mano = mano
    iknet_tr.init_state(jax.tree.map(lambda a: a[:1], batch))

    volume = synthetic_box_sdf_setup(151, 0.003)
    distilled = distill_sdf_volume(volume, 0.003, jax.random.PRNGKey(0))
    zones = load_contact_zones()
    pose_particles = presample_particles(jax.random.PRNGKey(12), 5120, 16)
    shape_particles = presample_particles(jax.random.PRNGKey(11), 5120, 10)
    rng = np.random.RandomState(13)
    mask = jnp.asarray(rng.rand(480, 640) > 0.5)
    weights = {"penetrate_sum_loss": 1.0, "sil_loss": 0.1,
               "attraction_loss": 0.05, "vis_regu_loss": 10.0,
               "invis_regu_loss": 0.0, "temporal_smooth": 1.0}

    tracker = HandTracker(
        handnet_tr.model, handnet_tr.variables, mano,
        iknet=iknet_tr.model, ik_variables=iknet_tr.variables,
        use_opt=True, shape_mode=1, shape_particles=shape_particles,
        pose_particles=pose_particles, zones=zones, sdf_volume=volume,
        energy_weight=weights, sdf_voxel_scale=0.003, distilled=distilled)

    t0 = time.perf_counter()
    state = tracker.init_state(batch["hand_points"][0],
                               batch["jittered_hand_kp"][0])
    np.asarray(state["carry"][2])
    print(f"init_state (frame-0 shape opt incl. compile): "
          f"{time.perf_counter() - t0:.2f} s", flush=True)

    frames = batch["hand_points"]
    obj_r = batch["gt_obj_pose"]["rotation"]
    obj_t = batch["gt_obj_pose"]["translation"]
    proj = batch["projection"]

    def one(state, f):
        return tracker.step(state, frames[f], background_mask=mask,
                            obj_rotation=obj_r[f], obj_translation=obj_t[f],
                            projection=proj[f])

    state, out = one(state, 0)  # compile
    np.asarray(out["pred_kp"])

    # serving-style loop: per-frame host fetch of the prediction (a live
    # consumer reads every frame's keypoints)
    n = min(30, frames.shape[0])
    best = float("inf")
    for _ in range(4):
        s = state
        t0 = time.perf_counter()
        for f in range(n):
            s, out = one(s, f)
            kp = np.asarray(out["pred_kp"])  # host fetch per frame
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"streaming step (per-frame fetch): {best * 1000:.1f} ms/frame "
          f"= {1.0 / best:.1f} frames/s", flush=True)

    # pipelined: keep state on device, fetch only a scalar probe at the end
    best = float("inf")
    for _ in range(4):
        s = state
        t0 = time.perf_counter()
        for f in range(n):
            s, out = one(s, f)
        np.asarray(s["carry"][0])
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"streaming step (device-resident state): {best * 1000:.1f} "
          f"ms/frame = {1.0 / best:.1f} frames/s", flush=True)

    # realistic serving loop: each frame ARRIVES on the host (sensor), is
    # uploaded, stepped, and only the (21, 3) keypoints come back
    host_frames = [np.asarray(frames[f]) for f in range(n)]
    host_r = [np.asarray(obj_r[f]) for f in range(n)]
    host_t = [np.asarray(obj_t[f]) for f in range(n)]
    host_p = [np.asarray(proj[f]) for f in range(n)]

    def one_host(s, f):
        return tracker.step(s, jnp.asarray(host_frames[f]),
                            background_mask=mask,
                            obj_rotation=jnp.asarray(host_r[f]),
                            obj_translation=jnp.asarray(host_t[f]),
                            projection=jnp.asarray(host_p[f]))

    best = float("inf")
    for _ in range(4):
        s = state
        t0 = time.perf_counter()
        for f in range(n):
            s, out = one_host(s, f)
            kp = np.asarray(out["pred_kp"])       # kp-only fetch, blocking
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"serving loop (host upload + kp-only fetch): {best * 1000:.1f} "
          f"ms/frame = {1.0 / best:.1f} frames/s", flush=True)

    # double-buffered serving via the PRODUCT API (HandTracker.serve):
    # dispatch frame f+1 BEFORE fetching frame f's keypoints — jax async
    # dispatch overlaps the relay round-trip with the next frame's compute,
    # so the fetch latency is hidden, not paid
    def frame_kwargs(f):
        return {"hand_points": jnp.asarray(host_frames[f]),
                "background_mask": mask,
                "obj_rotation": jnp.asarray(host_r[f]),
                "obj_translation": jnp.asarray(host_t[f]),
                "projection": jnp.asarray(host_p[f])}

    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for out in tracker.serve(state, (frame_kwargs(f) for f in range(n))):
            kp = out["pred_kp"]                     # host np, one frame behind
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"serving loop (double-buffered kp fetch, tracker.serve): "
          f"{best * 1000:.1f} ms/frame = {1.0 / best:.1f} frames/s",
          flush=True)

    # combined hand + object live loop (serve_combined): the real HOTrack
    # consumer wants BOTH poses out of every frame — the object stage at its
    # reference operating point (2048 particles x 1024 pts x 10 iters, its
    # own 201^3-baked distilled SDF) interleaved with the full hand path
    from hotrack_tpu.track import ObjTracker, serve_combined

    obj_volume = synthetic_box_sdf_setup(201, 0.002)
    obj_distilled = distill_sdf_volume(obj_volume, 0.002, jax.random.PRNGKey(7))
    obj_particles = presample_particles(jax.random.PRNGKey(8), 2048, 6)
    host_obj = [np.asarray(rng.randn(1024, 3), np.float32) * 0.04
                for _ in range(n)]
    obj_tracker = ObjTracker(obj_volume, obj_particles, voxel_scale=0.002,
                             bbox_res=201, distilled=obj_distilled)
    obj_state0 = obj_tracker.init_state(jnp.eye(3), jnp.zeros((3, 1)))

    def combined_kwargs(f):
        return dict(frame_kwargs(f), obj_points=jnp.asarray(host_obj[f]))

    # warm-up (compiles the obj step)
    next(iter(serve_combined(tracker, obj_tracker, state, obj_state0,
                             [combined_kwargs(0)])))

    # blocking reference: explicit two-step loop with per-frame fetches
    best = float("inf")
    for _ in range(4):
        hs, os_ = state, obj_state0
        t0 = time.perf_counter()
        for f in range(n):
            hs, hout = one_host(hs, f)
            os_, oout = obj_tracker.step(os_, jnp.asarray(host_obj[f]))
            kp = np.asarray(hout["pred_kp"])
            rot = np.asarray(oout["rotation"])
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"combined hand+obj loop (blocking per-frame fetch): "
          f"{best * 1000:.1f} ms/frame = {1.0 / best:.1f} frames/s",
          flush=True)

    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for out in serve_combined(tracker, obj_tracker, state, obj_state0,
                                  (combined_kwargs(f) for f in range(n))):
            kp, rot = out["pred_kp"], out["obj_rotation"]
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"combined hand+obj loop (double-buffered, serve_combined): "
          f"{best * 1000:.1f} ms/frame = {1.0 / best:.1f} frames/s",
          flush=True)

    # device-resident bound for the combined loop (fetch only at the end)
    best = float("inf")
    for _ in range(4):
        hs, os_ = state, obj_state0
        t0 = time.perf_counter()
        for f in range(n):
            hs, hout = one_host(hs, f)
            os_, oout = obj_tracker.step(os_, jnp.asarray(host_obj[f]))
        np.asarray(hs["carry"][0]); np.asarray(os_[0])
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"combined hand+obj loop (device-resident bound): "
          f"{best * 1000:.1f} ms/frame = {1.0 / best:.1f} frames/s",
          flush=True)


if __name__ == "__main__":
    main()
