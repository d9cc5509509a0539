"""Headline benchmark: HandTrackNet sequence tracking throughput (frames/sec/chip).

Matches the reference's speed test protocol (network/test.py:74-98): tracked
frames per second at batch_size=1 sequences, num_points=512, the shipped
backbone operating point (sa1 256 / sa2 128, out_dim 384). Runs on whatever
jax.devices() provides (TPU v5e in CI); data is the synthetic SimGrasp-format
set so no licensed assets are needed.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 500 (the BASELINE.json north-star of >=500 tracked
frames/sec/chip on v5e).
"""

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("HOTRACK_JAX_CACHE",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()

    from hotrack_tpu.data import get_dataloader, prepare_batch
    from hotrack_tpu.data.synthetic import generate_simgrasp_dataset
    from hotrack_tpu.mano import synthetic_mano_model
    from hotrack_tpu.config import get_config
    from hotrack_tpu.train import Trainer
    from hotrack_tpu.track import track_hand_sequence

    num_frames = int(os.environ.get("BENCH_FRAMES", 100))
    mano = synthetic_mano_model()

    cache_root = os.path.join(tempfile.gettempdir(),
                              f"hotrack_bench_data_{num_frames}")
    marker = os.path.join(cache_root, ".done")
    if not os.path.exists(marker):
        generate_simgrasp_dataset(cache_root, num_instances=2,
                                  num_frames=num_frames, points_per_part=900,
                                  mano_model=mano)
        open(marker, "w").close()
    os.environ["HOTRACK_DATA_ROOT"] = cache_root

    cfg = get_config({"config": "handtracknet_test_SimGrasp.yml",
                      "experiment_dir": "bench", "save_dir": "bench"},
                     save=False)
    # BENCH_DTYPE=bfloat16 runs the MXU work in bf16 (default: f32 parity)
    dtype = os.environ.get("BENCH_DTYPE")
    if dtype:
        cfg["network"]["compute_dtype"] = dtype
    loader = get_dataloader(cfg, "test")
    raw, _ = loader[0]
    key = jax.random.PRNGKey(0)
    batch = prepare_batch(mano, jax.tree.map(jnp.asarray, raw), key,
                          cfg["num_points"], hand_jitter_scale=0.01)

    trainer = Trainer(cfg)
    trainer.mano = mano
    trainer.init_state(jax.tree.map(lambda a: a[:1], batch))

    def run(b):
        return track_hand_sequence(trainer.model, trainer.variables, mano, b)

    def chained(reps):
        """Chain each rep's output into the next rep's input and fetch the
        final result to the host: block_until_ready through the remote TPU
        tunnel does not reliably wait, so only a data dependency + host
        fetch gives honest wall-clock."""
        pts = batch["hand_points"]
        t0 = time.perf_counter()
        for _ in range(reps):
            b = dict(batch)
            b["hand_points"] = pts
            result = run(b)
            pts = batch["hand_points"] + 0.0 * jnp.mean(result.pred_kp)
        np.asarray(pts)  # force full materialization
        return time.perf_counter() - t0

    chained(1)  # warm-up / compile
    reps = int(os.environ.get("BENCH_REPS", 5))
    dt = chained(reps) / reps
    frames = batch["hand_points"].shape[0]
    fps = frames / dt

    print(json.dumps({
        "metric": "hand_tracking_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 4),
    }))


if __name__ == "__main__":
    main()
