#!/bin/bash
# End-to-end quality re-validation on the synthetic set at the full
# operating point (512 pts, 384-dim backbone, batch 32), current code:
# train HandTrackNet 300 epochs + IKNet 150 -> tracking eval -> full
# handopt pipeline eval. Reproduces BENCHMARKS.md "End-to-end convergence".
set -e
cd "$(dirname "$0")/.."
export HOTRACK_DATA_ROOT="${HOTRACK_DATA_ROOT:-/tmp/synth_quality}"

python - << 'EOF'
import os
from hotrack_tpu.data.synthetic import generate_simgrasp_dataset
root = os.environ["HOTRACK_DATA_ROOT"]
if not os.path.exists(os.path.join(root, "SimGrasp")):
    generate_simgrasp_dataset(root, num_instances=11, num_frames=100)
    print("synthetic set written to", root)
EOF

echo "=== train HandTrackNet (300 epochs) ==="
python -m hotrack_tpu.train --config handtracknet_train_SimGrasp.yml --epochs 300
echo "=== train IKNet (150 epochs) ==="
python -m hotrack_tpu.train --config iknet_train_SimGrasp.yml --epochs 150
echo "=== objopt tracking eval (network-free, analytic box SDF) ==="
python -m hotrack_tpu.test --config objopt_test_SimGrasp_synth.yml
echo "=== objopt fused-vs-composed A/B (same metrics, XLA fallback path) ==="
HOTRACK_NO_FUSED_OBJ=1 HOTRACK_NO_FOURIER_DA=1 \
    python -m hotrack_tpu.test --config objopt_test_SimGrasp_synth.yml
echo "=== tracking eval (HandTrackNet only) ==="
python -m hotrack_tpu.test --config handtracknet_test_SimGrasp.yml --experiment_dir train_debug
echo "=== same-weights tracking A/B (export -> reference HandTrackModel loop) ==="
# regression stage for the converter + drivers: the 300-epoch net exported
# to the reference's format must track within a few % of our scan driver
# through the reference's own loop (BENCHMARKS "Same-weights tracking A/B");
# results accumulate in $HOTRACK_DATA_ROOT/same_weights_track.json
python scripts/ab_same_weights_track.py --root "$HOTRACK_DATA_ROOT" \
    --exp train_debug
echo "=== full pipeline eval (handopt) ==="
python -m hotrack_tpu.test --config handopt_test_SimGrasp_synth.yml
echo "=== quality run complete ==="
