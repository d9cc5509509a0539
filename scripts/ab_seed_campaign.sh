#!/bin/bash
# Multi-seed framework-vs-framework quality campaign (VERDICT r3 items 1-2):
# for each seed, train both frameworks at the round-3 operating point
# (8 instances x 50 frames, 512 pts, batch 32, 20 epochs), then run the
# sequence-tracking A/B and the IKNet A/B. Everything on the host CPU
# (the reference has no TPU path), strictly sequential (1 host core).
#
#   bash scripts/ab_seed_campaign.sh [seeds...]      # default: 0 1 2
#
# Results accumulate under /tmp/ab_quality/{singleframe_results.json,
# track_results.json, singleframe_results_iknet.json} keyed "s{N}".
set -u
cd "$(dirname "$0")/.."
if [ $# -gt 0 ]; then SEEDS=("$@"); else SEEDS=(0 1 2); fi
LOGDIR=/tmp/ab_quality_logs
mkdir -p "$LOGDIR"

for s in "${SEEDS[@]}"; do
  echo "=== seed $s: handtracknet train (both sides) ===" | tee -a "$LOGDIR/driver.log"
  python scripts/ab_framework_quality.py --seed "$s" \
      > "$LOGDIR/handtracknet_s$s.log" 2>&1 || echo "FAIL handtracknet s$s"
  echo "=== seed $s: tracking eval ===" | tee -a "$LOGDIR/driver.log"
  python scripts/ab_framework_quality.py --seed "$s" --track_eval \
      > "$LOGDIR/track_s$s.log" 2>&1 || echo "FAIL track s$s"
  echo "=== seed $s: iknet ===" | tee -a "$LOGDIR/driver.log"
  python scripts/ab_framework_quality.py --seed "$s" --net iknet \
      > "$LOGDIR/iknet_s$s.log" 2>&1 || echo "FAIL iknet s$s"
done

echo "=== campaign done ===" | tee -a "$LOGDIR/driver.log"
for f in singleframe_results.json track_results.json singleframe_results_iknet.json; do
  echo "--- $f ---"; cat "/tmp/ab_quality/$f" 2>/dev/null; echo
done
