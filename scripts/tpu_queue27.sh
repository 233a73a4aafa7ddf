#!/bin/bash
# Round-4 queue #4 (v2): dataset-scale evidence + pileup + stretch arms,
# reordered most-verdict-critical-first (n50 dataset-scale > pileup acc >
# r13 speed-recovery > e50 > r16 Pareto point) and chained behind queue28
# (the short parity-lever timers run first).
# Usage: nohup bash scripts/tpu_queue27.sh > /tmp/tpu_queue27.log 2>&1 &
cd /root/repo || exit 1
mkdir -p runs/r4

deadline=$(( $(date +%s) + 12*3600 ))
while ! grep -q "queue28 done" /tmp/tpu_queue28.log 2>/dev/null; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(date +%H:%M:%S)] queue28 sentinel never appeared; aborting"
    exit 1
  fi
  echo "[$(date +%H:%M:%S)] waiting for queue28..."
  sleep 120
done

# Stop launching items near round end so the driver's final bench.py run
# gets the TPU to itself (contended timings would corrupt BENCH_r04).
CUTOFF=$(date -d '2026-08-20 00:30 UTC' +%s)

run() { # run <tag> <timeout_s> <cmd...>
  local tag="$1" to="$2"; shift 2
  if [ "$(date +%s)" -gt "$CUTOFF" ]; then
    echo "[$(date +%H:%M:%S)] cutoff reached; skipping $tag"
    return
  fi
  echo "[$(date +%H:%M:%S)] $tag"
  timeout "$to" "$@" > "runs/r4/$tag.log" 2>&1
  echo "$tag rc=$?"
  tail -n 3 "runs/r4/$tag.log" | grep -v "^WARNING" || true
}

run demo_r12bs128cv2r_n50 7200 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 42 50
run demo_r12bs128cv2r_e50 7200 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 42 10 50
run pileup_acc_s42       3600 python scripts/train_pileup_60k_demo.py acc 42
run time_r13bs128ccv2r   2400 python scripts/time_step_variant.py r13bs128ccv2r
run demo_r13bs128ccv2r_s42 3600 python scripts/train_60k_demo.py r13bs128ccv2r 1e-2 42
run probe_unsort_r4      2400 python scripts/probe_unsort_r4.py
run pileup_headline_s0   3600 python scripts/train_pileup_60k_demo.py headline 0
run demo_r16bs128cv2r_s42 3600 python scripts/train_60k_demo.py r16bs128cv2r 1e-2 42

grep -h "RESULT" runs/r4/demo_*.log runs/r4/pileup_*.log 2>/dev/null | tail -8
echo "[$(date +%H:%M:%S)] queue27 done"
