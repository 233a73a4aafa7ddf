#!/bin/bash
# Round-4 queue #6 (opportunistic tail): seed fills for the 50-epoch acc
# recipe (the 0.95 3-seed-mean lever), the static_and_bins contingency
# lever, and a final clean bench for the round artifact. Everything here
# respects the round-end cutoff so the driver's own bench run is never
# contended.
# Usage: nohup bash scripts/tpu_queue29.sh > /tmp/tpu_queue29.log 2>&1 &
cd /root/repo || exit 1
mkdir -p runs/r4

deadline=$(( $(date +%s) + 12*3600 ))
while ! grep -q "queue27 done" /tmp/tpu_queue27.log 2>/dev/null; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(date +%H:%M:%S)] queue27 sentinel never appeared; aborting"
    exit 1
  fi
  echo "[$(date +%H:%M:%S)] waiting for queue27..."
  sleep 120
done

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

run demo_r12bs128cv2r_e50_s0 7200 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 0 10 50
run demo_r12bs128cv2r_e50_s1 7200 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 1 10 50
run demo_nh2r8cv2r_s1b 3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 1
run demo_r12cv2r_s0b   3600 python scripts/train_60k_demo.py r12cv2r 1e-2 0
run demo_r12bs128cv2rb4_s42 3600 python scripts/train_60k_demo.py r12bs128cv2rb4 1e-2 42
run bench_r4_final 5400 python bench.py

grep -h "RESULT" runs/r4/demo_*e50*.log runs/r4/demo_*b4*.log 2>/dev/null || true
echo "[$(date +%H:%M:%S)] queue29 done"
