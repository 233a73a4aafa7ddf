#!/bin/bash
# Round-4 queue #9: 50-event dataset-scale controls. The acc arm scored
# 0.9793 at n50 (runs/r4/demo_r12bs128cv2r_n50.log) vs a parity bar that
# was measured at n10 — every inter-arm claim needs same-scale controls,
# so run the parity-accuracy control (r2known) and the speed headline
# (nh2r8cv2r) at n50, then 3-seed fills. Cheap now: the per-event pack
# cache (e926b6d) makes 50-event epochs device-bound.
# Usage: nohup bash scripts/tpu_queue32.sh > /tmp/tpu_queue32.log 2>&1 &
cd /root/repo || exit 1
mkdir -p runs/r4

deadline=$(( $(date +%s) + 14*3600 ))
while ! grep -q "queue31 done" /tmp/tpu_queue31.log 2>/dev/null; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(date +%H:%M:%S)] queue31 sentinel never appeared; aborting"
    exit 1
  fi
  if [ -e /root/repo/STOP_QUEUES ]; then
    echo "[$(date +%H:%M:%S)] STOP_QUEUES present; exiting"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] waiting for queue31..."
  sleep 120
done

CUTOFF=$(date -d '2026-08-20 06:30 UTC' +%s)

run() { # run <tag> <timeout_s> <cmd...>
  local tag="$1" to="$2"; shift 2
  if [ -e /root/repo/STOP_QUEUES ]; then
    echo "[$(date +%H:%M:%S)] STOP_QUEUES present; skipping $tag"
    return
  fi
  if [ "$(date +%s)" -gt "$CUTOFF" ]; then
    echo "[$(date +%H:%M:%S)] cutoff reached; skipping $tag"
    return
  fi
  echo "[$(date +%H:%M:%S)] $tag"
  timeout "$to" "$@" > "runs/r4/$tag.log" 2>&1
  echo "$tag rc=$?"
  grep -h "RESULT\|cross-check\|epoch 24\|epoch 0:" "runs/r4/$tag.log" | tail -3 || true
}

# same-scale controls first (comparability beats seed count)
run demo_r2known_n50_s42   5400 python scripts/train_60k_demo.py r2known 1e-2 42 50
run demo_nh2r8cv2r_n50_s42 3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 42 50
# then 3-seed fills, most verdict-relevant arm first
run demo_r12bs128cv2r_n50_s0 3600 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 0 50
run demo_r2known_n50_s0    5400 python scripts/train_60k_demo.py r2known 1e-2 0 50
run demo_nh2r8cv2r_n50_s0  3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 0 50
run demo_r12bs128cv2r_n50_s1 3600 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 1 50
run demo_r2known_n50_s1    5400 python scripts/train_60k_demo.py r2known 1e-2 1 50
run demo_nh2r8cv2r_n50_s1  3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 1 50

grep -h "RESULT" runs/r4/demo_*_n50*.log 2>/dev/null || true
echo "[$(date +%H:%M:%S)] queue32 done"
