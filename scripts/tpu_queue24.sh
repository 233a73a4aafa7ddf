#!/bin/bash
# Round-4 queue #1: the accuracy-composition campaign (VERDICT r3 next #1+#2).
#   a) timers for the new composed arms (r12/r16 + bs128 + center + rows)
#   b) seed-42 convergence arms for both
#   c) 3-seed fills for the current headline (nh2r8cv2r) and the
#      accuracy-recovery arm (r12cv2r) — seed-robust reporting.
# Logs land in runs/r4/ (committed evidence — /tmp is wiped on machine
# reset; ADVICE r3 #2).
# Usage: nohup bash scripts/tpu_queue24.sh > /tmp/tpu_queue24.log 2>&1 &
cd /root/repo || exit 1
mkdir -p runs/r4

run() { # run <tag> <timeout_s> <cmd...>
  local tag="$1" to="$2"; shift 2
  echo "[$(date +%H:%M:%S)] $tag"
  timeout "$to" "$@" > "runs/r4/$tag.log" 2>&1
  echo "$tag rc=$?"
  tail -n 3 "runs/r4/$tag.log" | grep -v "^WARNING" || true
}

run time_r12bs128cv2r  2400 python scripts/time_step_variant.py r12bs128cv2r
run time_r16bs128cv2r  2400 python scripts/time_step_variant.py r16bs128cv2r

run demo_r12bs128cv2r_s42 3600 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 42
run demo_r16bs128cv2r_s42 3600 python scripts/train_60k_demo.py r16bs128cv2r 1e-2 42

run demo_nh2r8cv2r_s0  3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 0
run demo_nh2r8cv2r_s1  3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 1

run demo_r12cv2r_s0    3600 python scripts/train_60k_demo.py r12cv2r 1e-2 0
run demo_r12cv2r_s1    3600 python scripts/train_60k_demo.py r12cv2r 1e-2 1

grep -h "RESULT\|STEP_MS" runs/r4/*.log || true
echo "[$(date +%H:%M:%S)] queue24 done"
