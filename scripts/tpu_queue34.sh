#!/bin/bash
# Round-4 queue #11: the 50-epoch recipe on the FAST arms. e50 lifted the
# acc arm 0.9502 -> 0.9616 at unchanged step cost; if it lifts nh2r8cv2r
# (95.6 ms / 628k pts/s) past the 0.95 parity-accuracy bar, the
# at-parity-recall throughput point improves 1.45x. Plus the combined
# n50xe50 "best recipe" points. Chained behind queue33.
# Usage: nohup bash scripts/tpu_queue34.sh > /tmp/tpu_queue34.log 2>&1 &
cd /root/repo || exit 1
mkdir -p runs/r4

deadline=$(( $(date +%s) + 18*3600 ))
while ! grep -q "queue33 done" /tmp/tpu_queue33.log 2>/dev/null; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(date +%H:%M:%S)] queue33 sentinel never appeared; aborting"
    exit 1
  fi
  if [ -e /root/repo/STOP_QUEUES ]; then
    echo "[$(date +%H:%M:%S)] STOP_QUEUES present; exiting"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] waiting for queue33..."
  sleep 120
done

CUTOFF=$(date -d '2026-08-20 06:45 UTC' +%s)

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
  grep -h "RESULT\|cross-check" "runs/r4/$tag.log" | tail -2 || true
}

run demo_nh2r8cv2r_e50_s42 5400 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 42 10 50
run demo_nh2r8cv2r_e50_s0  5400 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 0 10 50
run demo_nh2r8cv2r_e50_s1  5400 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 1 10 50
run demo_r12bs128cv2r_n50e50_s42 7200 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 42 50 50
run demo_nh2r8cv2r_n50e50_s42    7200 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 42 50 50

grep -h "RESULT" runs/r4/demo_nh2r8cv2r_e50*.log runs/r4/demo_*n50e50*.log 2>/dev/null || true
echo "[$(date +%H:%M:%S)] queue34 done"
