#!/bin/bash
# Round-4 queue #3 (v3): DIAGNOSIS FIRST — the r12cv2r TPU-eval corruption
# gates every seed result, so the eval A/B runs before anything else; the
# seed demos then run on the safe per-batch eval (eval_chunk default 1).
# Usage: nohup bash scripts/tpu_queue26.sh > /tmp/tpu_queue26.log 2>&1 &
cd /root/repo || exit 1
mkdir -p runs/r4

deadline=$(( $(date +%s) + 8*3600 ))
while ! grep -q "queue25 done" /tmp/tpu_queue25.log 2>/dev/null; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(date +%H:%M:%S)] queue25 sentinel never appeared; aborting"
    exit 1
  fi
  echo "[$(date +%H:%M:%S)] waiting for queue25..."
  sleep 120
done

run() { # run <tag> <timeout_s> <cmd...>
  local tag="$1" to="$2"; shift 2
  echo "[$(date +%H:%M:%S)] $tag"
  timeout "$to" "$@" > "runs/r4/$tag.log" 2>&1
  echo "$tag rc=$?"
  tail -n 4 "runs/r4/$tag.log" | grep -v "^WARNING" || true
}

run diag_tpu_eval        3600 python scripts/diag_tpu_eval.py /tmp/train60k/0819-122533_tracking_trans_hept_0_
run demo_r12bs128cv2r_s0 3600 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 0
run demo_r12bs128cv2r_s1 3600 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 1
run demo_r12cv2r_s42ctl  3600 python scripts/train_60k_demo.py r12cv2r 1e-2 42
run bench_r4             5400 python bench.py
run demo_nh2r8cv2r_s0b   3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 0
run demo_r2known_s0      4800 python scripts/train_60k_demo.py r2known 1e-2 0
run demo_r2known_s1      4800 python scripts/train_60k_demo.py r2known 1e-2 1
run demo_nh1r4cv2_s0     2400 python scripts/train_60k_demo.py nh1r4cv2 1e-2 0
run demo_nh1r4cv2_s1     2400 python scripts/train_60k_demo.py nh1r4cv2 1e-2 1

grep -h "RESULT" runs/r4/demo_*.log || true
echo "[$(date +%H:%M:%S)] queue26 done"
