#!/bin/bash
# Round-4 queue #7: (a) the repro_shape_eval isolation legs for the
# r12cv2r shape-specific TPU eval wrong-result (ROADMAP "RE-DIAGNOSED" —
# the script existed but was never queued), then (b) re-runs of whatever
# queue29's 00:30 cutoff skipped, then a final clean bench. Chained behind
# queue29; every item re-checks the cutoff AND a STOP file so the session
# can halt the queue cleanly (touch /root/repo/STOP_QUEUES).
# Usage: nohup bash scripts/tpu_queue30.sh > /tmp/tpu_queue30.log 2>&1 &
cd /root/repo || exit 1
mkdir -p runs/r4

deadline=$(( $(date +%s) + 12*3600 ))
while ! grep -q "queue29 done" /tmp/tpu_queue29.log 2>/dev/null; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(date +%H:%M:%S)] queue29 sentinel never appeared; aborting"
    exit 1
  fi
  if [ -e /root/repo/STOP_QUEUES ]; then
    echo "[$(date +%H:%M:%S)] STOP_QUEUES present; exiting"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] waiting for queue29..."
  sleep 120
done

CUTOFF=$(date -d '2026-08-20 05:00 UTC' +%s)

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
  tail -n 4 "runs/r4/$tag.log" | grep -v "^WARNING" || true
}

# run an item only if its queue29 log never produced its marker line
run_if_missing() { # run_if_missing <tag> <marker> <timeout_s> <cmd...>
  local tag="$1" marker="$2"; shift 2
  if grep -q "$marker" "runs/r4/$tag.log" 2>/dev/null; then
    echo "[$(date +%H:%M:%S)] $tag already has '$marker'; skipping"
    return
  fi
  run "$tag" "$@"
}

# (a) the eval-corruption isolation: random init first (in-loop corruption
# showed from epoch 0, so init may reproduce), then the s42 control ckpt
run repro_shape_init 2400 python scripts/repro_shape_eval.py r12cv2r
run repro_shape_ckpt 2400 python scripts/repro_shape_eval.py r12cv2r \
    /tmp/train60k/0819-151954_tracking_trans_hept_42_

# (b) queue29 items its cutoff may have skipped (markers = RESULT lines)
run_if_missing demo_r12bs128cv2r_e50_s0 RESULT 7200 \
    python scripts/train_60k_demo.py r12bs128cv2r 1e-2 0 10 50
run_if_missing demo_r12bs128cv2r_e50_s1 RESULT 7200 \
    python scripts/train_60k_demo.py r12bs128cv2r 1e-2 1 10 50
run_if_missing demo_nh2r8cv2r_s1b RESULT 3600 \
    python scripts/train_60k_demo.py nh2r8cv2r 1e-2 1
run_if_missing demo_r12cv2r_s0b RESULT 3600 \
    python scripts/train_60k_demo.py r12cv2r 1e-2 0
run_if_missing demo_r12bs128cv2rb4_s42 RESULT 3600 \
    python scripts/train_60k_demo.py r12bs128cv2rb4 1e-2 42
run_if_missing bench_r4_final metric 5400 python bench.py

echo "[$(date +%H:%M:%S)] queue30 done"
