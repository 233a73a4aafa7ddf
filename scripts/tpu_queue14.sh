#!/bin/bash
# After queue13: OR-width-1 Pareto point + 6k flat-batch B sweep.
#   1. timers: nh1r4v2, nh1r4cv2 (n_hashes=1, 4-round plan — est. ~100 ms)
#   2. 60k arms: nh1r4v2, nh1r4cv2 (union recall 0.920, per-layer 0.52 —
#      the accuracy cost decides whether OR1 is offerable)
#   3. probe_6k_batch: B in {8,16,32} for the bench 6k line
# Usage: nohup bash scripts/tpu_queue14.sh > /tmp/tpu_queue14.log 2>&1 &
cd /root/repo
wait_for() {
  local log="$1" sentinel="$2"
  while true; do
    if [ -f "$log" ]; then
      grep -q "$sentinel\|Traceback" "$log" && return 0
    fi
    sleep 60
  done
}
wait_for /tmp/tpu_queue13.log "queue13 done"
echo "[$(date +%H:%M:%S)] queue13 done; nh1 timers"
for v in nh1r4v2 nh1r4cv2; do
  timeout 1800 python scripts/time_step_variant.py "$v" \
    > "/tmp/time_${v}.log" 2>&1
  echo "timer $v rc=$?"; grep STEP_MS "/tmp/time_${v}.log" \
    || tail -n 2 "/tmp/time_${v}.log"
done
for arm in nh1r4v2 nh1r4cv2; do
  echo "[$(date +%H:%M:%S)] arm $arm"
  timeout 3000 python scripts/train_60k_demo.py "$arm" \
    > "/tmp/demo60k_${arm}.log" 2>&1
  echo "[$(date +%H:%M:%S)] arm $arm rc=$? result:"
  grep RESULT "/tmp/demo60k_${arm}.log" \
    || tail -n 2 "/tmp/demo60k_${arm}.log"
done
echo "[$(date +%H:%M:%S)] 6k B sweep"
timeout 3000 python scripts/probe_6k_batch.py 8 16 32 \
  > /tmp/probe_6k_batch.log 2>&1
echo "6k sweep rc=$?"; grep STEP6K_MS /tmp/probe_6k_batch.log \
  || tail -n 3 /tmp/probe_6k_batch.log
echo "[$(date +%H:%M:%S)] queue14 done"
