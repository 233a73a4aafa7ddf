#!/bin/bash
# After queue16: timers for the non-canon row-gather unsort (exact layout
# change, timer-only decision) on the headline (nh2r8cv2r) and the
# accuracy Pareto point (r12cv2r).
# Usage: nohup bash scripts/tpu_queue17.sh > /tmp/tpu_queue17.log 2>&1 &
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
wait_for /tmp/tpu_queue16.log "queue16 done"
echo "[$(date +%H:%M:%S)] queue16 done; rows timers"
for v in nh2r8cv2r r12cv2r; do
  timeout 1800 python scripts/time_step_variant.py "$v" \
    > "/tmp/time_${v}.log" 2>&1
  echo "timer $v rc=$?"; grep STEP_MS "/tmp/time_${v}.log" \
    || tail -n 2 "/tmp/time_${v}.log"
done
echo "[$(date +%H:%M:%S)] queue17 done"
