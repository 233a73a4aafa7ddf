#!/bin/bash
# After queue16: timer for the non-canon row-gather unsort on the headline
# stack (nh2r8cv2r) — exact layout change, timer-only decision.
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
echo "[$(date +%H:%M:%S)] queue16 done; nh2r8cv2r timer"
timeout 1800 python scripts/time_step_variant.py nh2r8cv2r \
  > /tmp/time_nh2r8cv2r.log 2>&1
echo "timer rc=$?"; grep STEP_MS /tmp/time_nh2r8cv2r.log \
  || tail -n 2 /tmp/time_nh2r8cv2r.log
echo "[$(date +%H:%M:%S)] queue17 done"
