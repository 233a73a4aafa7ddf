#!/bin/bash
# After queue18: fori_loop kernel-scheduling timers (g-lift, the per-grid-
# step overhead wall): hybrid2l (exact v2 bwd under loop scheduling),
# loop2 (loop fwd too), and the combined rows+loop candidate headline.
# Usage: nohup bash scripts/tpu_queue19.sh > /tmp/tpu_queue19.log 2>&1 &
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
wait_for /tmp/tpu_queue18.log "queue18 done"
echo "[$(date +%H:%M:%S)] queue18 done; loop-kernel timers"
for v in nh2r8cv2l nh2r8cv2L2 nh2r8cv2rl; do
  timeout 1800 python scripts/time_step_variant.py "$v" \
    > "/tmp/time_${v}.log" 2>&1
  echo "timer $v rc=$?"; grep STEP_MS "/tmp/time_${v}.log" \
    || tail -n 2 "/tmp/time_${v}.log"
done
echo "[$(date +%H:%M:%S)] queue19 done"
