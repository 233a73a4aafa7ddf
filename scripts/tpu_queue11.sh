#!/bin/bash
# After queue10: accuracy-recovery candidates on the headline stack.
#   nh2r8cv2 — nh2r8v2 + kernel_center (free accuracy candidate)
#   r12cv2   — 12-round union (reference-level coverage) + center + v2
# Usage: nohup bash scripts/tpu_queue11.sh > /tmp/tpu_queue11.log 2>&1 &
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
wait_for /tmp/tpu_queue10.log "queue10 done"
echo "[$(date +%H:%M:%S)] queue10 done; accuracy-recovery timers"
for v in nh2r8cv2 r12cv2; do
  timeout 1800 python scripts/time_step_variant.py "$v" \
    > "/tmp/time_${v}.log" 2>&1
  echo "timer $v rc=$?"; grep STEP_MS "/tmp/time_${v}.log" \
    || tail -n 2 "/tmp/time_${v}.log"
done
for arm in nh2r8cv2 r12cv2; do
  echo "[$(date +%H:%M:%S)] arm $arm"
  timeout 3000 python scripts/train_60k_demo.py "$arm" \
    > "/tmp/demo60k_${arm}.log" 2>&1
  echo "[$(date +%H:%M:%S)] arm $arm rc=$? result:"
  grep RESULT "/tmp/demo60k_${arm}.log" \
    || tail -n 2 "/tmp/demo60k_${arm}.log"
done
echo "[$(date +%H:%M:%S)] queue11 done"
