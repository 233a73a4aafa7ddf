#!/bin/bash
# After queue7: nh2 compositions — timers then 60k arms. nh2r8 converged
# 0.9334 at 130.7 ms WITHOUT canon/rows/v2; these compose the remaining
# validated levers onto it.
# Usage: nohup bash scripts/tpu_queue8.sh > /tmp/tpu_queue8.log 2>&1 &
cd /root/repo
wait_for() {
  local log="$1"
  while true; do
    if [ -f "$log" ]; then
      grep -q "queue7 done\|Traceback" "$log" && return 0
    fi
    sleep 60
  done
}
wait_for /tmp/tpu_queue7.log
echo "[$(date +%H:%M:%S)] queue7 done; nh2 composition timers"
for v in nh2r8v2 nh2r5crv2; do
  timeout 1800 python scripts/time_step_variant.py "$v" \
    > "/tmp/time_${v}_fixed.log" 2>&1
  echo "timer $v rc=$?"; grep STEP_MS "/tmp/time_${v}_fixed.log" \
    || tail -n 2 "/tmp/time_${v}_fixed.log"
done
for arm in nh2r8v2 nh2r5crv2; do
  echo "[$(date +%H:%M:%S)] arm $arm"
  timeout 3000 python scripts/train_60k_demo.py "$arm" \
    > "/tmp/demo60k_${arm}.log" 2>&1
  echo "[$(date +%H:%M:%S)] arm $arm rc=$? result:"
  grep RESULT "/tmp/demo60k_${arm}.log" \
    || tail -n 2 "/tmp/demo60k_${arm}.log"
done
echo "[$(date +%H:%M:%S)] queue8 done"
