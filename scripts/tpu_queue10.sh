#!/bin/bash
# After queue9: block_size=128 + flat-slab (slab2) timers and 60k arms.
# Usage: nohup bash scripts/tpu_queue10.sh > /tmp/tpu_queue10.log 2>&1 &
cd /root/repo
wait_for() {
  local log="$1"
  while true; do
    if [ -f "$log" ]; then
      grep -q "queue9 done\|Traceback" "$log" && return 0
    fi
    sleep 60
  done
}
wait_for /tmp/tpu_queue9.log
echo "[$(date +%H:%M:%S)] queue9 done; bs128 slab2 timers"
for v in bs128rv2 nh2r8bs128; do
  timeout 1800 python scripts/time_step_variant.py "$v" \
    > "/tmp/time_${v}_fixed.log" 2>&1
  echo "timer $v rc=$?"; grep STEP_MS "/tmp/time_${v}_fixed.log" \
    || tail -n 2 "/tmp/time_${v}_fixed.log"
done
for arm in bs128rv2 nh2r8bs128; do
  echo "[$(date +%H:%M:%S)] arm $arm"
  timeout 3000 python scripts/train_60k_demo.py "$arm" \
    > "/tmp/demo60k_${arm}.log" 2>&1
  echo "[$(date +%H:%M:%S)] arm $arm rc=$? result:"
  grep RESULT "/tmp/demo60k_${arm}.log" \
    || tail -n 2 "/tmp/demo60k_${arm}.log"
done
echo "[$(date +%H:%M:%S)] queue10 done"
