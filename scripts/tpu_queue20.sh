#!/bin/bash
# After queue19: bs128 headline-candidate follow-ups (the nh2r8bs128 arm
# scored 0.9391 @ 124.6 ms — best accuracy at headline speed):
#   1. timers: nh2r8bs128c (center), nh2r8bs128cr (center + rows)
#   2. seed-1 robustness arm for nh2r8bs128
#   3. 60k arm for nh2r8bs128cr (center is exact-in-f32, rows is exact,
#      but arm the composition once since it would become the headline)
# Usage: nohup bash scripts/tpu_queue20.sh > /tmp/tpu_queue20.log 2>&1 &
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
wait_for /tmp/tpu_queue19.log "queue19 done"
echo "[$(date +%H:%M:%S)] queue19 done; bs128 candidate timers"
for v in nh2r8bs128c nh2r8bs128cr; do
  timeout 1800 python scripts/time_step_variant.py "$v" \
    > "/tmp/time_${v}.log" 2>&1
  echo "timer $v rc=$?"; grep STEP_MS "/tmp/time_${v}.log" \
    || tail -n 2 "/tmp/time_${v}.log"
done
echo "[$(date +%H:%M:%S)] nh2r8bs128 seed-1 arm"
timeout 3000 python scripts/train_60k_demo.py nh2r8bs128 0.01 1 \
  > /tmp/demo60k_nh2r8bs128_s1.log 2>&1
echo "seed-1 rc=$? result:"
grep RESULT /tmp/demo60k_nh2r8bs128_s1.log \
  || tail -n 2 /tmp/demo60k_nh2r8bs128_s1.log
echo "[$(date +%H:%M:%S)] nh2r8bs128cr arm"
timeout 3000 python scripts/train_60k_demo.py nh2r8bs128cr \
  > /tmp/demo60k_nh2r8bs128cr.log 2>&1
echo "cr arm rc=$? result:"
grep RESULT /tmp/demo60k_nh2r8bs128cr.log \
  || tail -n 2 /tmp/demo60k_nh2r8bs128cr.log
echo "[$(date +%H:%M:%S)] queue20 done"
