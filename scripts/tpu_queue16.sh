#!/bin/bash
# After queue15: pileup co-workload on the tracking bench headline stack
# (nh2r8cv2) — proves the headline fast modes on the second workload.
# Usage: nohup bash scripts/tpu_queue16.sh > /tmp/tpu_queue16.log 2>&1 &
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
wait_for /tmp/tpu_queue15.log "queue15 done"
echo "[$(date +%H:%M:%S)] queue15 done; pileup headline arm"
timeout 3000 python scripts/train_pileup_60k_demo.py headline \
  > /tmp/demo_pileup_headline.log 2>&1
echo "pileup headline rc=$? result:"
grep RESULT /tmp/demo_pileup_headline.log \
  || tail -n 3 /tmp/demo_pileup_headline.log
echo "[$(date +%H:%M:%S)] queue16 done"
