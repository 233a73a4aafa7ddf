#!/bin/bash
# After queue22: the fine decomposition of the rows-headline step (lost
# queue21 item) — what remains of the 96 ms: kernels vs plan vs gathers vs
# loss — plus the same for the OR1 turbo step (55 ms).
# Usage: nohup bash scripts/tpu_queue23.sh > /tmp/tpu_queue23.log 2>&1 &
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
wait_for /tmp/tpu_queue22.log "queue22 done"
echo "[$(date +%H:%M:%S)] decomp nh2r8cv2r"
timeout 1800 python scripts/profile_step_decomp.py nh2r8cv2r \
  > /tmp/decomp_nh2r8cv2r.log 2>&1
echo "decomp rc=$?"; tail -n 10 /tmp/decomp_nh2r8cv2r.log
echo "[$(date +%H:%M:%S)] decomp nh1r4cv2r"
timeout 1800 python scripts/profile_step_decomp.py nh1r4cv2r \
  > /tmp/decomp_nh1r4cv2r.log 2>&1
echo "decomp rc=$?"; tail -n 10 /tmp/decomp_nh1r4cv2r.log
echo "[$(date +%H:%M:%S)] queue23 done"
