#!/bin/bash
# After queue11: headline robustness + decomposition + bench warm.
#   1. nh2r8v2 seed-1 60k arm (seed robustness of the new headline)
#   2. step decomposition of nh2r8v2 (+cv2) — final walls for ROADMAP
#   3. full bench warm run (headline JSON + parity subprocess) so the
#      driver's round-end bench rides a warm compile cache
# Usage: nohup bash scripts/tpu_queue12.sh > /tmp/tpu_queue12.log 2>&1 &
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
wait_for /tmp/tpu_queue11.log "queue11 done"
echo "[$(date +%H:%M:%S)] queue11 done; nh2r8v2 seed-1 arm"
timeout 3000 python scripts/train_60k_demo.py nh2r8v2 0.01 1 \
  > /tmp/demo60k_nh2r8v2_s1.log 2>&1
echo "[$(date +%H:%M:%S)] seed-1 rc=$? result:"
grep RESULT /tmp/demo60k_nh2r8v2_s1.log || tail -n 2 /tmp/demo60k_nh2r8v2_s1.log
for v in nh2r8v2 nh2r8cv2; do
  timeout 1500 python scripts/profile_step_decomp.py "$v" \
    > "/tmp/decomp_${v}.log" 2>&1
  echo "decomp $v rc=$?"; tail -n 8 "/tmp/decomp_${v}.log"
done
echo "[$(date +%H:%M:%S)] bench warm run"
timeout 3000 python bench.py > /tmp/bench_warm_r3.log 2>&1
echo "bench rc=$?"; tail -n 3 /tmp/bench_warm_r3.log
echo "[$(date +%H:%M:%S)] queue12 done"
