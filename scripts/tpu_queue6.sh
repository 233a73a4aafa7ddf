#!/bin/bash
# After queue5: the accuracy-headline candidate r9crv2 (9-round pinned-canon
# plan + per-bucket RPE centering + row unsort + v2 bf16 backward) — timer
# then 60k convergence arm. If it lands ~0.94 at ~152 ms it becomes the
# bench headline (+1.1 pt over fullrv2 for ~5% speed).
# Usage: nohup bash scripts/tpu_queue6.sh > /tmp/tpu_queue6.log 2>&1 &
cd /root/repo
wait_for() {
  local log="$1"
  while true; do
    if [ -f "$log" ]; then
      grep -q "metric\|Traceback\|rc=" "$log" && return 0
      local age=$(( $(date +%s) - $(stat -c %Y "$log") ))
      [ "$age" -gt 1200 ] && return 0
    fi
    sleep 60
  done
}
wait_for /tmp/bench_warm.log
echo "[$(date +%H:%M:%S)] queue5 done; r9crv2 timer + arm"
timeout 1800 python scripts/time_step_variant.py r9crv2 \
  > /tmp/time_r9crv2_fixed.log 2>&1
echo "timer r9crv2 rc=$?"; grep STEP_MS /tmp/time_r9crv2_fixed.log \
  || tail -n 2 /tmp/time_r9crv2_fixed.log
timeout 3000 python scripts/train_60k_demo.py r9crv2 \
  > /tmp/demo60k_r9crv2.log 2>&1
echo "arm r9crv2 rc=$?"; grep RESULT /tmp/demo60k_r9crv2.log \
  || tail -n 2 /tmp/demo60k_r9crv2.log
echo "[$(date +%H:%M:%S)] queue6 done"
