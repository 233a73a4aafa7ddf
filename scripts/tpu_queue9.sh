#!/bin/bash
# After queue8: warm the parity-mode compile cache (the driver's bench run
# bounds parity at 1200s; the cold compile of the 32-operand f32 sorts can
# exceed it — one pre-run makes the final BENCH_r03 carry step_ms_parity).
# Usage: nohup bash scripts/tpu_queue9.sh > /tmp/tpu_queue9.log 2>&1 &
cd /root/repo
wait_for() {
  local log="$1"
  while true; do
    if [ -f "$log" ]; then
      grep -q "queue8 done\|Traceback" "$log" && return 0
    fi
    sleep 60
  done
}
wait_for /tmp/tpu_queue8.log
echo "[$(date +%H:%M:%S)] queue8 done; parity-mode warm"
timeout 2700 python bench.py --parity-only > /tmp/bench_parity_warm.log 2>&1
echo "parity rc=$?"; grep PARITY_MS /tmp/bench_parity_warm.log \
  || tail -n 3 /tmp/bench_parity_warm.log
echo "[$(date +%H:%M:%S)] queue9 done"
