#!/bin/bash
# After queue14: kernel g-lift probe (fori_loop / batched-dot formulations
# of the production v2 backward + fused forward at nh2 bench shapes) —
# decides the next kernel move (the per-grid-step overhead wall).
# Usage: nohup bash scripts/tpu_queue15.sh > /tmp/tpu_queue15.log 2>&1 &
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
wait_for /tmp/tpu_queue14.log "queue14 done"
echo "[$(date +%H:%M:%S)] queue14 done; kernel g-lift probe"
timeout 2400 python scripts/probe_kernel_g.py > /tmp/probe_kernel_g.log 2>&1
echo "probe rc=$?"
cat /tmp/probe_kernel_g.log
echo "[$(date +%H:%M:%S)] queue15 done"
