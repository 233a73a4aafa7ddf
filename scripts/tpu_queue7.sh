#!/bin/bash
# After queue6: pair-op superstep probe (the ~16 ms loss wall is ~16k serial
# small one-hot MXU dots; block-diagonal supersteps cut the chain length).
# Usage: nohup bash scripts/tpu_queue7.sh > /tmp/tpu_queue7.log 2>&1 &
cd /root/repo
wait_for() {
  local log="$1"
  while true; do
    if [ -f "$log" ]; then
      grep -q "RESULT\|Traceback" "$log" && return 0
      local age=$(( $(date +%s) - $(stat -c %Y "$log") ))
      [ "$age" -gt 1200 ] && return 0
    fi
    sleep 60
  done
}
wait_for /tmp/demo60k_r9crv2.log
echo "[$(date +%H:%M:%S)] queue6 done; pair superstep probe"
timeout 1800 python scripts/probe_pair_super.py > /tmp/probe_pair_super.log 2>&1
echo "probe rc=$?"; grep -E "ms|matches|FAILED" /tmp/probe_pair_super.log
echo "[$(date +%H:%M:%S)] bucket-kernel superstep probe"
timeout 1800 python scripts/probe_kernel_super.py \
  > /tmp/probe_kernel_super.log 2>&1
echo "probe rc=$?"; grep -E "ms|matches|FAILED" /tmp/probe_kernel_super.log
echo "[$(date +%H:%M:%S)] queue7 done"
