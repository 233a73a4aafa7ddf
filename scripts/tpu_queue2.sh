#!/bin/bash
# Follow-up queue: waits for the bisect (last arm: fullxla), then runs the
# round-3 perf probes (unsort row-gather formulations; kernel grid-overhead
# variants) and the kernel_center remedy arms.
# Usage: nohup bash scripts/tpu_queue2.sh > /tmp/tpu_queue2.log 2>&1 &
cd /root/repo
wait_for() {
  local log="$1"
  while true; do
    if [ -f "$log" ]; then
      grep -q "RESULT\|Traceback" "$log" && return 0
      local age=$(( $(date +%s) - $(stat -c %Y "$log") ))
      [ "$age" -gt 600 ] && return 0
    fi
    sleep 60
  done
}
wait_for /tmp/demo60k_fullxla.log
echo "[$(date +%H:%M:%S)] bisect done; probes"
timeout 1200 python scripts/probe_unsort_row.py > /tmp/probe_unsort_row.log 2>&1
echo "probe_unsort_row rc=$?"; grep -E "SUMMARY|matches" /tmp/probe_unsort_row.log
timeout 1800 python scripts/probe_kernel_r3.py > /tmp/probe_kernel_r3.log 2>&1
echo "probe_kernel_r3 rc=$?"; grep -E "ms|matches|FAILED" /tmp/probe_kernel_r3.log
for arm in fullc r2c fullnokb r9canonc; do
  echo "[$(date +%H:%M:%S)] arm $arm"
  timeout 3000 python scripts/train_60k_demo.py "$arm" \
    > "/tmp/demo60k_${arm}.log" 2>&1
  echo "[$(date +%H:%M:%S)] arm $arm rc=$? result:"
  grep RESULT "/tmp/demo60k_${arm}.log" || tail -n 2 "/tmp/demo60k_${arm}.log"
done
echo "[$(date +%H:%M:%S)] queue2 done"
