#!/bin/bash
# Post-fix queue: waits for queue2 (last arm: r9canonc), then validates the
# FIXED bf16 backward (d372ef0: f32-upcast residuals) on the production
# stack — step time first (cheap), then the 60k convergence arm that the
# round-3 headline depends on, then the 9-round coverage candidate.
# Usage: nohup bash scripts/tpu_queue3.sh > /tmp/tpu_queue3.log 2>&1 &
cd /root/repo
wait_for() {
  local log="$1"
  while true; do
    if [ -f "$log" ]; then
      grep -q "RESULT\|Traceback" "$log" && return 0
      local age=$(( $(date +%s) - $(stat -c %Y "$log") ))
      [ "$age" -gt 900 ] && return 0
    fi
    sleep 60
  done
}
wait_for /tmp/demo60k_r9canonc.log
echo "[$(date +%H:%M:%S)] queue2 done; step timers on the fixed kernel"
for v in full fullr fullv2 fullrv2 fullxla nh2r8; do
  timeout 1800 python scripts/time_step_variant.py "$v" \
    > "/tmp/time_${v}_fixed.log" 2>&1
  echo "timer $v rc=$?"; grep STEP_MS "/tmp/time_${v}_fixed.log" \
    || tail -n 2 "/tmp/time_${v}_fixed.log"
done
for arm in full fullrv2 r9canon nh2r8; do
  echo "[$(date +%H:%M:%S)] arm $arm (fixed bwd)"
  timeout 3000 python scripts/train_60k_demo.py "$arm" \
    > "/tmp/demo60k_${arm}_fixed.log" 2>&1
  echo "[$(date +%H:%M:%S)] arm $arm rc=$? result:"
  grep RESULT "/tmp/demo60k_${arm}_fixed.log" \
    || tail -n 2 "/tmp/demo60k_${arm}_fixed.log"
done
echo "[$(date +%H:%M:%S)] queue3 done"
