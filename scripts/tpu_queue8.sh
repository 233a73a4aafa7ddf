#!/bin/bash
# Re-run the fixed superstep probes (host-read fences; scratch-assembled
# slabs; static value slices), then the nh2 composition timers + 60k arms.
# Usage: nohup bash scripts/tpu_queue8.sh > /tmp/tpu_queue8.log 2>&1 &
cd /root/repo
echo "[$(date +%H:%M:%S)] superstep probes (fixed)"
timeout 1800 python scripts/probe_pair_super.py > /tmp/probe_pair_super.log 2>&1
echo "pair probe rc=$?"; grep -E "ms|matches|FAILED" /tmp/probe_pair_super.log
timeout 1800 python scripts/probe_kernel_super.py \
  > /tmp/probe_kernel_super.log 2>&1
echo "kernel probe rc=$?"; grep -E "ms|matches|FAILED" /tmp/probe_kernel_super.log
echo "[$(date +%H:%M:%S)] nh2 composition timers"
for v in nh2r8v2 nh2r5crv2; do
  timeout 1800 python scripts/time_step_variant.py "$v" \
    > "/tmp/time_${v}_fixed.log" 2>&1
  echo "timer $v rc=$?"; grep STEP_MS "/tmp/time_${v}_fixed.log" \
    || tail -n 2 "/tmp/time_${v}_fixed.log"
done
for arm in nh2r8v2 nh2r5crv2; do
  echo "[$(date +%H:%M:%S)] arm $arm"
  timeout 3000 python scripts/train_60k_demo.py "$arm" \
    > "/tmp/demo60k_${arm}.log" 2>&1
  echo "[$(date +%H:%M:%S)] arm $arm rc=$? result:"
  grep RESULT "/tmp/demo60k_${arm}.log" \
    || tail -n 2 "/tmp/demo60k_${arm}.log"
done
echo "[$(date +%H:%M:%S)] queue8 done"
