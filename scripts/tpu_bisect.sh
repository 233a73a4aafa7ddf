#!/bin/bash
# Round-3 60k-divergence bisect queue. The r2stack control (share_heads +
# kernel_bf16, NO static keys) diverged at 60k/lr=1e-2 — so the static_keys
# coverage story is not the whole cause. Bisect the two round-3 base-stack
# additions and check for a base-path code regression:
#   r2known — exact round-2 demo stack (known-good 0.9552) on current code
#   nokb    — share_heads only (f32 kernels)
#   noshare — kernel_bf16 only (per-head grids)
#   fullxla — full static stack on pure-XLA attention (Pallas-bwd isolation)
# Waits for any in-flight demo to finish (RESULT line or stale log).
# Usage: nohup bash scripts/tpu_bisect.sh > /tmp/tpu_bisect.log 2>&1 &
cd /root/repo
wait_for_idle() {
  local log="$1"
  [ -f "$log" ] || return 0
  while true; do
    grep -q "RESULT\|Traceback" "$log" && return 0
    local age=$(( $(date +%s) - $(stat -c %Y "$log") ))
    [ "$age" -gt 300 ] && return 0
    sleep 60
  done
}
wait_for_idle /tmp/demo60k_r2stack.log
echo "[$(date +%H:%M:%S)] r2stack done:"
grep "RESULT" /tmp/demo60k_r2stack.log || tail -n 2 /tmp/demo60k_r2stack.log
for arm in r2known nokb noshare fullxla; do
  echo "[$(date +%H:%M:%S)] arm $arm"
  timeout 3000 python scripts/train_60k_demo.py "$arm" \
    > "/tmp/demo60k_${arm}.log" 2>&1
  echo "[$(date +%H:%M:%S)] arm $arm rc=$? result:"
  grep RESULT "/tmp/demo60k_${arm}.log" || tail -n 2 "/tmp/demo60k_${arm}.log"
done
echo "[$(date +%H:%M:%S)] bisect queue done"
