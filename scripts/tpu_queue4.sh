#!/bin/bash
# Arms phase after the post-fix timers: validate the headline candidates'
# 60k convergence on the fixed/v2 kernels, plus coverage & robustness arms.
# Usage: nohup bash scripts/tpu_queue4.sh > /tmp/tpu_queue4.log 2>&1 &
cd /root/repo
wait_for() {
  local log="$1"
  while true; do
    if [ -f "$log" ]; then
      grep -q "STEP_MS\|RESULT\|Traceback" "$log" && return 0
      local age=$(( $(date +%s) - $(stat -c %Y "$log") ))
      [ "$age" -gt 900 ] && return 0
    fi
    sleep 60
  done
}
wait_for /tmp/time_fullxla_fixed.log
echo "[$(date +%H:%M:%S)] fullxla timer done; nh2r8 + r9rv2 timers"
for v in nh2r8 r9rv2; do
  timeout 1800 python scripts/time_step_variant.py "$v" \
    > "/tmp/time_${v}_fixed.log" 2>&1
  echo "timer $v rc=$?"; grep STEP_MS "/tmp/time_${v}_fixed.log" \
    || tail -n 2 "/tmp/time_${v}_fixed.log"
done
run_arm() {  # run_arm <logname> <variant> [lr] [seed]
  local name="$1"; shift
  echo "[$(date +%H:%M:%S)] arm $name"
  timeout 3000 python scripts/train_60k_demo.py "$@" \
    > "/tmp/demo60k_${name}.log" 2>&1
  echo "[$(date +%H:%M:%S)] arm $name rc=$? result:"
  grep RESULT "/tmp/demo60k_${name}.log" \
    || tail -n 2 "/tmp/demo60k_${name}.log"
}
run_arm fullrv2 fullrv2
run_arm r9canon r9canon
run_arm r9rv2 r9rv2
run_arm nh2r8 nh2r8
run_arm fullrv2_s1 fullrv2 0.01 1
echo "[$(date +%H:%M:%S)] queue4 done"
