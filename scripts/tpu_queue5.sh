#!/bin/bash
# After queue4's convergence arms: decompose the winning stacks so the next
# lever is evidence-driven, then fresh bench.
# Usage: nohup bash scripts/tpu_queue5.sh > /tmp/tpu_queue5.log 2>&1 &
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
wait_for /tmp/demo60k_fullrv2_s1.log
echo "[$(date +%H:%M:%S)] queue4 done; decomposition profiles"
for v in fullrv2 nh2r8; do
  timeout 2400 python scripts/profile_step_decomp.py "$v" \
    > "/tmp/decomp_${v}.log" 2>&1
  echo "decomp $v rc=$?"; grep -E "ms|=" "/tmp/decomp_${v}.log" | tail -8
done
echo "[$(date +%H:%M:%S)] bench warm run (incl. parity subprocess)"
timeout 3000 python bench.py > /tmp/bench_warm.log 2>&1
echo "bench rc=$?"; tail -n 3 /tmp/bench_warm.log
echo "[$(date +%H:%M:%S)] queue5 done"
