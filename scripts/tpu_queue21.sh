#!/bin/bash
# After queue20: headline consolidation for the rows-unsort era.
#   1. timers: nh1r4cv2r (OR1 + rows — the speed-max candidate),
#      nh1r4bs128cr (OR1 + bs128 slab2 + rows)
#   2. bench warm at the NEW headline (nh2r8cv2r) incl. parity subprocess
#      so the driver's end-of-round bench rides a hot compile cache
#   3. fine decomposition of the 95.6 ms step (what remains: kernels vs
#      plan vs gathers vs loss)
#   4. B=2 superlinearity probe at the rows headline (decomp at B=2)
# Usage: nohup bash scripts/tpu_queue21.sh > /tmp/tpu_queue21.log 2>&1 &
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
wait_for /tmp/tpu_queue20.log "queue20 done"
echo "[$(date +%H:%M:%S)] queue20 done; nh1 rows timers"
for v in nh1r4cv2r nh1r4bs128cr; do
  timeout 1800 python scripts/time_step_variant.py "$v" \
    > "/tmp/time_${v}.log" 2>&1
  echo "timer $v rc=$?"; grep STEP_MS "/tmp/time_${v}.log" \
    || tail -n 2 "/tmp/time_${v}.log"
done
echo "[$(date +%H:%M:%S)] bench warm (new headline)"
timeout 3600 python bench.py > /tmp/bench_warm_rows.log 2>&1
echo "bench rc=$?"; tail -n 3 /tmp/bench_warm_rows.log
echo "[$(date +%H:%M:%S)] decomp nh2r8cv2r"
timeout 1800 python scripts/profile_step_decomp.py nh2r8cv2r \
  > /tmp/decomp_nh2r8cv2r.log 2>&1
echo "decomp rc=$?"; tail -n 8 /tmp/decomp_nh2r8cv2r.log
echo "[$(date +%H:%M:%S)] queue21 done"
