#!/bin/bash
# Consolidated round-3 continuation (replaces queues 14-17, reordered so
# decision-critical results come first):
#   1. kernel g-lift probe (gates the production kernel patch)
#   2. rows timers: nh2r8cv2r, r12cv2r (exact layout change, timer-only)
#   3. nh1 Pareto timers: nh1r4v2, nh1r4cv2
#   4. pileup on the headline stack (second-workload evidence)
#   5. nh1 60k arms (accuracy cost of OR width 1)
#   6. 6k flat-batch B sweep (bench 6k line tuning)
# Usage: nohup bash scripts/tpu_queue18.sh > /tmp/tpu_queue18.log 2>&1 &
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
wait_for /tmp/tpu_queue13.log "queue13 done"
echo "[$(date +%H:%M:%S)] queue13 done; kernel g-lift probe"
timeout 2400 python scripts/probe_kernel_g.py > /tmp/probe_kernel_g.log 2>&1
echo "probe rc=$?"
cat /tmp/probe_kernel_g.log
echo "[$(date +%H:%M:%S)] rows + nh1 timers"
for v in nh2r8cv2r r12cv2r nh1r4v2 nh1r4cv2; do
  timeout 1800 python scripts/time_step_variant.py "$v" \
    > "/tmp/time_${v}.log" 2>&1
  echo "timer $v rc=$?"; grep STEP_MS "/tmp/time_${v}.log" \
    || tail -n 2 "/tmp/time_${v}.log"
done
echo "[$(date +%H:%M:%S)] pileup headline arm"
timeout 3000 python scripts/train_pileup_60k_demo.py headline \
  > /tmp/demo_pileup_headline.log 2>&1
echo "pileup headline rc=$? result:"
grep RESULT /tmp/demo_pileup_headline.log \
  || tail -n 3 /tmp/demo_pileup_headline.log
for arm in nh1r4v2 nh1r4cv2; do
  echo "[$(date +%H:%M:%S)] arm $arm"
  timeout 3000 python scripts/train_60k_demo.py "$arm" \
    > "/tmp/demo60k_${arm}.log" 2>&1
  echo "[$(date +%H:%M:%S)] arm $arm rc=$? result:"
  grep RESULT "/tmp/demo60k_${arm}.log" \
    || tail -n 2 "/tmp/demo60k_${arm}.log"
done
echo "[$(date +%H:%M:%S)] 6k B sweep"
timeout 3000 python scripts/probe_6k_batch.py 8 16 32 \
  > /tmp/probe_6k_batch.log 2>&1
echo "6k sweep rc=$?"; grep STEP6K_MS /tmp/probe_6k_batch.log \
  || tail -n 3 /tmp/probe_6k_batch.log
echo "[$(date +%H:%M:%S)] queue18 done"
