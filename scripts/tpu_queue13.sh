#!/bin/bash
# Round-3 continuation after host reset: re-run everything queued in
# queues 10-12 whose results were lost (/tmp wiped).
#   1. timers: accuracy-recovery arms (nh2r8cv2, r12cv2) + bs128/slab2
#   2. 60k convergence arms: nh2r8cv2, r12cv2, nh2r8v2 seed-1 (headline
#      robustness), nh2r8bs128, bs128rv2
#   3. step decomposition of the headline (nh2r8v2, nh2r8cv2)
#   4. bench warm run (headline + parity) so the driver bench rides a
#      warm compile cache
# Usage: nohup bash scripts/tpu_queue13.sh > /tmp/tpu_queue13.log 2>&1 &
cd /root/repo
echo "[$(date +%H:%M:%S)] queue13 start: timers"
for v in nh2r8cv2 r12cv2 nh2r8bs128 bs128rv2; do
  timeout 1800 python scripts/time_step_variant.py "$v" \
    > "/tmp/time_${v}.log" 2>&1
  echo "timer $v rc=$?"; grep STEP_MS "/tmp/time_${v}.log" \
    || tail -n 2 "/tmp/time_${v}.log"
done
echo "[$(date +%H:%M:%S)] timers done; 60k arms"
for arm in nh2r8cv2 r12cv2; do
  echo "[$(date +%H:%M:%S)] arm $arm"
  timeout 3000 python scripts/train_60k_demo.py "$arm" \
    > "/tmp/demo60k_${arm}.log" 2>&1
  echo "[$(date +%H:%M:%S)] arm $arm rc=$? result:"
  grep RESULT "/tmp/demo60k_${arm}.log" \
    || tail -n 2 "/tmp/demo60k_${arm}.log"
done
echo "[$(date +%H:%M:%S)] headline seed-1 robustness arm"
timeout 3000 python scripts/train_60k_demo.py nh2r8v2 0.01 1 \
  > /tmp/demo60k_nh2r8v2_s1.log 2>&1
echo "[$(date +%H:%M:%S)] seed-1 rc=$? result:"
grep RESULT /tmp/demo60k_nh2r8v2_s1.log || tail -n 2 /tmp/demo60k_nh2r8v2_s1.log
for arm in nh2r8bs128 bs128rv2; do
  echo "[$(date +%H:%M:%S)] arm $arm"
  timeout 3000 python scripts/train_60k_demo.py "$arm" \
    > "/tmp/demo60k_${arm}.log" 2>&1
  echo "[$(date +%H:%M:%S)] arm $arm rc=$? result:"
  grep RESULT "/tmp/demo60k_${arm}.log" \
    || tail -n 2 "/tmp/demo60k_${arm}.log"
done
echo "[$(date +%H:%M:%S)] decompositions"
for v in nh2r8v2 nh2r8cv2; do
  timeout 1500 python scripts/profile_step_decomp.py "$v" \
    > "/tmp/decomp_${v}.log" 2>&1
  echo "decomp $v rc=$?"; tail -n 8 "/tmp/decomp_${v}.log"
done
echo "[$(date +%H:%M:%S)] bench warm run"
timeout 3000 python bench.py > /tmp/bench_warm_r3.log 2>&1
echo "bench rc=$?"; tail -n 3 /tmp/bench_warm_r3.log
echo "[$(date +%H:%M:%S)] queue13 done"
