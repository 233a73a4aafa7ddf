#!/bin/bash
# Session-restart recovery queue: the machine reset wiped /tmp and the jax
# compile cache, losing queue20/21's runs. Re-run the decision-relevant
# items in driver-risk order:
#   1. bench warm at the committed headline (nh2r8cv2r) incl. parity
#      subprocess — the driver's end-of-round bench rides a hot cache
#   2. nh1r4cv2r timer (OR1 + rows: the speed-max candidate's step number)
#   3. nh1r4cv2 60k arm — decides whether an OR1 mode is offerable
#      (union co-bucket recall 0.920; rows is exact so evidence carries)
#   4. nh2r8bs128cr timer + 60k arm — accuracy-recovery candidate at
#      headline speed (bs128 arm was 0.9391 @ 124.6)
#   5. B=2 superlinearity probe at the rows headline
# Usage: nohup bash scripts/tpu_queue22.sh > /tmp/tpu_queue22.log 2>&1 &
cd /root/repo
echo "[$(date +%H:%M:%S)] bench warm (headline nh2r8cv2r)"
timeout 3600 python bench.py > /tmp/bench_warm_rows.log 2>&1
echo "bench rc=$?"; tail -n 3 /tmp/bench_warm_rows.log
echo "[$(date +%H:%M:%S)] nh1r4cv2r timer"
timeout 1800 python scripts/time_step_variant.py nh1r4cv2r \
  > /tmp/time_nh1r4cv2r.log 2>&1
echo "timer nh1r4cv2r rc=$?"; grep STEP_MS /tmp/time_nh1r4cv2r.log \
  || tail -n 2 /tmp/time_nh1r4cv2r.log
echo "[$(date +%H:%M:%S)] nh1r4cv2 60k arm"
timeout 3000 python scripts/train_60k_demo.py nh1r4cv2 \
  > /tmp/demo60k_nh1r4cv2.log 2>&1
echo "nh1r4cv2 arm rc=$? result:"
grep RESULT /tmp/demo60k_nh1r4cv2.log || tail -n 2 /tmp/demo60k_nh1r4cv2.log
echo "[$(date +%H:%M:%S)] nh2r8bs128cr timer"
timeout 1800 python scripts/time_step_variant.py nh2r8bs128cr \
  > /tmp/time_nh2r8bs128cr.log 2>&1
echo "timer nh2r8bs128cr rc=$?"; grep STEP_MS /tmp/time_nh2r8bs128cr.log \
  || tail -n 2 /tmp/time_nh2r8bs128cr.log
echo "[$(date +%H:%M:%S)] nh2r8bs128cr 60k arm"
timeout 3000 python scripts/train_60k_demo.py nh2r8bs128cr \
  > /tmp/demo60k_nh2r8bs128cr.log 2>&1
echo "bs128cr arm rc=$? result:"
grep RESULT /tmp/demo60k_nh2r8bs128cr.log \
  || tail -n 2 /tmp/demo60k_nh2r8bs128cr.log
echo "[$(date +%H:%M:%S)] B=2 superlinearity probe"
timeout 1800 python scripts/probe_b2_superlinear.py \
  > /tmp/probe_b2.log 2>&1
echo "b2 probe rc=$?"; tail -n 12 /tmp/probe_b2.log
echo "[$(date +%H:%M:%S)] queue22 done"
