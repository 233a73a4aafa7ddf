#!/bin/bash
# Round-4 queue #4: round artifacts + co-workload seeds.
#   a) full bench.py on the TPU (validates the promoted dual-arm bench
#      and pre-pays its compiles into the persistent cache)
#   b) the r16bs128cv2r seed-42 arm (lost to the mid-edit trainer crash)
#   c) pileup co-workload: the hept_acc composition + a second seed
# Usage: nohup bash scripts/tpu_queue27.sh > /tmp/tpu_queue27.log 2>&1 &
cd /root/repo || exit 1
mkdir -p runs/r4

deadline=$(( $(date +%s) + 12*3600 ))
while ! grep -q "queue26 done" /tmp/tpu_queue26.log 2>/dev/null; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(date +%H:%M:%S)] queue26 sentinel never appeared; aborting"
    exit 1
  fi
  echo "[$(date +%H:%M:%S)] waiting for queue26..."
  sleep 120
done

run() { # run <tag> <timeout_s> <cmd...>
  local tag="$1" to="$2"; shift 2
  echo "[$(date +%H:%M:%S)] $tag"
  timeout "$to" "$@" > "runs/r4/$tag.log" 2>&1
  echo "$tag rc=$?"
  tail -n 3 "runs/r4/$tag.log" | grep -v "^WARNING" || true
}

run bench_r4            5400 python bench.py
run demo_r16bs128cv2r_s42 3600 python scripts/train_60k_demo.py r16bs128cv2r 1e-2 42
run pileup_acc_s42      3600 python scripts/train_pileup_60k_demo.py acc 42
run pileup_headline_s0  3600 python scripts/train_pileup_60k_demo.py headline 0

grep -h "RESULT\|step_ms\|\"value\"" runs/r4/bench_r4.log runs/r4/demo_r16*.log runs/r4/pileup_*.log 2>/dev/null | tail -6
echo "[$(date +%H:%M:%S)] queue27 done"
