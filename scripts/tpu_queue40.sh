#!/bin/bash
# queue40: follow-ups after the grouped-transport fix (c6bba6e-era timers
# measured the OLD row-major-x grouped path: 351/349 ms — the committed
# negative). Re-time the g arms on the column-x + grouped-unsort design,
# time/validate the OR1 big-bucket arm, and pick up remaining fills.
cd /root/repo || exit 1
mkdir -p runs/r5
CUTOFF=$(( $(date +%s) + ${Q40_BUDGET:-10800} ))  # default now + 3h
run() {
  local tag="$1" to="$2"; shift 2
  if [ -e /root/repo/STOP_QUEUES ]; then
    echo "[$(date +%H:%M:%S)] STOP_QUEUES present; skipping $tag"; return
  fi
  if [ "$(date +%s)" -gt "$CUTOFF" ]; then
    echo "[$(date +%H:%M:%S)] cutoff reached; skipping $tag"; return
  fi
  echo "[$(date +%H:%M:%S)] $tag"
  timeout "$to" "$@" > "runs/r5/$tag.log" 2>&1
  echo "$tag rc=$?"
  grep -h "RESULT\|STEP_MS\|ratio\|metric\|PARITY_MS\|sweep" \
    "runs/r5/$tag.log" 2>/dev/null | tail -4 || true
}

run time_g4fix 2400 python scripts/time_step_variant.py nh2r8bs512cv2rg4
run time_g2fix 2400 python scripts/time_step_variant.py nh2r8bs512cv2rg2
# accuracy-max candidate (r12 union at bs512; r12bs256 s42 = 0.9573)
run time_r12bs512cv2r 2400 python scripts/time_step_variant.py r12bs512cv2r
run demo_r12bs512cv2r_s42 3600 python scripts/train_60k_demo.py r12bs512cv2r 1e-2 42
# bench rides every warmed cache; runs BEFORE optional fills so the
# driver-facing artifact is guaranteed fresh
run bench_r5b 7200 python bench.py
run time_nh1r4bs512cv2r 2400 python scripts/time_step_variant.py nh1r4bs512cv2r
run demo_nh1r4bs512cv2r_s42 3600 python scripts/train_60k_demo.py nh1r4bs512cv2r 1e-2 42
run demo_nh2r8bs512cv2r_e50_s0 5400 python scripts/train_60k_demo.py nh2r8bs512cv2r 1e-2 0 10 50
run demo_nh2r8bs512cv2r_e50_s1 5400 python scripts/train_60k_demo.py nh2r8bs512cv2r 1e-2 1 10 50
echo "[$(date +%H:%M:%S)] queue40 done"
