#!/bin/bash
# queue36: round-4 horizon-compressed replan. The round is already past its
# nominal 12 h, so queues 30-35's linear chain (repro legs -> xprof -> 8
# n50 demos -> bisect -> e50 headline seeds -> gather probes) was halted
# via STOP_QUEUES and re-ordered here by (actionability this round) x
# (evidence value): actionable probes first (B=2 pallas-forward arms,
# DMA row-gather, eval-corruption isolation), then the two key
# dataset-scale controls, then fills. Waits for queue29's sentinel;
# checks STOP_QUEUES before every item.
cd /root/repo || exit 1
mkdir -p runs/r4
deadline=$(( $(date +%s) + 8*3600 ))
while ! grep -q "queue29 done" /tmp/tpu_queue29.log 2>/dev/null; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(date +%H:%M:%S)] queue29 sentinel never appeared; aborting"
    exit 1
  fi
  if [ -e /root/repo/STOP_QUEUES ]; then
    echo "[$(date +%H:%M:%S)] STOP_QUEUES present; exiting"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] waiting for queue29..."
  sleep 120
done
CUTOFF=$(date -d '2026-08-20 12:00 UTC' +%s)
run() { # run <tag> <timeout_s> <cmd...>
  local tag="$1" to="$2"; shift 2
  if [ -e /root/repo/STOP_QUEUES ]; then
    echo "[$(date +%H:%M:%S)] STOP_QUEUES present; skipping $tag"
    return
  fi
  if [ "$(date +%s)" -gt "$CUTOFF" ]; then
    echo "[$(date +%H:%M:%S)] cutoff reached; skipping $tag"
    return
  fi
  echo "[$(date +%H:%M:%S)] $tag"
  timeout "$to" "$@" > "runs/r4/$tag.log" 2>&1
  echo "$tag rc=$?"
  grep -h "RESULT\|cross-check\|STEP_MS\|ratio\|GB/s\|correctness" \
    "runs/r4/$tag.log" | tail -4 || true
}
run_if_missing() { # run_if_missing <tag> <marker> <timeout_s> <cmd...>
  local tag="$1" marker="$2"; shift 2
  if grep -q "$marker" "runs/r4/$tag.log" 2>/dev/null; then
    echo "[$(date +%H:%M:%S)] $tag already has '$marker'; skipping"
    return
  fi
  run "$tag" "$@"
}

# --- actionable this round ---
run probe_b2_bisect 3600 python scripts/probe_b2_bisect.py
run probe_gather_pallas 2400 python scripts/probe_gather_pallas.py
run time_r12bs128cv2r_dmagather 2400 \
  env HEPT_ROW_GATHER=pallas python scripts/time_step_variant.py r12bs128cv2r
run repro_shape_init 2400 python scripts/repro_shape_eval.py r12cv2r
run repro_shape_ckpt 2400 python scripts/repro_shape_eval.py r12cv2r \
    /tmp/train60k/0819-151954_tracking_trans_hept_42_
# queue29 items its cutoff may have skipped
run_if_missing demo_r12bs128cv2rb4_s42 RESULT 3600 \
  python scripts/train_60k_demo.py r12bs128cv2rb4 1e-2 42
run_if_missing bench_r4_final metric 5400 python bench.py
# --- key dataset-scale controls (same-scale inter-arm claims) ---
run demo_r2known_n50_s42   5400 python scripts/train_60k_demo.py r2known 1e-2 42 50
run demo_nh2r8cv2r_n50_s42 3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 42 50
# --- budget-matched headline + diagnostics ---
run demo_nh2r8cv2r_e50_s42 5400 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 42 10 50
run xprof_step_acc 2400 python scripts/probe_xprof.py step r12bs128cv2r
run xprof_b2fwd 2400 python scripts/probe_xprof.py b2fwd
# --- seed fills at dataset scale ---
run demo_r12bs128cv2r_n50_s0 3600 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 0 50
run demo_r2known_n50_s0    5400 python scripts/train_60k_demo.py r2known 1e-2 0 50
run demo_nh2r8cv2r_n50_s0  3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 0 50
run bench_r4_final2 5400 python bench.py
run demo_r12bs128cv2r_n50_s1 3600 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 1 50
run demo_r2known_n50_s1    5400 python scripts/train_60k_demo.py r2known 1e-2 1 50
run demo_nh2r8cv2r_n50_s1  3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 1 50
run demo_nh2r8cv2r_e50_s0  5400 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 0 10 50
run demo_nh2r8cv2r_e50_s1  5400 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 1 10 50
grep -h "RESULT" runs/r4/demo_*_n50*.log 2>/dev/null | tail -12 || true
echo "[$(date +%H:%M:%S)] queue36 done"
