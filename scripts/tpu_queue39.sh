#!/bin/bash
# queue39: round-5 BIG-BUCKET arms + control-grid fills.
# Offline probes (runs/r5/probe_groups.log, probe_bs.log) decided:
#  - transport groups = recall NEGATIVE at every (block, g) probed
#    (union 0.9902 -> 0.9129 at g=2/bs128; 0.9960 -> 0.9627 at g=2/bs512)
#    — no TPU time spent on them;
#  - big buckets at g=1 = the lever: the slab kernels run fixed (1024,1024)
#    masked slabs at any 128-multiple block size, so bs256/384/512 cost the
#    SAME kernel time as bs128 while the 8-round union recall rises
#    0.9831 -> 0.9902/0.9935/0.9960 (= / > the r12bs128 acc arm) at
#    nh2-level transport (~95 ms/step vs the acc arm's 138.8).
# Phase A times the sweep; phase B runs convergence demos; phase C fills
# whatever of the queue38 control grid was skipped.
cd /root/repo || exit 1
mkdir -p runs/r5
CUTOFF=$(( $(date +%s) + ${Q39_BUDGET:-14400} ))  # default now + 4h
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
  timeout "$to" "$@" > "runs/r5/$tag.log" 2>&1
  echo "$tag rc=$?"
  grep -h "RESULT\|STEP_MS\|ratio\|GB/s\|metric\|PARITY_MS" \
    "runs/r5/$tag.log" 2>/dev/null | tail -4 || true
}

# --- phase A0: eval-corruption n_max sweep (VERDICT r4 #2) ---
# repro_shape_init established: triggers on n_max alone (58300 bad at any
# e_max, 50200 fine), at RANDOM INIT, and the forward compiled ALONE is
# clean — the miscompile is inside the fused program. The sweep tests the
# odd/even bucket-count axis (583 odd vs 502 even) and whether the metric
# subgraph must be present (lossonly leg) / split programs clear it.
run repro_nmax_sweep 5400 env HEPT_REPRO_NMAXES=58300,58400,50300,50200 \
  python scripts/repro_shape_eval.py r12cv2r

# --- phase A: big-bucket timers (decision data) ---
run time_nh2r8bs512cv2r 2400 python scripts/time_step_variant.py nh2r8bs512cv2r
run time_nh2r8bs256cv2r 2400 python scripts/time_step_variant.py nh2r8bs256cv2r
run time_r12bs256cv2r 2400 python scripts/time_step_variant.py r12bs256cv2r
run time_nh2r8bs384cv2r 2400 python scripts/time_step_variant.py nh2r8bs384cv2r
# Morton-σ transport groups on the big-bucket arm (union 0.9934 g2 /
# 0.9901 g4 vs 0.9960 ungrouped): the transport-wall halver/quarterer
run time_nh2r8bs512cv2rg2 2400 python scripts/time_step_variant.py nh2r8bs512cv2rg2
run time_nh2r8bs512cv2rg4 2400 python scripts/time_step_variant.py nh2r8bs512cv2rg4

# --- phase B: convergence demos (25 ep, 10 events; shape check on) ---
run demo_nh2r8bs512cv2r_s42 3600 python scripts/train_60k_demo.py nh2r8bs512cv2r 1e-2 42
run demo_nh2r8bs256cv2r_s42 3600 python scripts/train_60k_demo.py nh2r8bs256cv2r 1e-2 42
run demo_r12bs256cv2r_s42 3600 python scripts/train_60k_demo.py r12bs256cv2r 1e-2 42
run demo_nh2r8bs512cv2r_s0 3600 python scripts/train_60k_demo.py nh2r8bs512cv2r 1e-2 0
run demo_nh2r8bs512cv2r_s1 3600 python scripts/train_60k_demo.py nh2r8bs512cv2r 1e-2 1
run demo_nh2r8bs512cv2rg2_s42 3600 python scripts/train_60k_demo.py nh2r8bs512cv2rg2 1e-2 42
run demo_nh2r8bs512cv2rg4_s42 3600 python scripts/train_60k_demo.py nh2r8bs512cv2rg4 1e-2 42
# 50-epoch recipe on the best big-bucket arm (headline-recipe point)
run demo_nh2r8bs512cv2r_e50_s42 5400 python scripts/train_60k_demo.py nh2r8bs512cv2r 1e-2 42 10 50

# pileup co-workload on the big-bucket arm + B=2 residual attribution
run pileup_bs512_s42 3600 python scripts/train_pileup_60k_demo.py bs512 42
# B=2 residual attribution (slab128 fixed the convert, 1.271 remains):
# l1 localizes layers-vs-prepare; nounsortrows/nopack the transport legs
run probe_b2_arms2 5400 env B2_ARMS=l1,nounsortrows,nopack \
  python scripts/probe_b2_bisect.py

# --- phase C: control-grid fills queue38 may have skipped ---
run demo_r2known_e50_s42b   5400 python scripts/train_60k_demo.py r2known 1e-2 42 10 50
run demo_nh2r8cv2r_e50_s42b 3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 42 10 50
run demo_r12bs128cv2r_n50_s0b 3600 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 0 50
run demo_r2known_n50_s0b    5400 python scripts/train_60k_demo.py r2known 1e-2 0 50
run demo_nh2r8cv2r_n50_s0b  3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 0 50
grep -h "RESULT" runs/r5/demo_*.log 2>/dev/null | tail -12 || true
echo "[$(date +%H:%M:%S)] queue39 done"
