#!/bin/bash
# queue39: round-5 main arms, in decision-priority order. Launched after
# STOP_QUEUES-ing queue38 (whose remaining items are folded in below).
#  A0: eval-corruption n_max sweep (VERDICT r4 #2 root-cause leg —
#      repro_shape_init attributed the wrong-result to the FUSED program
#      at n_max=58300 regardless of e_max, at random init).
#  A:  big-bucket timers (probe_bs: recall 0.9831->0.9960 at fixed
#      transport; slab kernels S-capped so bs256-512 cost = bs128).
#  B:  convergence demos for the big-bucket (+Morton-grouped) arms.
#  C:  pileup co-workload, B=2 residual arms, control-grid fills.
#  D:  bench (after any headline-arm decision data exists).
cd /root/repo || exit 1
mkdir -p runs/r5
CUTOFF=$(( $(date +%s) + ${Q39_BUDGET:-21600} ))  # default now + 6h
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
  grep -h "RESULT\|STEP_MS\|ratio\|GB/s\|metric\|PARITY_MS\|sweep\|VERDICT" \
    "runs/r5/$tag.log" 2>/dev/null | tail -6 || true
}

# --- A0: eval-corruption n_max sweep ---
run repro_nmax_sweep 5400 env HEPT_REPRO_NMAXES=58300,58400,50300,50200 \
  python scripts/repro_shape_eval.py r12cv2r

# --- A: big-bucket timers ---
run time_nh2r8bs512cv2r 2400 python scripts/time_step_variant.py nh2r8bs512cv2r
run time_nh2r8bs256cv2r 2400 python scripts/time_step_variant.py nh2r8bs256cv2r

# --- B: convergence demos (25 ep, 10 events; shape check default-on) ---
run demo_nh2r8bs512cv2r_s42 3600 python scripts/train_60k_demo.py nh2r8bs512cv2r 1e-2 42
run time_nh2r8bs512cv2rg2 2400 python scripts/time_step_variant.py nh2r8bs512cv2rg2
run time_nh2r8bs512cv2rg4 2400 python scripts/time_step_variant.py nh2r8bs512cv2rg4
run time_r12bs256cv2r 2400 python scripts/time_step_variant.py r12bs256cv2r
run demo_nh2r8bs512cv2r_s0 3600 python scripts/train_60k_demo.py nh2r8bs512cv2r 1e-2 0
run demo_nh2r8bs512cv2r_s1 3600 python scripts/train_60k_demo.py nh2r8bs512cv2r 1e-2 1
run demo_nh2r8bs512cv2rg4_s42 3600 python scripts/train_60k_demo.py nh2r8bs512cv2rg4 1e-2 42
run demo_r12bs256cv2r_s42 3600 python scripts/train_60k_demo.py r12bs256cv2r 1e-2 42
run demo_nh2r8bs512cv2r_e50_s42 5400 python scripts/train_60k_demo.py nh2r8bs512cv2r 1e-2 42 10 50
run demo_nh2r8bs512cv2rg2_s42 3600 python scripts/train_60k_demo.py nh2r8bs512cv2rg2 1e-2 42

# --- C: pileup, B=2 arms, control grid ---
run pileup_bs512_s42 3600 python scripts/train_pileup_60k_demo.py bs512 42
run probe_b2_arms2 5400 env B2_ARMS=l1,nounsortrows,nopack \
  python scripts/probe_b2_bisect.py
run demo_r2known_e50_s42   5400 python scripts/train_60k_demo.py r2known 1e-2 42 10 50
run demo_nh2r8cv2r_e50_s42 3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 42 10 50
run demo_r2known_n50_s42   5400 python scripts/train_60k_demo.py r2known 1e-2 42 50
run demo_nh2r8cv2r_n50_s42 3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 42 50
run demo_nh2r8bs512cv2r_n50_s42 3600 python scripts/train_60k_demo.py nh2r8bs512cv2r 1e-2 42 50
run demo_r12bs128cv2r_n50_s0 3600 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 0 50
run demo_r2known_n50_s0    5400 python scripts/train_60k_demo.py r2known 1e-2 0 50
run demo_nh2r8cv2r_n50_s0  3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 0 50
run demo_nh2r8cv2r_e50_s0  3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 0 10 50
run demo_r2known_e50_s0    5400 python scripts/train_60k_demo.py r2known 1e-2 0 10 50

# --- D: bench (rides all warmed caches; parity can't be null) ---
run bench_r5 7200 python bench.py
grep -h "RESULT" runs/r5/demo_*.log 2>/dev/null | tail -14 || true
echo "[$(date +%H:%M:%S)] queue39 done"
