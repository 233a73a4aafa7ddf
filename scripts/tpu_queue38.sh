#!/bin/bash
# queue38: round-5 main queue (supersedes the unrun remainder of queue37,
# whose 2026-08-20 cutoff passed before phase A item 5).
# Already measured in the previous session (recorded in ROADMAP/BASELINE):
#   time_r12bs128cv2r 138.77 ms / time_r12bs128cv2r_dma 186.10 ms (negative).
# This queue closes VERDICT r4's remaining loops:
#   A) B=2 discriminator arms (subprocess-isolated), eval-corruption
#      random-init legs, parity warm (so bench parity is never null),
#      gather micro-probe.
#   B) regenerate the corrupting r12cv2r checkpoint + ckpt repro legs; bench.
#   C) the control grid (queue32/34 content): r2known + nh2r8cv2r at n50 and
#      e50, plus seed fills, so every headline comparison is matched.
# Checks STOP_QUEUES before every item; per-item timeout; global cutoff.
cd /root/repo || exit 1
mkdir -p runs/r5
CUTOFF=$(( $(date +%s) + 28800 ))  # now + 8h
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
  grep -h "RESULT\|STEP_MS\|ratio\|GB/s\|VERDICT\|evalstep\|metric\|PARITY_MS" \
    "runs/r5/$tag.log" 2>/dev/null | tail -6 || true
}

# --- phase A: probes + timers ---
run probe_b2_bisect 5400 env B2_ARMS=full,xla,slab128,pallasfwd \
  python scripts/probe_b2_bisect.py
run repro_shape_init 3600 python scripts/repro_shape_eval.py r12cv2r
run time_parity 2700 python scripts/time_step_variant.py parity 10
run probe_gather_pallas 2400 python scripts/probe_gather_pallas.py

# --- phase B: eval-corruption ckpt legs + bench ---
run demo_r12cv2r_s42 3600 python scripts/train_60k_demo.py r12cv2r 1e-2 42
latest=$(ls -td /tmp/train60k/*r12cv2r*_42_* /tmp/train60k/*_tracking_trans_hept_42_* 2>/dev/null | head -1)
if [ -n "$latest" ]; then
  run repro_shape_ckpt 3600 python scripts/repro_shape_eval.py r12cv2r "$latest"
fi
run bench_r5 7200 python bench.py

# --- phase C: control grid (matched-budget/scale claims) ---
run demo_r2known_n50_s42   5400 python scripts/train_60k_demo.py r2known 1e-2 42 50
run demo_nh2r8cv2r_n50_s42 3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 42 50
run demo_nh2r8cv2r_e50_s42 3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 42 10 50
run demo_r2known_e50_s42   5400 python scripts/train_60k_demo.py r2known 1e-2 42 10 50
run demo_r12bs128cv2r_n50_s0 3600 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 0 50
run demo_r2known_n50_s0    5400 python scripts/train_60k_demo.py r2known 1e-2 0 50
run demo_nh2r8cv2r_n50_s0  3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 0 50
run demo_r12bs128cv2r_n50_s1 3600 python scripts/train_60k_demo.py r12bs128cv2r 1e-2 1 50
run demo_r2known_n50_s1    5400 python scripts/train_60k_demo.py r2known 1e-2 1 50
run demo_nh2r8cv2r_n50_s1  3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 1 50
run demo_nh2r8cv2r_e50_s0  3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 0 10 50
run demo_nh2r8cv2r_e50_s1  3600 python scripts/train_60k_demo.py nh2r8cv2r 1e-2 1 10 50
run demo_r2known_e50_s0    5400 python scripts/train_60k_demo.py r2known 1e-2 0 10 50
run demo_r2known_e50_s1    5400 python scripts/train_60k_demo.py r2known 1e-2 1 10 50
grep -h "RESULT" runs/r5/demo_*.log 2>/dev/null | tail -16 || true
echo "[$(date +%H:%M:%S)] queue38 done"
