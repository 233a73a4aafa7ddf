#!/bin/bash
# Round-4 queue #5: parity-lever attribution timers (gather_sort /
# unsort_rows, committed this round — VERDICT r3 next #6, <=400 ms target)
# plus the B=2 primitive-scaling probe (next #5). Short (~1h); runs between
# queue26 (diagnosis + seeds + bench) and queue27 (dataset-scale arms).
# Usage: nohup bash scripts/tpu_queue28.sh > /tmp/tpu_queue28.log 2>&1 &
cd /root/repo || exit 1
mkdir -p runs/r4

deadline=$(( $(date +%s) + 10*3600 ))
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
  tail -n 4 "runs/r4/$tag.log" | grep -v "^WARNING" || true
}

# Cache-poisoning discriminator FIRST (gates the r12cv2r numbers): the
# corrupted s42ctl run's checkpoint, evaluated at the demo's exact static
# shapes, with the shared cache vs a fresh one.
run diag_cache_old   2400 python scripts/diag_cache_poison.py /tmp/train60k/0819-151954_tracking_trans_hept_42_ r12cv2r /root/.cache/jaxcache
run diag_cache_fresh 2400 python scripts/diag_cache_poison.py /tmp/train60k/0819-151954_tracking_trans_hept_42_ r12cv2r /tmp/jaxcache_fresh

run time_paritygr 2400 python scripts/time_step_variant.py paritygr
run time_parityg  2400 python scripts/time_step_variant.py parityg
run time_parityr  2400 python scripts/time_step_variant.py parityr
run time_parity   2400 python scripts/time_step_variant.py parity
run time_r2knowngr 2400 python scripts/time_step_variant.py r2knowngr
run time_r2knownr  2400 python scripts/time_step_variant.py r2knownr
run time_r2known   2400 python scripts/time_step_variant.py r2known
run probe_b2_prims 2400 python scripts/probe_b2_primitives.py 30 60000 1,2
run probe_6k_prims 2400 python scripts/probe_b2_primitives.py 30 6000 1,8
run dump_b2_hlo    2400 python scripts/dump_b2_hlo.py

grep -h "STEP_MS" runs/r4/time_parity*.log 2>/dev/null || true
echo "[$(date +%H:%M:%S)] queue28 done"
