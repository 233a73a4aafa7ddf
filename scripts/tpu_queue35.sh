#!/bin/bash
# queue35: row-gather transport candidates (Pallas DMA kernel vs aligned XLA
# gather) at the shipped arms' shapes — VERDICT r3 #3's remaining idea.
# Chained on queue34's sentinel; respects STOP_QUEUES.
cd /root/repo || exit 1
mkdir -p runs/r4
deadline=$(( $(date +%s) + 18*3600 ))
while ! grep -q "queue34 done" /tmp/tpu_queue34.log 2>/dev/null; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(date +%H:%M:%S)] queue34 sentinel never appeared; aborting"
    exit 1
  fi
  if [ -e /root/repo/STOP_QUEUES ]; then
    echo "[$(date +%H:%M:%S)] STOP_QUEUES present; exiting"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] waiting for queue34..."
  sleep 120
done
CUTOFF=$(date -d '2026-08-20 08:00 UTC' +%s)
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
  tail -n 8 "runs/r4/$tag.log" | grep -v "^WARNING" || true
}
run probe_gather_pallas 2400 python scripts/probe_gather_pallas.py
# end-to-end acc-arm step with the DMA row-gather backend (vs the
# committed 138.8 ms XLA number), only meaningful if the probe's C/D arms
# beat A
run time_r12bs128cv2r_dmagather 2400 \
  env HEPT_ROW_GATHER=pallas python scripts/time_step_variant.py r12bs128cv2r
echo "[$(date +%H:%M:%S)] queue35 done"
