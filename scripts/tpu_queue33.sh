#!/bin/bash
# Round-4 queue #10 (tail): the B=2 component-knockout bisection (fallback
# attribution if probe_xprof's device planes don't survive the axon
# tunnel) + a final clean bench. Chained behind queue32.
# Usage: nohup bash scripts/tpu_queue33.sh > /tmp/tpu_queue33.log 2>&1 &
cd /root/repo || exit 1
mkdir -p runs/r4

deadline=$(( $(date +%s) + 16*3600 ))
while ! grep -q "queue32 done" /tmp/tpu_queue32.log 2>/dev/null; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(date +%H:%M:%S)] queue32 sentinel never appeared; aborting"
    exit 1
  fi
  if [ -e /root/repo/STOP_QUEUES ]; then
    echo "[$(date +%H:%M:%S)] STOP_QUEUES present; exiting"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] waiting for queue32..."
  sleep 120
done

CUTOFF=$(date -d '2026-08-20 06:45 UTC' +%s)

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
  tail -n 4 "runs/r4/$tag.log" | grep -v "^WARNING" || true
}

run probe_b2_bisect 3600 python scripts/probe_b2_bisect.py
run bench_r4_final2 5400 python bench.py

echo "[$(date +%H:%M:%S)] queue33 done"
