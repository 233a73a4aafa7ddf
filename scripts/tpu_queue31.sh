#!/bin/bash
# Round-4 queue #8: device per-op profiles (probe_xprof) — the attribution
# tool for the B=2 stacked-forward superlinearity (VERDICT r3 #5; isolated
# primitives are sub-linear, compiled bytes ~linear, so only a device trace
# can attribute the 1.49x/point) and for the headline/acc step's unsort-vs-
# kernel split at the program level. Chained behind queue30.
# Usage: nohup bash scripts/tpu_queue31.sh > /tmp/tpu_queue31.log 2>&1 &
cd /root/repo || exit 1
mkdir -p runs/r4

deadline=$(( $(date +%s) + 14*3600 ))
while ! grep -q "queue30 done" /tmp/tpu_queue30.log 2>/dev/null; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(date +%H:%M:%S)] queue30 sentinel never appeared; aborting"
    exit 1
  fi
  if [ -e /root/repo/STOP_QUEUES ]; then
    echo "[$(date +%H:%M:%S)] STOP_QUEUES present; exiting"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] waiting for queue30..."
  sleep 120
done

CUTOFF=$(date -d '2026-08-20 05:30 UTC' +%s)

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

run xprof_b2fwd 2400 python scripts/probe_xprof.py b2fwd
run xprof_step_headline 2400 python scripts/probe_xprof.py step nh2r8cv2r
run xprof_step_acc 2400 python scripts/probe_xprof.py step r12bs128cv2r

echo "[$(date +%H:%M:%S)] queue31 done"
