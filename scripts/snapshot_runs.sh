#!/bin/bash
# Snapshot /tmp/train60k after each demo arm finishes (RESULT/Traceback in
# its log), so post-hoc checkpoint analysis survives the shared run dir.
# Usage: nohup bash scripts/snapshot_runs.sh arm1 arm2 ... > /tmp/snap.log 2>&1 &
for arm in "$@"; do
  log="/tmp/demo60k_${arm}.log"
  while true; do
    if [ -f "$log" ] && grep -q "RESULT\|Traceback" "$log"; then
      sleep 5
      rm -rf "/tmp/train60k_${arm}"
      cp -r /tmp/train60k "/tmp/train60k_${arm}" 2>/dev/null
      echo "[$(date +%H:%M:%S)] snapshotted $arm"
      break
    fi
    sleep 20
  done
done
echo "all snapshots done"
