#!/bin/bash
# Round-4 queue #2: measurement probes that decide the optimization work.
#   a) fine decompositions of the rows headline (nh2r8cv2r), the composed
#      accuracy arm (r12bs128cv2r) and the strict-parity mode
#   b) multistep-scan dispatch probe (VERDICT r3 next #4)
#   c) stacked-B2 forward decomposition (VERDICT r3 next #5)
#   d) parity chunk-size A/B (HEPT_MAX_SORT_OPS=25)
# Usage: nohup bash scripts/tpu_queue25.sh > /tmp/tpu_queue25.log 2>&1 &
cd /root/repo || exit 1
mkdir -p runs/r4

# Wait for queue24's completion SENTINEL only (ADVICE r3: a Traceback line
# does not mean the queue exited), bounded by a deadline with heartbeats.
deadline=$(( $(date +%s) + 4*3600 ))
while ! grep -q "queue24 done" /tmp/tpu_queue24.log 2>/dev/null; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "[$(date +%H:%M:%S)] queue24 sentinel never appeared; aborting"
    exit 1
  fi
  echo "[$(date +%H:%M:%S)] waiting for queue24..."
  sleep 120
done

run() { # run <tag> <timeout_s> <cmd...>
  local tag="$1" to="$2"; shift 2
  echo "[$(date +%H:%M:%S)] $tag"
  timeout "$to" "$@" > "runs/r4/$tag.log" 2>&1
  echo "$tag rc=$?"
  tail -n 8 "runs/r4/$tag.log" | grep -v "^WARNING" || true
}

run probe_multistep     2400 python scripts/probe_multistep.py 8
run decomp_nh2r8cv2r    3600 python scripts/profile_step_decomp.py nh2r8cv2r
run decomp_r12bs128cv2r 3600 python scripts/profile_step_decomp.py r12bs128cv2r
run probe_b2_stacked    3600 python scripts/probe_b2_stacked.py
run decomp_parity       5400 python scripts/profile_step_decomp.py parity
run time_parity_ops25   3600 env HEPT_MAX_SORT_OPS=25 python scripts/time_step_variant.py parity 10

echo "[$(date +%H:%M:%S)] queue25 done"
