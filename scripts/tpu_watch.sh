#!/bin/bash
# Poll the axon TPU tunnel; when it answers, run the queued 60k demo arms
# (control + static_rounds fix candidates), then per-variant step timers.
# Arm order = decision value: r2stack (does the no-static 200.8 ms stack
# converge at 60k?), fullxla/fullnokb (is the Pallas hybrid backward or
# bf16 kernel implicated?), then the static_rounds coverage fixes.
# Usage: nohup bash scripts/tpu_watch.sh > /tmp/tpu_watch.log 2>&1 &
cd /root/repo
while true; do
  if timeout 120 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; then
    echo "[$(date +%H:%M:%S)] TPU up — starting demo queue"
    for arm in r2stack fullxla fullnokb r9canon r6 nh2r8 fullb4 r9canonb4 r6b4; do
      echo "[$(date +%H:%M:%S)] arm $arm"
      timeout 3000 python scripts/train_60k_demo.py "$arm" \
        > "/tmp/demo60k_${arm}.log" 2>&1
      echo "[$(date +%H:%M:%S)] arm $arm rc=$? result:"
      grep RESULT "/tmp/demo60k_${arm}.log" || tail -n 2 "/tmp/demo60k_${arm}.log"
    done
    echo "[$(date +%H:%M:%S)] demo queue done; step timers"
    for arm in full r9canon r6 nh2r8 r2stack; do
      timeout 1500 python scripts/time_step_variant.py "$arm" \
        > "/tmp/step_${arm}.log" 2>&1
      grep STEP_MS "/tmp/step_${arm}.log" || echo "arm $arm timer failed"
    done
    echo "[$(date +%H:%M:%S)] queue done"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] TPU still down"
  sleep 240
done
