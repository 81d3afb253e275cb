#!/bin/bash
# Standalone rescuer for bench.py's SIGSTOP pause markers. bench.py pauses
# the queue (supervisor + chain + training legs) during measurement and
# records the pids in /tmp/sisr_bench_paused.pids; if bench dies uncleanly
# (SIGKILL, OOM on this 1-core host) its atexit never runs and EVERYTHING —
# including the supervisor that could recover — stays frozen forever
# (ADVICE r3 low #2). This loop is intentionally not matched by bench.py's
# pause markers, so it survives to SIGCONT orphans. Pause age threshold
# 45 min > bench's own 40-min wall budget (SISR_BENCH_BUDGET_S).
set -u
F=/tmp/sisr_bench_paused.pids
while true; do
  if [ -f "$F" ]; then
    age=$(( $(date +%s) - $(stat -c %Y "$F") ))
    if [ "$age" -gt 2700 ]; then
      echo "[rescuer] $(date -u +%H:%M:%SZ) SIGCONT orphans: $(cat "$F")"
      for p in $(cat "$F"); do kill -CONT "$p" 2>/dev/null; done
      rm -f "$F"
    fi
  fi
  sleep 300
done
