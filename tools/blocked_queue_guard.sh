#!/bin/bash
# Round-5 guard: while the relay's server-side compile queue is blocked
# (orphaned Mosaic compiles — see BENCH_NOTES round 5), chain legs time
# out (rc=124) but round5_chain's eager-matmul probe still PASSES (it is
# compile-cached), so the chain misclassifies the timeout as a REAL
# failure; two of those permanently .fail the leg. This daemon watches
# watchdog.log for "<name> rc=124" lines and, when the most recent
# compile-queue probe (tools/compile_probe.sh) shows the queue still
# blocked, resets that leg's attempt/failed markers so it retries once
# the queue drains. Only rc=124 is guarded — real script errors (rc=1)
# still consume attempts. Stop: rm /tmp/blocked_queue_guard.run.
LOG=quality_runs/watchdog.log
PROBE=/tmp/compile_probe.log
touch /tmp/blocked_queue_guard.run
offset=$(wc -l < "$LOG")
while [ -f /tmp/blocked_queue_guard.run ]; do
  sleep 60
  total=$(wc -l < "$LOG")
  [ "$total" -le "$offset" ] && continue
  new=$(tail -n +"$((offset + 1))" "$LOG")
  offset=$total
  while read -r line; do
    name=$(echo "$line" | sed -n 's/.*Z \([a-zA-Z0-9_]*\) rc=124$/\1/p')
    [ -n "$name" ] || continue
    last_probe=$(tail -1 "$PROBE" 2>/dev/null)
    if echo "$last_probe" | grep -q "rc=0"; then
      continue  # queue healthy — a timeout is a real timeout
    fi
    rm -f "quality_runs/$name.failed"
    echo 0 > "quality_runs/$name.attempts"
    echo "[guard] $(date -u +%H:%M:%S) reset markers for $name (compile queue blocked)" \
      >> "$LOG"
  done <<< "$new"
done
