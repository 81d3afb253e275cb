#!/bin/bash
# Injected-outage test for the round-4 queue semantics (VERDICT r3 next #2):
# a transient outage must RE-QUEUE a leg (exit 75 to the supervisor, no
# attempt consumed, no .failed marker), while a real training failure must
# consume attempts and only cancel the leg after MAX_REAL_ATTEMPTS.
#
# Tests the REAL implementation: run()/need()/latest()/leg_running()/
# wait_leg() are extracted verbatim from tools/round4_chain.sh at runtime
# (no copy to drift). The train command is stubbed by shadowing `timeout`
# with a shell function (bash prefers functions over binaries), driven in
# a throwaway working directory.
set -u
HERE=$(cd "$(dirname "$0")/.." && pwd)
CHAIN=$HERE/tools/round4_chain.sh

SANDBOX=$(mktemp -d)
cleanup() { [ -n "${MARKER_PID:-}" ] && kill "$MARKER_PID" 2>/dev/null; rm -rf "$SANDBOX"; }
trap cleanup EXIT
cd "$SANDBOX"
mkdir -p quality_runs

# Extract a helper function from the chain script, verbatim. Handles both
# one-line definitions (need) and block definitions ending with '}' at
# column 0 (latest, leg_running, wait_leg, run).
extract() {
  if grep -qE "^$1\(\) \{.*\}[[:space:]]*$" "$CHAIN"; then
    grep -E "^$1\(\) \{.*\}[[:space:]]*$" "$CHAIN" | head -1
  else
    awk "/^$1\(\)/,/^\}/" "$CHAIN"
  fi
}
for fn in latest leg_running wait_leg run need; do
  src=$(extract "$fn")
  [ -n "$src" ] || { echo "FAIL: could not extract $fn() from $CHAIN"; exit 1; }
  eval "$src"
done

# Stubs for run()'s collaborators.
MAX_REAL_ATTEMPTS=2
PROBE_RC=0
log() { echo "[test] $*"; }
probe() { return "$PROBE_RC"; }
# run() invokes: timeout <tmo> python -m sisr_tpu.cli.train "$@" --write-root ...
# Shadow `timeout`: drop <tmo> and 'python -m sisr_tpu.cli.train', then exec
# the remaining args (our stub command + run()'s appended flags).
timeout() { shift 4; ( "$@" ); }  # subshell: contain stubs' `exit`

fails=0
check() {  # check <desc> <test-args...>
  if test "${@:2}"; then echo "PASS: $1"; else echo "FAIL: $1"; fails=$((fails+1)); fi
}

# Stub train commands (run() appends --write-root ...; stubs ignore args).
outage_train() { exit 75; }
flaky_real_train() {  # fails (real rc=1) once, then succeeds
  if [ -f "$SANDBOX/flaky.once" ]; then
    mkdir -p quality_runs/flaky_leg && echo ck > quality_runs/flaky_leg/0
    echo "test PSNR 1.0"; exit 0
  fi
  : > "$SANDBOX/flaky.once"; exit 1
}
always_real_train() { exit 1; }
timeout_train() { exit 124; }
good_train() {
  mkdir -p quality_runs/good_leg && echo ck > quality_runs/good_leg/0
  exit 0
}
marker_train() { : > "$SANDBOX/good_ran"; exit 0; }

# --- 1. outage (rc=75): re-queued, never consumes an attempt ---------------
run outage_leg 10 outage_train; rc=$?
check "outage returns 75 (re-queue)" "$rc" -eq 75
check "outage consumes no attempt" ! -f quality_runs/outage_leg.attempts
check "outage leaves no .failed" ! -f quality_runs/outage_leg.failed
# a second pass (supervisor relaunch) must retry it, not skip it
run outage_leg 10 outage_train; rc=$?
check "outage leg retried on next pass" "$rc" -eq 75

# --- 2. timeout (rc=124) with a dead chip probe: also an outage ------------
PROBE_RC=1
run dead_leg 10 timeout_train; rc=$?
PROBE_RC=0
check "timeout+dead-probe is an outage" "$rc" -eq 75
check "timeout+dead-probe consumes no attempt" ! -f quality_runs/dead_leg.attempts

# --- 3. timeout (rc=124) with a LIVE probe: a real failure -----------------
run slow_leg 10 timeout_train; rc=$?
check "timeout+live-probe consumes attempt 1" \
  "$(cat quality_runs/slow_leg.attempts 2>/dev/null)" = 1
check "first real failure re-queues (75) for a retry pass" "$rc" -eq 75

# --- 4. real failure, then success on retry: leg completes -----------------
run flaky_leg 10 flaky_real_train; rc=$?
check "flaky first attempt re-queues" "$rc" -eq 75
run flaky_leg 10 flaky_real_train; rc=$?
check "flaky retry succeeds" "$rc" -eq 0
check "flaky checkpoint present" -f quality_runs/flaky_leg/0
check "flaky never marked failed" ! -f quality_runs/flaky_leg.failed

# --- 5. persistent real failure: attempt-capped, then cancelled ------------
run real_leg 10 always_real_train; rc=$?
check "persistent failure attempt 1 re-queues" "$rc" -eq 75
run real_leg 10 always_real_train; rc=$?
check "persistent failure capped at MAX_REAL_ATTEMPTS" "$rc" -eq 1
check "persistent failure marked .failed" -f quality_runs/real_leg.failed
run real_leg 10 always_real_train; rc=$?
check "failed leg skipped on later passes" "$rc" -eq 1
check "skip consumed no extra attempt" "$(cat quality_runs/real_leg.attempts)" = 2

# --- 6. completed leg: skipped without re-running ---------------------------
run good_leg 10 good_train; rc=$?
check "fresh leg trains to completion" "$rc" -eq 0
run good_leg 10 marker_train; rc=$?
check "done leg skipped (rc 0, no retrain)" "$rc" -eq 0
check "done leg did not re-run train" ! -f "$SANDBOX/good_ran"

# --- 7. '--'-prefixed markers must not break in-flight detection ------------
python3 -c "import time; time.sleep(120)" \
  --write-root "quality_runs/marker_probe_$$" 2>/dev/null &
MARKER_PID=$!
sleep 0.5
if leg_running "--write-root quality_runs/marker_probe_$$"; then
  echo "PASS: --write-root marker detected in a live cmdline"
else
  echo "FAIL: --write-root marker NOT detected (grep option injection?)"
  fails=$((fails+1))
fi
kill "$MARKER_PID" 2>/dev/null

echo
if [ "$fails" -eq 0 ]; then echo "ALL CHECKS PASSED"; exit 0; fi
echo "$fails CHECK(S) FAILED"; exit 1
