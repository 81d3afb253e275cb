#!/bin/bash
# Injected bench-kill test for the round-5 pause/rescue semantics
# (VERDICT r4 next #1c: "Done = ... an injected bench-kill leaves the
# queue running" and "a pause-induced rc=124 is classified as an outage").
#
# Exercises the REAL implementations:
#   - tools/pause_rescuer.sh run for one fast iteration against a
#     SIGSTOPped victim whose pidfile is past the rescue age: the victim
#     must be SIGCONTed, the pidfile removed, the last-pause marker stamped
#   - paused_during() extracted verbatim from tools/round5_chain.sh:
#     classifies rc=124 legs as outage when a pause overlapped them
#   - bench.py's signal path: SIGTERM mid-run prints a best-so-far JSON
#     line and exits 0 (driven via import, no TPU/queue interaction)
set -u
HERE=$(cd "$(dirname "$0")/.." && pwd)
CHAIN=$HERE/tools/round5_chain.sh
SANDBOX=$(mktemp -d)
VICTIM_PID=""
cleanup() { [ -n "$VICTIM_PID" ] && kill "$VICTIM_PID" 2>/dev/null; rm -rf "$SANDBOX"; }
trap cleanup EXIT
cd "$SANDBOX"

fails=0
check() {
  if test "${@:2}"; then echo "PASS: $1"; else echo "FAIL: $1"; fails=$((fails+1)); fi
}

# --- 1. rescuer frees a SIGSTOPped victim after an uncleanly-dead bench ---
sleep 600 & VICTIM_PID=$!
kill -STOP "$VICTIM_PID"
state() { awk '{print $3}' "/proc/$1/stat" 2>/dev/null; }
check "victim is stopped" "$(state $VICTIM_PID)" = "T"
PIDFILE=$SANDBOX/paused.pids
LASTFILE=$SANDBOX/last_pause
echo "$VICTIM_PID" > "$PIDFILE"
touch -d "10 minutes ago" "$PIDFILE"
SISR_RESCUE_PIDFILE=$PIDFILE SISR_RESCUE_LASTFILE=$LASTFILE \
  SISR_RESCUE_AGE_S=60 SISR_RESCUE_POLL_S=1 SISR_RESCUE_MAX_ITERS=1 \
  bash "$HERE/tools/pause_rescuer.sh"
sleep 0.3
check "victim resumed by rescuer" "$(state $VICTIM_PID)" != "T"
check "pidfile removed" ! -f "$PIDFILE"
check "last-pause marker stamped" -s "$LASTFILE"
kill "$VICTIM_PID" 2>/dev/null; VICTIM_PID=""

# --- 1b. rescuer leaves a FRESH pause alone (live bench still measuring) --
sleep 600 & VICTIM_PID=$!
kill -STOP "$VICTIM_PID"
echo "$VICTIM_PID" > "$PIDFILE"   # fresh mtime
SISR_RESCUE_PIDFILE=$PIDFILE SISR_RESCUE_LASTFILE=$LASTFILE \
  SISR_RESCUE_AGE_S=60 SISR_RESCUE_POLL_S=1 SISR_RESCUE_MAX_ITERS=1 \
  bash "$HERE/tools/pause_rescuer.sh"
check "fresh pause NOT rescued (bench may be live)" "$(state $VICTIM_PID)" = "T"
kill -CONT "$VICTIM_PID" 2>/dev/null; kill "$VICTIM_PID" 2>/dev/null; VICTIM_PID=""
rm -f "$PIDFILE"

# --- 2. paused_during(): verbatim from the round-5 chain -------------------
src=$(awk '/^paused_during\(\)/,/^\}/' "$CHAIN")
[ -n "$src" ] || { echo "FAIL: could not extract paused_during()"; exit 1; }
# point the markers into the sandbox (the function hardcodes /tmp paths)
src=${src//\/tmp\/sisr_bench_paused.pids/$SANDBOX/paused.pids}
src=${src//\/tmp\/sisr_bench_last_pause/$SANDBOX/last_pause}
eval "$src"

rm -f "$SANDBOX/paused.pids" "$SANDBOX/last_pause"
NOW=$(date +%s)
if paused_during "$((NOW - 100))"; then
  echo "FAIL: no markers => must not classify as paused"; fails=$((fails+1))
else echo "PASS: no markers => not paused"; fi

echo $((NOW - 50)) > "$SANDBOX/last_pause"   # pause resumed 50 s ago
if paused_during "$((NOW - 100))"; then
  echo "PASS: pause inside the leg window => outage classification"
else echo "FAIL: pause inside leg window missed"; fails=$((fails+1)); fi
if paused_during "$NOW"; then
  echo "FAIL: pause BEFORE leg start must not classify"; fails=$((fails+1))
else echo "PASS: stale pause (before leg start) ignored"; fi

echo "123" > "$SANDBOX/paused.pids"          # still-live pause file
if paused_during "$NOW"; then
  echo "PASS: live pause file => outage classification"
else echo "FAIL: live pause file missed"; fails=$((fails+1)); fi
rm -f "$SANDBOX/paused.pids"

# --- 3. bench.py SIGTERM mid-run: best-so-far line + rc 0 ------------------
OUT=$(python3 - "$HERE/bench.py" <<'EOF'
import importlib.util, os, signal, sys
spec = importlib.util.spec_from_file_location("bench", sys.argv[1])
b = importlib.util.module_from_spec(spec)
spec.loader.exec_module(b)
b._best["infer"].update({"infer_mps": 171.0, "batch": 16})
b._install_signal_handlers()
os.kill(os.getpid(), signal.SIGTERM)
print("UNREACHABLE")  # the handler must have exited 0 already
EOF
)
rc=$?
check "SIGTERM exits 0" "$rc" -eq 0
case "$OUT" in
  *'"metric": "celeba_x4_infer_mps_per_chip"'*'"value": 171.0'*)
    echo "PASS: SIGTERM printed the best-so-far JSON line" ;;
  *) echo "FAIL: SIGTERM output was: $OUT"; fails=$((fails+1)) ;;
esac
case "$OUT" in
  *UNREACHABLE*) echo "FAIL: handler did not exit"; fails=$((fails+1)) ;;
  *) echo "PASS: handler exited before resuming main flow" ;;
esac

# --- 4. bench pause markers must never match bash supervisors/chains ------
if python3 - "$HERE/bench.py" <<'EOF'
import ast, sys
tree = ast.parse(open(sys.argv[1]).read())
src = open(sys.argv[1]).read()
import re
m = re.search(r"markers = \(([^)]*)\)", src)
markers = [s.strip().strip('"\',') for s in m.group(1).split(",") if s.strip()]
bad = [x for x in markers if "supervisor" in x or "chain" in x
       or "watchdog" in x or "rescuer" in x]
sys.exit(1 if bad else 0)
EOF
then echo "PASS: pause markers exclude supervisors/chains/watchdog/rescuer"
else echo "FAIL: pause markers include queue machinery"; fails=$((fails+1)); fi

echo
if [ "$fails" -eq 0 ]; then echo "ALL CHECKS PASSED"; exit 0; fi
echo "$fails CHECK(S) FAILED"; exit 1
