#!/bin/bash
# Everything round 3 needs from the chip, in priority order, resumable —
# armed behind tools/tpu_watchdog.sh:
#   1. round3_recovery.sh — green bench capture + the lost wave-8 legs
#   2. quality_round3.sh  — dfeat calibration/reruns + grown real corpus
#   3. round3_perf.sh     — l0/l1 layout sweep + infer roofline
set -u
cd "$(dirname "$0")/.."
bash tools/round3_recovery.sh
bash tools/quality_round3.sh
bash tools/round3_perf.sh
