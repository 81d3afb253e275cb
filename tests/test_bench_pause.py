"""Bench pause/rescue semantics (VERDICT r4 next #1c).

Round 4's failure chain: bench.py SIGSTOPped the supervisor containing its
own rescue function, died at the driver's timeout, and left the whole
queue frozen ~50 min; the resumed leg then hit its GNU timeout (wall clock
ticks through SIGSTOP) and the chain classified that rc=124 as a REAL
failure, consuming an attempt of a 5-hour leg.

tools/test_bench_pause_semantics.sh drives the real implementations:
the standalone pause_rescuer (one fast iteration) against a SIGSTOPped
victim, paused_during() extracted verbatim from round5_chain.sh, bench's
SIGTERM best-so-far emission, and a static check that bench's pause
markers can never match the queue machinery itself.
"""
import pathlib
import subprocess

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_injected_bench_kill_leaves_queue_running():
    proc = subprocess.run(
        ["bash", str(REPO / "tools" / "test_bench_pause_semantics.sh")],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "ALL CHECKS PASSED" in proc.stdout
    assert "FAIL:" not in proc.stdout
