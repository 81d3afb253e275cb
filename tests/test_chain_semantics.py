"""Queue failure-semantics test (VERDICT r3 next #2).

Round 3's defect: a transient relay outage and a real training failure both
exited rc=1, so the chain cancelled every downstream leg and the supervisor
saw a clean exit — an injected outage permanently killed the quality wave.
Round 4's chain (tools/round4_chain.sh) distinguishes them: outages exit 75
(EX_TEMPFAIL, the cli.train pre-flight contract) and re-queue forever; real
failures are attempt-capped then marked .failed.

tools/test_chain_semantics.sh extracts run()/need()/leg_running() verbatim
from the live chain script and drives them with stub train commands in a
sandbox — injected outage, dead-probe timeout, flaky-then-green leg,
persistent failure, done-leg skip, and grep-option-safe `--` leg markers.
"""
import pathlib
import subprocess

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_injected_outage_requeues_not_cancels():
    proc = subprocess.run(
        ["bash", str(REPO / "tools" / "test_chain_semantics.sh")],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "ALL CHECKS PASSED" in proc.stdout
    assert "FAIL:" not in proc.stdout
