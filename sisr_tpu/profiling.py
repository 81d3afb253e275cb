"""Tracing / profiling / memory monitoring.

The reference's observability is wall-clock prints ("train loop in N s",
reference train.py:30,124), self-test per-call timings
(model_generator.py:144-157), and a GC-walk tensor high-water mark
(`mem_report`, utils.py:212-221). TPU-native equivalents:

- `step_timer`: per-step EMA timing with periodic MP/s reporting;
- `trace` context: jax.profiler trace capture (open in XProf/TensorBoard);
- `mem_report`: device HBM stats from the runtime allocator (replacing the
  GC walk) with the same print-on-new-high-water behavior;
- `flops_estimate`: analytic FLOP count of a jitted function via XLA cost
  analysis, for MFU accounting.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


class step_timer:
    """EMA step timer; prints `megapixels/sec` every `report_every` steps."""

    def __init__(self, mp_per_step: float, report_every: int = 50,
                 alpha: float = 0.1):
        self.mp = mp_per_step
        self.every = report_every
        self.alpha = alpha
        self.ema: Optional[float] = None
        self.n = 0
        self._last = time.perf_counter()

    def tick(self, verbose: bool = True) -> Optional[float]:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.ema = dt if self.ema is None else \
            (1 - self.alpha) * self.ema + self.alpha * dt
        self.n += 1
        if verbose and self.n % self.every == 0:
            print(f"[timer] step {self.n}: {self.ema * 1e3:.1f} ms/step "
                  f"= {self.mp / self.ema:.2f} MP/s")
        return self.ema


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sisr_trace"):
    """Capture a device trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        print(f"[trace] written to {logdir}")


class MemReport:
    """Device-memory high-water reporting (reference mem_report semantics:
    print only when a new high-water mark is reached, utils.py:212-221)."""

    def __init__(self, device=None):
        self.device = device or jax.devices()[0]
        self.max_bytes = 0

    def __call__(self, tag: str = "") -> int:
        stats = self.device.memory_stats() or {}
        used = int(stats.get("bytes_in_use", 0))
        if used > self.max_bytes:
            self.max_bytes = used
            print(f"[mem] {tag} high-water {used / 2**30:.2f} GiB "
                  f"(limit {int(stats.get('bytes_limit', 0)) / 2**30:.2f})")
        return used


mem_report = MemReport  # reference-familiar alias


def flops_estimate(jitted_fn: Callable, *args) -> Optional[float]:
    """Analytic FLOPs of one call via XLA cost analysis (None if the
    backend doesn't expose it)."""
    try:
        lowered = jitted_fn.lower(*args)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return None


def preflight_tpu(timeout_s: float = 280.0, attempts: int = 3,
                  retry_sleep_s: float = 45.0) -> bool:
    """Probe the TPU relay in a killable subprocess.

    A dead relay parks jax backend init in a futex FOREVER (observed in a
    ~4h round-2 outage) — even `jax.devices()` hangs — so the probe must
    run in a subprocess that can be killed, BEFORE this process touches
    jax. Returns True iff a trivial matmul round-trips on the TPU backend
    within timeout_s (default 280 s: relay degraded windows stretch plain
    backend init to ~200-300 s — measured 2026-08-19 — and a probe budget
    below that declares a WORKING chip dead).

    Retries: on this 1-core host a concurrent CPU job (test suite, data
    gen) can starve the probe subprocess past timeout_s even when the
    relay is healthy (observed 2026-08-19: a queue leg died as
    "unreachable" while the chip was answering). A single timeout is
    therefore ambiguous; only `attempts` consecutive timeouts count as a
    dead relay. A real process-level failure (nonzero rc with output)
    still fails fast. Timed-out attempts are separated by `retry_sleep_s`
    (the starving CPU job typically persists for minutes; back-to-back
    retries would all starve together), so worst-case dead-relay
    detection is ~attempts*(timeout_s+retry_sleep_s) ~= 11 min at the
    defaults.
    """
    import subprocess
    import sys
    probe = ("import jax, jax.numpy as jnp; "
             "assert jax.default_backend() == 'tpu'; "
             "assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0; "
             "print('ok')")
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=timeout_s,
                               text=True)
            if r.returncode == 0 and "ok" in r.stdout:
                return True
            return False  # loud failure (bad backend/assert), not a hang
        except subprocess.TimeoutExpired:
            if i + 1 < attempts:
                print(f"preflight probe timed out (attempt {i + 1}/"
                      f"{attempts}) — retrying in {retry_sleep_s:.0f}s",
                      file=sys.stderr)
                time.sleep(retry_sleep_s)
    return False
