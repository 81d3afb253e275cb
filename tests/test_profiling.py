import jax
import jax.numpy as jnp

from sisr_tpu.profiling import MemReport, flops_estimate, step_timer


def test_step_timer_reports():
    t = step_timer(mp_per_step=1.0, report_every=2)
    assert t.tick(verbose=False) is not None
    assert t.tick(verbose=False) > 0


def test_mem_report_runs():
    m = MemReport()
    used = m("test")
    assert used >= 0


def test_flops_estimate_matmul():
    f = jax.jit(lambda a, b: a @ b)
    a = jnp.zeros((64, 64))
    fl = flops_estimate(f, a, a)
    if fl is not None:  # backend-dependent
        assert fl >= 2 * 64 ** 3 * 0.5
