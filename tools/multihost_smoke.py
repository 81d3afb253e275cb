"""Multi-host smoke test: 2 real processes, one sharded GAN step.

Evidence that parallel/mesh.py's multi-host path works end to end (the
reference scales with nn.DataParallel only, config.py:114-118; this repo's
DP rides a jax.sharding.Mesh that spans processes over DCN once
jax.distributed is initialized).

Launcher mode (default): spawns 2 worker subprocesses of THIS script, each
with 4 forced-host CPU devices, a shared Gloo coordinator on localhost, and
an 8-device global mesh. Each worker:
  1. calls sisr_tpu.parallel.mesh.init_distributed (the argument path under
     test) and asserts the global device count is 8 (4 local x 2 procs);
  2. builds the global 1-D data mesh and a tiny full GAN train step
     (d_active, g_adv_active, identity content) wrapped by
     shard_train_step;
  3. feeds its process-local batch shard via
     jax.make_array_from_process_local_data and runs ONE step;
  4. prints finite metrics and a params_g checksum.
The launcher asserts both workers pass and their post-step checksums agree
bit-for-bit (the gradient all-reduce crossed the process boundary), then
appends the transcript to quality_runs/multihost_smoke.log (committed).

Run: python tools/multihost_smoke.py          # launcher
     tests/test_multihost.py runs this under pytest with a bounded timeout.
"""
from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = int(os.environ.get("SISR_MH_PORT", "9911"))
N_PROC = 2
DEV_PER_PROC = 4


def worker(process_id: int) -> None:
    # drop any inherited device-count flag (pytest's conftest exports 8)
    # so each worker hosts exactly DEV_PER_PROC devices
    inherited = " ".join(
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC} " + inherited)
    import jax
    jax.config.update("jax_platforms", "cpu")

    from sisr_tpu.parallel.mesh import init_distributed, make_mesh, shard_train_step

    n = init_distributed(coordinator=f"localhost:{PORT}",
                         num_processes=N_PROC, process_id=process_id)
    assert n == N_PROC * DEV_PER_PROC, n
    assert jax.process_count() == N_PROC
    print(f"[proc {process_id}] global devices {n}, "
          f"local {len(jax.local_devices())}", flush=True)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sisr_tpu.config import GeneratorConfig, ReplayConfig, TrainConfig
    from sisr_tpu.parallel.mesh import batch_sharded, replicated
    from sisr_tpu.train.step import init_train_state, make_train_step

    cfg = TrainConfig(
        dataset="tiny",
        generator=GeneratorConfig(n_blocks=2, n_features_block=8,
                                  n_features_last=16, list_scales=(2,)),
        compute_dtype="float32",
        replay=ReplayConfig(max_len=20, sample_ratio=0.1),
    )
    mesh = make_mesh()
    assert mesh.devices.size == N_PROC * DEV_PER_PROC

    # identical seed on every process -> bit-identical replicated state
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    repl = replicated(mesh)
    ts = jax.device_put(ts, repl)

    step = shard_train_step(
        make_train_step(cfg, 100, d_active=True, g_adv_active=True,
                        cont_kind="identity", jit=False), mesh)

    hr_s, _ = cfg.geometry()
    B = N_PROC * DEV_PER_PROC  # one image per device, globally
    R = cfg.replay.max_samples
    rng = np.random.default_rng(7)  # same stream everywhere; each process
    hr_all = rng.uniform(-1, 1, (B, hr_s[1], hr_s[2], hr_s[0])).astype(np.float32)
    rep_all = rng.uniform(-1, 1, (R, B, hr_s[1], hr_s[2], hr_s[0])).astype(np.float32)
    lo = process_id * DEV_PER_PROC  # ...keeps only its local batch rows
    b0, b1 = batch_sharded(mesh, 0), batch_sharded(mesh, 1)
    hr = jax.make_array_from_process_local_data(b0, hr_all[lo:lo + DEV_PER_PROC])
    rep = jax.make_array_from_process_local_data(b1, rep_all[:, lo:lo + DEV_PER_PROC])
    rmask = jax.device_put(jnp.ones((R,), jnp.float32), repl)
    w = jax.device_put((jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(10.0)), repl)

    ts, fake, m = step(ts, hr, hr, rep, rmask, w)
    metrics = {k: float(v) for k, v in m.items()}
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    assert fake.shape == (B, hr_s[1], hr_s[2], hr_s[0])
    # replicated outputs are process-locally addressable: checksum must
    # agree across processes (the all-reduce crossed the DCN boundary)
    leaves = jax.tree_util.tree_leaves(ts["params_g"])
    csum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves))
    print(f"[proc {process_id}] errD={metrics['errD']:.6f} "
          f"errG_cont={metrics['errG_cont']:.6f} gsum={csum:.10e} OK", flush=True)


def launcher() -> int:
    env = dict(os.environ)
    procs = [subprocess.Popen([sys.executable, __file__, str(i)], env=env,
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True)
             for i in range(N_PROC)]
    outs = []
    rc = 0
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = 1
        outs.append(out)
        if p.returncode != 0:
            rc = 1
    transcript = "\n".join(outs)
    ok_lines = [l for l in transcript.splitlines() if l.endswith("OK")]
    gsums = {l.split("gsum=")[1].split()[0] for l in ok_lines if "gsum=" in l}
    if rc == 0 and (len(ok_lines) != N_PROC or len(gsums) != 1):
        rc = 1
    print(transcript)
    print(f"[launcher] ok_lines={len(ok_lines)} distinct_gsums={len(gsums)} rc={rc}")
    try:
        os.makedirs("quality_runs", exist_ok=True)
        with open("quality_runs/multihost_smoke.log", "a") as f:
            import datetime
            now = datetime.datetime.now(datetime.timezone.utc)
            f.write(f"=== {now.isoformat()} rc={rc}\n")
            for l in ok_lines:
                f.write(l + "\n")
    except OSError:
        pass
    return rc


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        sys.exit(launcher())
