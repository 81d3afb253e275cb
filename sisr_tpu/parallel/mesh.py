"""Data parallelism over a TPU device mesh.

This layer replaces the reference's entire distributed surface —
`nn.DataParallel(net, [0..ngpu))` applied to G, D, and the VGG extractor
(reference config.py:114-118) — with the idiomatic JAX recipe: build a
1-D `jax.sharding.Mesh` over all devices, annotate the train step's inputs
(params/state/optimizer replicated, batch and replay sharded on the 'data'
axis), and let GSPMD insert the collectives. Gradient all-reduce rides ICI
within a slice and DCN across hosts with no further code.

Sync-BN note: because the batch axis is sharded and BatchNorm reduces over
it with plain jnp.mean, the partitioner computes *global* batch statistics
(cross-replica sync BN) automatically. The reference's DataParallel computes
per-replica stats as an implementation accident; we standardize on synced
stats (stated choice, SURVEY.md §7 'hard parts').

Scaling beyond one host: initialize jax.distributed and the same code runs
unchanged — the mesh spans all processes' devices.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     init_timeout_s: Optional[float] = None) -> int:
    """Multi-host bring-up: after this, jax.devices() spans every host and
    the same make_mesh()/shard_train_step() code scales over DCN. On cloud
    TPU pods the arguments auto-detect; return the global device count."""
    import jax

    explicit = (coordinator, num_processes, process_id) != (None, None, None)
    if explicit:
        # any explicit argument means the caller REALLY runs multi-process:
        # misconfiguration (bad coordinator, mismatched ids) must fail
        # loudly, not fall back to a silent single-host mesh
        kw = {}
        if init_timeout_s is not None:
            kw["initialization_timeout"] = init_timeout_s
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id, **kw)
    else:
        try:
            jax.distributed.initialize()  # cloud-TPU-pod auto-detect
        except Exception:
            pass  # single-process: nothing to do
    return len(jax.devices())


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh over (the first n of) all visible devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch):
    """Place a host array on the mesh, sharded along dim 0."""
    return jax.device_put(batch, batch_sharded(mesh))


def shard_infer_fn(fn, mesh: Mesh):
    """Batch-parallel serving: wrap an UNJITTED x -> sr function (e.g.
    infer.deploy_apply closed over folded params) so the batch shards over
    the mesh and each device runs its slice — the inference analog of the
    reference wrapping net_g in DataParallel for visualisation
    (config.py:114-118). Params inside `fn`'s closure are replicated by
    GSPMD on first use."""
    b0 = batch_sharded(mesh, 0)
    return jax.jit(fn, in_shardings=(b0,), out_shardings=b0)


def shard_train_step(step_fn, mesh: Mesh, donate: bool = True,
                     with_data: bool = False):
    """Wrap an *unjitted* train step (sisr_tpu.train.step.make_train_step
    with jit=False) with data-parallel shardings.

    Inputs: (ts, hr, hr_d, replay, replay_mask, weights[, data])
      ts / weights replicated; hr, hr_d sharded on batch dim 0; the replay
      stack (R, B, H, W, C) sharded on its *batch* dim 1; the replay mask
      replicated. With `with_data=True` the step takes a 7th argument: the
      device-resident corpus (cfg.device_data), replicated — hr/hr_d are
      then per-shard index vectors gathered from it on device.
    Outputs: (ts, fake, metrics) — ts and metrics replicated, fake sharded.
    """
    repl = replicated(mesh)
    b0 = batch_sharded(mesh, 0)
    b1 = batch_sharded(mesh, 1)
    in_sh = (repl, b0, b0, b1, repl, repl)
    if with_data:
        in_sh = in_sh + (repl,)
    return jax.jit(
        step_fn,
        in_shardings=in_sh,
        out_shardings=(repl, b0, repl),
        donate_argnums=(0,) if donate else (),
    )
