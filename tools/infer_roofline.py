"""Inference roofline: FLOPs, bytes moved, MFU, and speed-of-light MP/s for
the deploy serving path (VERDICT r2 next #4 — give infer the same rigor as
train).

For each variant (XLA deploy b16/b64, pallas-trunk b16) this measures
wall-clock with the chained no-DCE harness and pulls FLOPs + bytes-accessed
from the compiled program's XLA cost analysis, then states:

  mfu        = flops / t / PEAK_FLOPS
  bw_util    = bytes / t / PEAK_BW
  sol_ms     = max(flops / PEAK_FLOPS, bytes / PEAK_BW)  (per batch)
  sol_mps    = mp_per_batch / sol_ms  — the speed-of-light MP/s at this
               batch given what the compiled program actually computes and
               moves; gap = sol_mps / measured_mps.

Run on the real chip:  python tools/infer_roofline.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_FLOPS = 197e12  # v5e bf16 MXU peak
PEAK_BW = 819e9      # v5e HBM GB/s


def main():
    import jax
    import jax.numpy as jnp

    from _bench_util import chain_timed
    from sisr_tpu.config import preset_x2_gan
    import dataclasses
    from sisr_tpu.infer import make_deploy_fn
    from sisr_tpu.train import init_train_state

    cfg = preset_x2_gan("celeba")
    cfg = dataclasses.replace(
        cfg, generator=dataclasses.replace(cfg.generator, n_suffixes=1))
    hr_s, lr_s = cfg.geometry()
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    rows = []
    for batch, use_pallas in ((16, False), (16, True), (64, False)):
      try:
        lr = jnp.asarray(rng.uniform(-1, 1, (batch, lr_s[1], lr_s[2], lr_s[0]))
                         .astype(np.float32))
        infer = make_deploy_fn(ts["params_g"], ts["state_g"], cfg.generator,
                               use_pallas_trunk=use_pallas,
                               compute_dtype=jnp.bfloat16)
        jf = jax.jit(infer)
        flops = bytes_acc = None
        try:
            ca = jf.lower(lr).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            bytes_acc = float(ca.get("bytes accessed", 0.0))
        except Exception as e:
            print(f"[warn] cost analysis unavailable: {e}", file=sys.stderr)

        dt = chain_timed(jf, lr, iters=60)
        mp = batch * hr_s[1] * hr_s[2] / 1e6
        row = {"variant": ("pallas_trunk" if use_pallas else "xla"),
               "batch": batch,
               "ms": round(dt * 1e3, 3), "mps": round(mp / dt, 1)}
        if flops:
            sol = max(flops / PEAK_FLOPS, (bytes_acc or 0) / PEAK_BW)
            row.update({
                "gflops_per_batch": round(flops / 1e9, 2),
                "mb_accessed": round((bytes_acc or 0) / 1e6, 1),
                "mfu": round(flops / dt / PEAK_FLOPS, 3),
                "bw_util": round((bytes_acc or 0) / dt / PEAK_BW, 3),
                "sol_ms": round(sol * 1e3, 3),
                "sol_mps": round(mp / sol, 1),
                "gap_x": round(dt / sol, 2),
                "bound": ("bandwidth" if (bytes_acc or 0) / PEAK_BW
                          > flops / PEAK_FLOPS else "compute"),
            })
        rows.append(row)
        print(json.dumps(row), flush=True)
      except Exception as e:  # e.g. pallas variant on a non-TPU backend
        print(json.dumps({"variant": ("pallas_trunk" if use_pallas else "xla"),
                          "batch": batch, "error": str(e)[:200]}), flush=True)

    print(json.dumps({"peak_tf_s": PEAK_FLOPS / 1e12,
                      "peak_gb_s": PEAK_BW / 1e9, "rows": rows}))


if __name__ == "__main__":
    main()
