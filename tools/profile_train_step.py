"""Profile the fused GAN train step on the real chip and print a per-op
device-time breakdown (top HLO ops grouped by source component).

Parses the jax.profiler trace's *.trace.json.gz (TPU pid rows) like the
round-1 methodology in BENCH_NOTES.md.
"""
from __future__ import annotations

import collections
import dataclasses
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from sisr_tpu.config import preset_x2_gan
    from sisr_tpu.models.vgg import VGGConfig, vgg_init
    from sisr_tpu.train import init_train_state
    from sisr_tpu.train.multi_step import init_replay_state, make_multi_step

    cfg = preset_x2_gan("celeba")
    cfg = dataclasses.replace(
        cfg, generator=dataclasses.replace(cfg.generator, n_suffixes=1))
    hr_s, _ = cfg.geometry()
    batch = cfg.batch_size

    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.uniform(-1, 1, (batch, hr_s[1], hr_s[2], hr_s[0]))
                     .astype(np.float32))
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    vgg_params = vgg_init(jax.random.PRNGKey(1), VGGConfig(cfg.vgg_mask))

    K = 8
    rs = init_replay_state(cfg, (batch, hr_s[1], hr_s[2], hr_s[0]))
    rs["n"] = jnp.asarray(cfg.replay.max_len, jnp.int32)
    fused = make_multi_step(cfg, total_steps=1000, k_steps=K, d_active=True,
                            g_adv_active=True, cont_kind="vgg",
                            vgg_params=vgg_params)
    hr_stack = jnp.broadcast_to(hr, (K,) + hr.shape)
    w = (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(1.0))

    m = None
    for _ in range(2):  # compile + warm
        ts, rs, m = fused(ts, rs, hr_stack, hr_stack, w)
    _ = float(m["errD"][-1])

    logdir = "/tmp/sisr_trace_r2"
    jax.profiler.start_trace(logdir)
    for _ in range(2):
        ts, rs, m = fused(ts, rs, hr_stack, hr_stack, w)
    _ = float(m["errD"][-1])
    jax.profiler.stop_trace()

    paths = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
    assert paths, "no trace written"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    events = trace["traceEvents"]
    # identify TPU pids (process_name metadata containing 'TPU' or '/device')
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "XLA Op" in n}
    print("processes:", pid_names)

    durs = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0)  # us
        total += dur
        durs[name] += dur
        counts[name] += 1

    print(f"\ntotal device op-time: {total/1e3:.2f} ms over the traced window")
    print(f"{'op':68s} {'ms':>8s} {'n':>5s}")
    for name, d in durs.most_common(45):
        print(f"{name[:68]:68s} {d/1e3:8.3f} {counts[name]:5d}")


if __name__ == "__main__":
    main()
