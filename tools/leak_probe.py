"""Characterize the axon-relay client's host-memory growth (VERDICT r4
next #7: the resumed real_x4_v2 leg reached 99+ GB RSS on a 125 GB host).

Round-5 diagnosis so far (this tool produces the confirming evidence):
  - /proc/<leg>/maps shows ~93 GB in [heap]; our loop retains nothing
    (loss history is floats, metrics are device_get'd, pending is flushed)
  - growth is linear in UPLOADED bytes (~2.6 GB/epoch = the HR-stack
    upload volume), NOT in checkpoint or replay size — the hypothesis
    that the 477 MB checkpoint load was responsible is wrong
  - the CPU backend shows no growth (the mnist leg sat at 1.6 GB)

Hypothesis: the relay client retains every unique host->device transfer
buffer (the transfer-dedup cache that makes un-chained repeated uploads
"free", CLAUDE.md bench methodology note). This probe measures RSS while
uploading (a) the SAME array repeatedly and (b) FRESH unique arrays, and
prints one JSON line with both slopes. If slope(b) ~= bytes uploaded and
slope(a) ~= 0, the retention is content-keyed upload caching and the
mitigations are: swap for long legs (mounted round 5), uint8 transport
(4x less), and bounded per-process epochs.

Usage: python tools/leak_probe.py [--mb-per-upload 12] [--uploads 40]
"""
from __future__ import annotations

import argparse
import json
import os


def rss_mb() -> float:
    with open(f"/proc/{os.getpid()}/status") as f:
        for ln in f:
            if ln.startswith("VmRSS"):
                return float(ln.split()[1]) / 1024.0
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb-per-upload", type=float, default=12.0)
    ap.add_argument("--uploads", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(args.mb_per_upload * (1 << 20) / 4)
    shape = (n,)

    @jax.jit
    def consume(x):
        return jnp.sum(x)

    # warmup: backend init + compile out of the measurement
    base = np.zeros(shape, np.float32)
    _ = float(consume(jnp.asarray(base)))

    r0 = rss_mb()
    for _ in range(args.uploads):
        _ = float(consume(jnp.asarray(base)))  # same content, same buffer
    r1 = rss_mb()
    same_growth = r1 - r0

    rng = np.random.default_rng(0)
    for i in range(args.uploads):
        fresh = rng.standard_normal(n).astype(np.float32)  # unique content
        _ = float(consume(jnp.asarray(fresh)))
        del fresh
    r2 = rss_mb()
    fresh_growth = r2 - r1

    # uint8 transport (TrainConfig.uint8_transport): the same PIXEL stream
    # as the fresh-fp32 case (n elements/upload) but raw uint8 + on-device
    # normalize — 4x fewer bytes on the wire, so if retention is
    # buffer-keyed the growth should drop ~4x
    @jax.jit
    def consume_u8(x):
        return jnp.sum(x.astype(jnp.float32) / 255.0 * 2.0 - 1.0)

    _ = float(consume_u8(jnp.asarray(np.zeros(shape, np.uint8))))  # compile
    r2 = rss_mb()
    for i in range(args.uploads):
        fresh8 = rng.integers(0, 256, shape, dtype=np.uint8)  # same pixels
        _ = float(consume_u8(jnp.asarray(fresh8)))
        del fresh8
    r3 = rss_mb()
    u8_growth = r3 - r2

    uploaded_mb = args.uploads * args.mb_per_upload
    print(json.dumps({
        "metric": "relay_upload_retention",
        "backend": jax.default_backend(),
        "uploads": args.uploads,
        "mb_per_upload": args.mb_per_upload,
        "rss_growth_same_buffer_mb": round(same_growth, 1),
        "rss_growth_fresh_buffers_mb": round(fresh_growth, 1),
        "rss_growth_uint8_transport_mb": round(u8_growth, 1),
        "uploaded_mb": uploaded_mb,
        "retention_fraction_fresh": round(fresh_growth / uploaded_mb, 3),
        "retention_fraction_same": round(same_growth / uploaded_mb, 3),
        "uint8_vs_fp32_retention": round(u8_growth / fresh_growth, 3)
        if fresh_growth > 0 else None,
    }), flush=True)


if __name__ == "__main__":
    main()
