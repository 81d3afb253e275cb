"""Benchmark the native (C++) synthetic generator vs the Python path.

Measures cold generation throughput (cache-miss path, the cost that
dominates a run's first epoch) and batch assembly. Single-process wall
time; on multi-core hosts rebuild loader.cpp with -fopenmp for parallel
batch fills (this image's bench host is 1-core, so numbers here are
single-thread).

Usage: python tools/bench_loader.py [--n 512] [--hw 128]
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--hw", type=int, default=128)
    args = ap.parse_args()

    from sisr_tpu.data import native_loader
    from sisr_tpu.data.native_loader import NativeSyntheticDataset
    from sisr_tpu.data.pipeline import SyntheticDataset

    hr = (3, args.hw, args.hw)
    n = args.n
    length = 1 << 20

    lib = native_loader.load()
    if lib is None:
        print(f"native loader unavailable: {native_loader.native_status()}")
        return

    # warm both paths (page-fault the batch buffers, JIT nothing: first
    # native call also touches the fresh 25 MB output allocation)
    py = SyntheticDataset(hr, length)
    nat = NativeSyntheticDataset(hr, length)
    nat._cache_max = 0  # force the generate path
    idx = list(range(1000, 1000 + n))
    nat.batch(idx[:64])
    for i in range(8):
        py._generate(i)

    def best_of(fn, trials=3):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_py = best_of(lambda: [py._generate(1000 + i) for i in range(n)])
    t_nat = best_of(lambda: [nat.batch(idx[b:b + 64])
                             for b in range(0, n, 64)])

    print(json.dumps({
        "images": n, "hw": args.hw,
        "python_ms_per_image": round(t_py / n * 1e3, 3),
        "native_ms_per_image": round(t_nat / n * 1e3, 3),
        "speedup": round(t_py / t_nat, 2),
    }))


if __name__ == "__main__":
    main()
