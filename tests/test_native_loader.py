"""Native (C++) data-loader core: bitwise parity with the Python path.

The loader reimplements numpy's SeedSequence/PCG64/uniform/Lemire-
integers/ziggurat-normal stack in C++ (sisr_tpu/data/_native/loader.cpp)
and must produce a bit-identical pixel stream to SyntheticDataset
(sisr_tpu/data/pipeline.py:71-91). These tests pin that contract at every
level: raw RNG streams, distributions, whole images, batches, and the
BatchLoader integration. TPU analog of the reference's reliance on
torch's C++ DataLoader workers (reference config.py:251).
"""
import ctypes

import numpy as np
import pytest

from sisr_tpu.data import native_loader
from sisr_tpu.data.native_loader import NativeSyntheticDataset, ph_ptr
from sisr_tpu.data.pipeline import BatchLoader, SyntheticDataset


@pytest.fixture(scope="module")
def lib():
    lib = native_loader.load()
    if lib is None:
        pytest.skip(f"native loader unavailable: {native_loader.native_status()}")
    return lib


def test_seedseq_state_bitwise(lib):
    for seed in [0, 1, 5, 12345, 2**31, 2**40 + 7]:
        out = np.zeros(4, np.uint64)
        lib.sisr_seedseq_state(ctypes.c_uint64(seed), ph_ptr(out))
        ref = np.random.SeedSequence(seed).generate_state(4, np.uint64)
        assert (out == ref).all(), seed


def test_raw_stream_bitwise(lib):
    for seed in [0, 7, 999, 2**33]:
        out = np.empty(4096, np.uint64)
        lib.sisr_rng_raw(ctypes.c_uint64(seed), ctypes.c_int64(4096),
                         ph_ptr(out))
        ref = np.random.default_rng(seed).bit_generator.random_raw(4096)
        assert (out == ref).all(), seed


def test_uniform_bitwise(lib):
    for seed, (lo, hi) in [(3, (0.5, 6.0)), (77, (-1.2, 1.2)),
                           (5, (0.0, 2 * np.pi))]:
        out = np.empty(1000, np.float64)
        lib.sisr_rng_uniform(ctypes.c_uint64(seed), ctypes.c_double(lo),
                             ctypes.c_double(hi), ctypes.c_int64(1000),
                             ph_ptr(out))
        ref = np.random.default_rng(seed).uniform(lo, hi, 1000)
        assert (out == ref).all(), seed


def test_integers_bitwise(lib):
    """Scalar Generator.integers uses the buffered 32-bit Lemire path;
    interleaved ranges exercise the has_uint32 buffer carry."""
    for seed in [4, 88, 1234]:
        out = np.empty(2000, np.int64)
        lib.sisr_rng_integers(ctypes.c_uint64(seed), ctypes.c_int64(0),
                              ctypes.c_int64(126), ctypes.c_int64(2000),
                              ph_ptr(out))
        g = np.random.default_rng(seed)
        ref = np.array([g.integers(0, 126) for _ in range(2000)])
        assert (out == ref).all(), seed


def test_standard_normal_bitwise(lib):
    """200k draws/seed: exercises accept, wedge, and tail paths of the
    extracted ziggurat tables with zero stream desyncs."""
    for seed in [42, 0, 31337]:
        out = np.empty(200_000, np.float64)
        lib.sisr_rng_normal(ctypes.c_uint64(seed), ctypes.c_int64(200_000),
                            ph_ptr(out))
        ref = np.random.default_rng(seed).standard_normal(200_000)
        assert (out == ref).all(), seed


@pytest.mark.parametrize("hr_size", [(3, 32, 32), (1, 48, 48), (3, 128, 128)])
def test_images_bitwise(lib, hr_size):
    ds_py = SyntheticDataset(hr_size, length=1 << 16)
    ds_nat = NativeSyntheticDataset(hr_size, length=1 << 16)
    for i in [0, 1, 5, 4095, (1 << 16) - 1]:
        ref = ds_py._generate(i)
        out = ds_nat[i]
        assert out.dtype == np.float32 and out.shape == ref.shape
        assert (ref == out).all(), (hr_size, i)


def test_batch_matches_items_and_caches(lib):
    ds = NativeSyntheticDataset((3, 24, 24), length=64)
    idx = [3, 9, 3, 60]
    b = ds.batch(idx)
    assert b.shape == (4, 24, 24, 3)
    for k, i in enumerate(idx):
        assert (b[k] == ds[i]).all()
    # second call is served from cache and identical
    assert (ds.batch(idx) == b).all()


def test_batchloader_native_vs_python_identical(lib):
    py = BatchLoader(SyntheticDataset((3, 16, 16), 32), range(24), 8)
    nat = BatchLoader(NativeSyntheticDataset((3, 16, 16), 32), range(24), 8)
    for a, b in zip(py, nat):
        assert (a == b).all()


def test_env_disable_falls_back(monkeypatch):
    """SISR_NATIVE_LOADER=0 must route through the Python generator and
    still produce the same data (bitwise, trivially)."""
    monkeypatch.setenv("SISR_NATIVE_LOADER", "0")
    monkeypatch.setattr(native_loader, "_lib", None)
    monkeypatch.setattr(native_loader, "_failed", None)
    try:
        assert native_loader.load() is None
        ds = NativeSyntheticDataset((3, 16, 16), length=8)
        ref = SyntheticDataset((3, 16, 16), length=8)
        assert (ds[2] == ref[2]).all()
        assert (ds.batch([0, 5]) == np.stack([ref[0], ref[5]])).all()
    finally:
        monkeypatch.setattr(native_loader, "_failed", None)


def test_self_check_guard(lib):
    """native_status reports active once loaded + self-checked."""
    assert native_loader.native_status() == "active"


def test_threaded_batch_bitwise(lib, monkeypatch):
    """With an OpenMP build, a multi-threaded batch fill must be
    bit-identical to the single-thread result (each image owns its own
    PCG64 stream, so scheduling order cannot matter)."""
    import os
    ds = NativeSyntheticDataset((3, 32, 32), length=256)
    ds._cache_max = 0
    idx = list(range(64))
    a = ds.batch(idx)
    os.environ["OMP_NUM_THREADS"] = "4"  # no-op on a serial build
    try:
        b = ds.batch(idx)
    finally:
        os.environ.pop("OMP_NUM_THREADS", None)
    assert (a == b).all()
