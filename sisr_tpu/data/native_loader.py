"""ctypes driver for the native (C++) data-loader core.

The reference delegates its host input pipeline to torch's C++ DataLoader
workers (reference config.py:251 ``num_workers=2``); this is the TPU
build's native equivalent. ``loader.cpp`` reimplements numpy's RNG stack
(SeedSequence -> PCG64 -> uniform / Lemire integers / ziggurat normal)
bit-for-bit and generates the synthetic procedural dataset entirely in
C++; only ``np.cos``/``np.tanh`` stay in numpy (their float32 SIMD kernels
differ from C libm by 1 ulp, and batch-vectorizing them in numpy is both
exact and fast).

Safety: ``load()`` runs a bitwise self-check against the Python generator
(SyntheticDataset._generate) on first use. On any mismatch -- e.g. a host
whose numpy uses an AVX512 float64 sin that differs from libm -- the
native path disables itself and the pure-Python loader takes over, so the
data stream is identical no matter what. Control with SISR_NATIVE_LOADER:
"0" = never, "1" = required (raise if unusable), unset = auto.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

_ABI = 3
_SRC_DIR = os.path.join(os.path.dirname(__file__), "_native")
# loader.cpp's Grating.ph/col are fixed float[8] buffers (loader.cpp:227);
# channel counts past that would overflow native stack memory. Every known
# geometry is c<=3 (config.resolve_geometry), so >8 falls back to Python.
_MAX_NATIVE_CHANNELS = 8

_lib = None          # ctypes.CDLL once loaded + self-checked
_failed: Optional[str] = None   # reason the native path is disabled


def _mode() -> str:
    return os.environ.get("SISR_NATIVE_LOADER", "auto")


def _build() -> str:
    """Compile loader.cpp (cached by source hash). Returns .so path."""
    src = os.path.join(_SRC_DIR, "loader.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    prebuilt = os.path.join(_SRC_DIR, f"_loader_{digest}.so")
    if os.path.exists(prebuilt):
        return prebuilt
    cache = os.path.join(tempfile.gettempdir(), f"sisr_loader_{digest}.so")
    if os.path.exists(cache):
        return cache
    base = ["g++", "-O3", "-shared", "-fPIC", "-o", cache + ".tmp", src]
    # OpenMP parallelizes the per-image batch fill on multi-core hosts
    # (bit-identical output: each image owns its RNG stream); fall back
    # to a serial build where libgomp is unavailable.
    try:
        subprocess.run(base + ["-fopenmp"], check=True,
                       capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        subprocess.run(base, check=True, capture_output=True, timeout=120)
    os.replace(cache + ".tmp", cache)
    return cache


def _self_check(lib) -> Optional[str]:
    """Bitwise-compare two native images vs the Python generator."""
    from sisr_tpu.data.pipeline import SyntheticDataset
    h, w, c = 64, 64, 3
    ds = SyntheticDataset((c, h, w), length=1 << 20)
    idx = np.array([3, 54321], np.int64)
    native = _gen_batch(lib, idx, h, w, c)
    for k, i in enumerate(idx):
        if not (ds._generate(int(i)) == native[k]).all():
            return f"self-check mismatch at index {int(i)}"
    return None


def _gen_batch(lib, indices: np.ndarray, h: int, w: int, c: int) -> np.ndarray:
    if c > _MAX_NATIVE_CHANNELS:
        raise ValueError(f"native loader supports c<={_MAX_NATIVE_CHANNELS} "
                         f"(fixed stack buffers in loader.cpp), got {c}")
    n = len(indices)
    indices = np.ascontiguousarray(indices, np.int64)
    ph = np.empty((n, 4, c), np.float32)
    lib.sisr_synth_phases(ph_ptr(indices), ctypes.c_int64(n),
                          ctypes.c_int(c), ph_ptr(ph))
    cos_ph = np.cos(ph)  # numpy's f32 cos, matching the Python generator
    out = np.empty((n, h, w, c), np.float32)
    lib.sisr_synth_pretanh(ph_ptr(indices), ctypes.c_int64(n),
                           ctypes.c_int(h), ctypes.c_int(w), ctypes.c_int(c),
                           ph_ptr(cos_ph), ph_ptr(out))
    np.tanh(out, out=out)  # numpy's f32 tanh, ditto
    return out


def ph_ptr(a: np.ndarray) -> ctypes.c_void_p:
    return a.ctypes.data_as(ctypes.c_void_p)


def load():
    """Load (build if needed) + self-check the native core, or None."""
    global _lib, _failed
    if _lib is not None:
        return _lib
    if _failed is not None:
        return None
    mode = _mode()
    if mode == "0":
        _failed = "disabled by SISR_NATIVE_LOADER=0"
        return None
    try:
        lib = ctypes.CDLL(_build())
        lib.sisr_native_abi.restype = ctypes.c_int
        abi = lib.sisr_native_abi()
        if abi != _ABI:
            raise RuntimeError(f"ABI mismatch: built {abi}, need {_ABI}")
        err = _self_check(lib)
        if err:
            raise RuntimeError(err)
    except Exception as e:  # compiler missing, check failed, ...
        _failed = str(e)
        if mode == "1":
            raise RuntimeError(f"SISR_NATIVE_LOADER=1 but unusable: {e}")
        return None
    _lib = lib
    return _lib


def native_status() -> str:
    if _lib is not None:
        return "active"
    return f"inactive ({_failed})" if _failed else "not loaded"


class NativeSyntheticDataset:
    """Drop-in SyntheticDataset with C++ generation and a batch() fast
    path. Pixel streams are bit-identical to the Python generator (the
    self-check in load() guarantees it)."""

    def __init__(self, hr_size, length: int = 512):
        from sisr_tpu.data.pipeline import SyntheticDataset
        self._py = SyntheticDataset(hr_size, length)  # fallback + cache cap
        self.c, self.h, self.w = hr_size
        self.length = length
        self._cache = self._py._cache
        self._cache_max = self._py._cache_max

    def __len__(self):
        return self.length

    def __getitem__(self, i: int) -> np.ndarray:
        hit = self._cache.get(i)
        if hit is not None:
            return hit
        lib = load() if self.c <= _MAX_NATIVE_CHANNELS else None
        if lib is None:
            return self._py[i]
        out = _gen_batch(lib, np.array([i], np.int64), self.h, self.w,
                         self.c)[0]
        if len(self._cache) < self._cache_max:
            self._cache[i] = out
        return out

    def batch(self, indices: Sequence[int]) -> np.ndarray:
        """Assemble a batch, generating cache misses in one native call."""
        lib = load() if self.c <= _MAX_NATIVE_CHANNELS else None
        if lib is None:
            return np.stack([self._py[i] for i in indices])
        misses = [i for i in indices if i not in self._cache]
        if misses:
            gen = _gen_batch(lib, np.array(misses, np.int64), self.h,
                             self.w, self.c)
            for k, i in enumerate(misses):
                if len(self._cache) < self._cache_max:
                    self._cache[i] = gen[k]
            by_miss = {i: gen[k] for k, i in enumerate(misses)}
            return np.stack([self._cache.get(i, by_miss.get(i))
                             for i in indices])
        return np.stack([self._cache[i] for i in indices])
