"""Device-resident experience replay (the reference's dis_list_old_cpu=False
mode, config.py:53: buffer lives on the accelerator).

The host ReplayBuffer (train/replay.py) re-uploads the sampled stack every
step (~31 MB at celeba x4 / batch 16). This variant keeps the whole ring in
HBM as one (max_len, B, H, W, C) bfloat16 array updated and sampled by tiny
jitted kernels, so the train loop never moves replay data across the host
boundary. Semantics match the host buffer:

- store every `save_freq` iterations; random-overwrite eviction when full;
- per step, int(len * sample_ratio) distinct batches sampled uniformly
  (top-k over uniform scores restricted to the live prefix);
- persistence through the same state_dict()/load_state_dict API.

bfloat16 storage: generated images are tanh-bounded; storing the D input at
bf16 changes the replay loss below fp32 noise while halving HBM.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sisr_tpu.config import ReplayConfig


def replay_store(stack, n, key, fake, max_len: int):
    """Traced core: insert (or random-overwrite) one batch. Returns
    (stack, n)."""
    evict = jax.random.randint(key, (), 0, jnp.maximum(n, 1))
    idx = jnp.where(n < max_len, n, evict).astype(jnp.int32)
    stack = jax.lax.dynamic_update_index_in_dim(
        stack, fake.astype(stack.dtype), idx, axis=0)
    return stack, jnp.minimum(n + 1, max_len)


def replay_sample(stack, n, key, r: int, ratio: float):
    """Traced core: r distinct uniform indices over the live prefix +
    live-count mask. Returns (sampled fp32, mask)."""
    max_len = stack.shape[0]
    scores = jax.random.uniform(key, (max_len,))
    scores = jnp.where(jnp.arange(max_len) < n, scores, jnp.inf)
    _, idx = jax.lax.top_k(-scores, r)              # r distinct live indices
    sampled = stack[idx].astype(jnp.float32)
    k = jnp.floor(n.astype(jnp.float32) * ratio).astype(jnp.int32)
    mask = (jnp.arange(r) < k).astype(jnp.float32)
    return sampled, mask


@functools.partial(jax.jit, static_argnames=("max_len",), donate_argnums=(0,))
def _store(stack, n, key, fake, *, max_len):
    # key split happens inside the jitted call: an eager jax.random.split
    # is a full remote-dispatch round trip (~tens of ms) per train step
    # through the relay runtime. Same (split -> use second) sequence as the
    # previous host-side split, so stored values are unchanged.
    key, k = jax.random.split(key)
    stack, n = replay_store(stack, n, k, fake, max_len)
    return stack, n, key


@functools.partial(jax.jit, static_argnames=("r", "ratio"))
def _sample(stack, n, key, *, r, ratio):
    key, k = jax.random.split(key)
    sampled, mask = replay_sample(stack, n, k, r, ratio)
    return sampled, mask, key


class DeviceReplayBuffer:
    """Same interface as ReplayBuffer, but store/sample return/consume
    device arrays and never round-trip through the host."""

    def __init__(self, cfg: ReplayConfig, batch_shape: Tuple[int, ...],
                 seed: int = 0):
        self.cfg = cfg
        self.batch_shape = tuple(batch_shape)
        self._stack = jnp.zeros((max(cfg.max_len, 1),) + self.batch_shape,
                                jnp.bfloat16)
        self._n = jnp.zeros((), jnp.int32)
        self._key = jax.random.PRNGKey(seed)
        # True while a scan state handed out by as_scan_state is live: the
        # fused driver donates it (multi_step donate_argnums), so our
        # internal arrays are invalidated device buffers until
        # load_scan_state re-materializes them. Direct use in that window
        # (mid-epoch persistence, inspection) must fail loudly, not read
        # garbage — loop.sync_buf() is the re-materialization point.
        self._donated = False

    def _check_live(self, op: str) -> None:
        if self._donated:
            raise RuntimeError(
                f"DeviceReplayBuffer.{op} while a scan state from "
                "as_scan_state() is outstanding (internal buffers were "
                "donated to the fused driver); call load_scan_state() / "
                "loop.sync_buf() first")

    def __len__(self) -> int:
        self._check_live("__len__")
        return int(self._n)

    def maybe_store(self, iteration: int, fake) -> None:
        if self.cfg.max_len == 0 or iteration % self.cfg.save_freq != 0:
            return
        self._check_live("maybe_store")
        self._stack, self._n, self._key = _store(
            self._stack, self._n, self._key, fake, max_len=self.cfg.max_len)

    def sample(self):
        self._check_live("sample")
        r = max(self.cfg.max_samples, 1)
        sampled, mask, self._key = _sample(self._stack, self._n, self._key,
                                           r=r, ratio=self.cfg.sample_ratio)
        if self.cfg.max_samples == 0:
            return sampled[:0], mask[:0]
        return sampled, mask

    # --- fused-driver interop (train/multi_step.py carry format) ---

    def as_scan_state(self, iteration: int):
        self._check_live("as_scan_state")
        self._donated = True
        return {"stack": self._stack, "n": self._n, "key": self._key,
                "it": jnp.asarray(iteration, jnp.int32)}

    def load_scan_state(self, rs) -> None:
        self._stack, self._n = rs["stack"], rs["n"]
        self._key = rs["key"]
        self._donated = False

    # --- persistence (same wire format as the host buffer) ---

    def state_dict(self) -> Optional[np.ndarray]:
        self._check_live("state_dict")
        if not self.cfg.persist:
            return np.zeros((0,) + self.batch_shape, np.float32)
        n = int(self._n)
        return np.asarray(self._stack[:n], np.float32)

    def load_state_dict(self, stacked, scale_matches: bool = True) -> int:
        if stacked is None or not scale_matches:
            self._n = jnp.zeros((), jnp.int32)
            return 0
        stacked = np.asarray(stacked, np.float32)
        if stacked.ndim != len(self.batch_shape) + 1 or \
                stacked.shape[1:] != self.batch_shape:
            self._n = jnp.zeros((), jnp.int32)
            return 0
        n = min(len(stacked), self.cfg.max_len)
        stack = np.zeros((max(self.cfg.max_len, 1),) + self.batch_shape,
                         np.float32)
        stack[:n] = stacked[:n]
        self._stack = jnp.asarray(stack, jnp.bfloat16)
        self._n = jnp.asarray(n, jnp.int32)
        return n
