"""Experience replay of old generated batches — host-resident ring buffer.

Reference semantics (config.py:48-54, train.py:59-71,144-166):
- up to `max_len` (1000) detached fake batches stored, one every `save_freq`
  iterations, with random-overwrite eviction when full;
- per D update, `int(len * sample_ratio)` batches drawn without replacement
  and each contributes a full (summed, not averaged) BCE term;
- optionally CPU-offloaded (`dis_list_old_cpu`) and persisted in checkpoints
  (`dis_list_old_save`), restored only when the scale matches
  (config.py:323-331).

TPU design: the buffer lives in host numpy (the offload mode is the only
mode — HBM is for the models); sampling returns a *fixed-shape* stacked
array of `max_samples` slots plus a live-slot mask so the jitted train step
stays shape-static (SURVEY.md §7 'jit-static experience replay'). A
host->device transfer of the sampled slice per step replaces the reference's
per-fake `.to(device)` dance.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from sisr_tpu.config import ReplayConfig


class ReplayBuffer:
    def __init__(self, cfg: ReplayConfig, batch_shape: Tuple[int, ...],
                 seed: int = 0):
        self.cfg = cfg
        self.batch_shape = tuple(batch_shape)  # (B, H, W, C) of one fake batch
        self._items: list[np.ndarray] = []
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self._items)

    def maybe_store(self, iteration: int, fake: np.ndarray) -> None:
        """Store `fake` every cfg.save_freq iterations; random-overwrite when
        full (reference train.py:66-71)."""
        if iteration % self.cfg.save_freq != 0:
            return
        fake = np.asarray(fake, np.float32)
        if fake.shape != self.batch_shape:
            raise ValueError(f"fake shape {fake.shape} != {self.batch_shape}")
        if len(self._items) == self.cfg.max_len:
            self._items[int(self._rng.integers(0, self.cfg.max_len))] = fake
        else:
            self._items.append(fake)

    def sample(self) -> Tuple[np.ndarray, np.ndarray]:
        """(stack, mask): stack is (max_samples, B, H, W, C); mask (max_samples,)
        float 1.0 for live slots. Number of live slots is
        int(len * sample_ratio), drawn without replacement
        (reference train.py:145-146)."""
        r = self.cfg.max_samples
        stack = np.zeros((r,) + self.batch_shape, np.float32)
        mask = np.zeros((r,), np.float32)
        k = int(len(self._items) * self.cfg.sample_ratio)
        if k > 0:
            idx = self._rng.choice(len(self._items), size=min(k, r), replace=False)
            for slot, i in enumerate(idx):
                stack[slot] = self._items[int(i)]
                mask[slot] = 1.0
        return stack, mask

    # --- persistence (checkpoint field 'dis_list', reference utils.py:113) ---

    def state_dict(self) -> Optional[np.ndarray]:
        if not self.cfg.persist or not self._items:
            return np.zeros((0,) + self.batch_shape, np.float32)
        return np.stack(self._items)

    def load_state_dict(self, stacked: Optional[np.ndarray],
                        scale_matches: bool = True) -> int:
        """Restore; refused when the generated-image scale differs
        (reference config.py:323-331). Returns number restored."""
        if stacked is None or not scale_matches:
            self._items = []
            return 0
        stacked = np.asarray(stacked, np.float32)
        if stacked.ndim != len(self.batch_shape) + 1 or stacked.shape[1:] != self.batch_shape:
            self._items = []
            return 0
        self._items = [stacked[i] for i in range(min(len(stacked), self.cfg.max_len))]
        return len(self._items)
