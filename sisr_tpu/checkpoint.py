"""Checkpointing + pytree surgery (the transplant API).

Checkpoint layout mirrors the reference's single-file dict
{epoch, net_g, net_d, opti_g, opti_d, dis_list} (reference utils.py:108-115),
with each network stored as {params, state} flat path->array maps. Filenames
are auto-numbered under write_root, skipping existing files
(reference utils.py:102-105) — minus the interactive y/n prompt.

The transplant API is the first-class replacement for the reference's
load_state_dict(strict=False) progressive-growth mechanism
(model_generator.py:65-84 prints transplant coverage; model_discriminator.py
:64-76 copies key-by-key with per-key try/except). Operating on path-flat
pytrees fixes the reference's known spectral-norm/strict=False bug
(config.py:62) by construction: SN (u, v) live in the state tree under the
same paths as their conv, so they transplant like any other leaf.
"""
from __future__ import annotations

import dataclasses
import io
import os
import pickle
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from sisr_tpu.nn.pytree import flatten_with_paths, unflatten_from_paths

FORMAT_VERSION = 1


# ---------------------------------------------------------------------------
# transplant (pytree surgery)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TransplantReport:
    """Coverage report matching the reference's diagnostics
    (model_generator.py:71-84)."""

    n_target_weights: int          # number of leaf arrays in target
    n_source_weights: int
    n_target_params: int           # total scalar count
    n_source_params: int
    n_copied_params: int
    missing: Tuple[str, ...]       # in target, not in source
    unused: Tuple[str, ...]        # in source, not in target
    mismatched: Tuple[str, ...]    # both present, shapes differ (skipped)

    @property
    def coverage(self) -> float:
        return self.n_copied_params / max(self.n_target_params, 1)

    def __str__(self) -> str:
        lines = [
            f"transplant coverage {100 * self.coverage:.1f}%"
            f"    ({self.n_copied_params * 1e-6:.2f} M)",
            f"  - architecture : {self.n_target_weights} weight sets"
            f" ({self.n_target_params * 1e-6:.2f} M)",
            f"  - checkpoint   : {self.n_source_weights} weight sets"
            f" ({self.n_source_params * 1e-6:.2f} M)",
            f"  - missing      : {len(self.missing)} {sorted(self.missing)}",
            f"  - unused       : {len(self.unused)} {sorted(self.unused)}",
        ]
        if self.mismatched:
            lines.append(f"  - shape-mismatch (skipped): {sorted(self.mismatched)}")
        return "\n".join(lines)


def _nelem(x) -> int:
    return int(np.prod(np.shape(x))) if np.ndim(x) else 1


def transplant(target, source, *, source_prefix: str = "",
               target_prefix: str = ""):
    """Copy every leaf whose path exists in both trees (with matching shape).

    `target_prefix` plants the source under a subtree of the target — e.g.
    target_prefix='base' grafts an x2 checkpoint into the prefix of a grown
    x4 net. `source_prefix` selects a subtree of the source. Returns
    (merged_tree, TransplantReport). Non-intersecting target leaves keep
    their current (e.g. freshly initialized) values — exactly
    load_state_dict(strict=False) semantics.
    """
    tflat = flatten_with_paths(target)
    sflat = flatten_with_paths(source)
    if source_prefix:
        pfx = source_prefix.rstrip("/") + "/"
        sflat = {k[len(pfx):]: v for k, v in sflat.items() if k.startswith(pfx)}
    if target_prefix:
        pfx = target_prefix.rstrip("/") + "/"
        sflat = {pfx + k: v for k, v in sflat.items()}

    merged = dict(tflat)
    copied = 0
    missing, unused, mismatched = [], [], []
    for path, leaf in tflat.items():
        if path not in sflat:
            missing.append(path)
            continue
        src = sflat[path]
        if np.shape(src) != np.shape(leaf):
            mismatched.append(path)
            continue
        merged[path] = jax.numpy.asarray(np.asarray(src), dtype=leaf.dtype) \
            if hasattr(leaf, "dtype") else src
        copied += _nelem(src)
    for path in sflat:
        if path not in tflat:
            unused.append(path)

    report = TransplantReport(
        n_target_weights=len(tflat), n_source_weights=len(sflat),
        n_target_params=sum(_nelem(v) for v in tflat.values()),
        n_source_params=sum(_nelem(v) for v in sflat.values()),
        n_copied_params=copied,
        missing=tuple(missing), unused=tuple(unused),
        mismatched=tuple(mismatched),
    )
    return unflatten_from_paths(merged), report


# ---------------------------------------------------------------------------
# serialization
# ---------------------------------------------------------------------------


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def pack_train_state(ts, epoch: int, scale_factor: int,
                     replay_stack: Optional[np.ndarray] = None) -> Dict:
    """Build the reference-shaped checkpoint payload
    (utils.py:108-115 keys, plus scale_factor for the replay restore gate
    config.py:323-331)."""
    return {
        "format_version": FORMAT_VERSION,
        "epoch": int(epoch),
        "scale_factor": int(scale_factor),
        "net_g": {"params": _to_numpy_tree(ts["params_g"]),
                  "state": _to_numpy_tree(ts["state_g"])},
        "net_d": {"params": _to_numpy_tree(ts["params_d"]),
                  "state": _to_numpy_tree(ts["state_d"])},
        "opti_g": _to_numpy_tree(ts["opt_g"]),
        "opti_d": _to_numpy_tree(ts["opt_d"]),
        "step": int(ts["step"]),
        "dis_list": replay_stack if replay_stack is not None else None,
    }


def next_write_path(write_root: str) -> str:
    """Auto-numbered collision-free filename (reference utils.py:102-105)."""
    os.makedirs(write_root, exist_ok=True)
    i = 0
    while True:
        path = os.path.join(write_root, str(i))
        if not os.path.exists(path) and not os.path.exists(path + ".mp4"):
            return path
        i += 1


def save_checkpoint(write_root: str, payload: Dict,
                    path: Optional[str] = None) -> str:
    """Serialize a payload; returns the written path."""
    if path is None:
        path = next_write_path(write_root)
    buf = io.BytesIO()
    pickle.dump(payload, buf, protocol=4)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Dict:
    """Returns the payload dict, or {} when unreadable (reference
    gen_checkpoint's failure-tolerant load, config.py:308-315)."""
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except OSError as e:
        print("checkpoint read failed:", e)
        return {}


def restore_train_state(ts, checkpoint: Dict, *, load_optimizers: bool = True,
                        verbose: bool = True):
    """Partial-restore `ts` from a checkpoint payload. Missing/mismatched
    leaves keep their initialized values; optimizer-state load failures fall
    back to fresh state (reference config.py:296-302). Returns
    (ts, {section: TransplantReport})."""
    if not checkpoint:
        return ts, {}
    reports = {}
    ts = dict(ts)
    for sec, (pkey, skey) in {"net_g": ("params_g", "state_g"),
                              "net_d": ("params_d", "state_d")}.items():
        if sec in checkpoint:
            ts[pkey], rp = transplant(ts[pkey], checkpoint[sec].get("params", {}))
            ts[skey], rs = transplant(ts[skey], checkpoint[sec].get("state", {}))
            reports[sec] = rp
            reports[sec + "/state"] = rs
            if verbose:
                print(f"[{sec}] {rp}")
    if load_optimizers:
        for key, sec in (("opt_g", "opti_g"), ("opt_d", "opti_d")):
            try:
                src = checkpoint.get(sec)
                if src is None:
                    continue
                merged, rep = transplant(ts[key], src)
                if rep.coverage == 1.0 and not rep.mismatched:
                    # optax states are NamedTuples: rebuild leaves in place
                    flat_new = flatten_with_paths(merged)
                    leaves, treedef = jax.tree_util.tree_flatten(ts[key])
                    flat_old = flatten_with_paths(ts[key])
                    order = list(flat_old.keys())
                    ts[key] = jax.tree_util.tree_unflatten(
                        treedef, [jax.numpy.asarray(flat_new[p]) for p in order])
                elif verbose:
                    print(f"optimizer {sec} restore skipped "
                          f"(coverage {rep.coverage:.2f})")
            except Exception as e:  # fresh optimizer on failure
                print(f"optimizer {sec} load failed: {e}")
    if "step" in checkpoint:
        ts["step"] = jax.numpy.asarray(checkpoint["step"], jax.numpy.int32)
    return ts, reports
