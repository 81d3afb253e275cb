"""Slim a training checkpoint for git persistence across VM resets.

Round-3 lesson: quality_runs/*/0 checkpoints are gitignored (477 MB GAN
states), so the round-2 foundation (x2 base, x4_v3, x8_v2) vanished with
the VM — every continuation leg in the armed on-chip queue then had no
base to resume from. This tool strips a checkpoint to what a *future
round* actually needs to continue the pipeline:

  - net_g / net_d params + state (BN stats, SN vectors): kept, fp32
  - opti_g / opti_d Adam moments: dropped (a finetune restarting the
    optimizer matches the reference's per-run LambdaLR rebuild anyway)
  - dis_list replay ring: dropped (the reference only restores it when
    scale_factor matches, and it refills in max_len steps)

Result is ~10-30 MB — committable. load_checkpoint/restore_train_state
already handle the missing sections (fresh-optimizer fallback, reference
config.py:296-302), so a slim checkpoint is a valid --checkpoint input.

Usage: python tools/slim_ckpt.py quality_runs/x2/0 quality_runs/keep/x2.ckpt
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sisr_tpu.checkpoint import load_checkpoint, save_checkpoint  # noqa: E402


def slim(src: str, dst: str) -> str:
    payload = load_checkpoint(src)
    if not payload:
        raise SystemExit(f"unreadable checkpoint: {src}")
    slim_payload = {k: payload[k] for k in
                    ("format_version", "epoch", "scale_factor",
                     "net_g", "net_d", "step") if k in payload}
    slim_payload["dis_list"] = None
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    save_checkpoint(os.path.dirname(dst) or ".", slim_payload, path=dst)
    print(f"{src} -> {dst}: {os.path.getsize(dst)/1e6:.1f} MB "
          f"(epoch {slim_payload.get('epoch')}, "
          f"scale x{slim_payload.get('scale_factor')})")
    return dst


if __name__ == "__main__":
    slim(sys.argv[1], sys.argv[2])
