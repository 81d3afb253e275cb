"""One-time torchvision VGG19 -> npz weight port.

Usage:
  python tools/port_vgg_weights.py <vgg19.pth or torchvision cache> out.npz
  python tools/port_vgg_weights.py --from-torchvision out.npz   # downloads

Converts the `features` conv stack of torchvision's VGG19 into the HWIO npz
layout consumed by sisr_tpu.models.vgg.vgg_init (keys conv{i}_kernel/
conv{i}_bias in features order). Run this wherever torchvision + the
pretrained checkpoint are available; the training environment only needs
the npz (pass it via --vgg-weights / TrainConfig.vgg_weights).

The reference loads `torchvision.models.vgg19(pretrained=True)` directly at
runtime (reference model_content_extractor.py:43); this tool is the
offline-friendly equivalent.
"""
from __future__ import annotations

import sys

import numpy as np


def convert_state_dict(sd) -> dict:
    """torch state_dict (features.N.weight OIHW) -> npz dict (HWIO)."""
    out = {}
    idx = 0
    keys = sorted((k for k in sd if k.startswith("features.") and
                   k.endswith(".weight")),
                  key=lambda k: int(k.split(".")[1]))
    for k in keys:
        w = np.asarray(sd[k])
        if w.ndim != 4:
            continue  # classifier etc.
        b = np.asarray(sd[k.replace(".weight", ".bias")])
        out[f"conv{idx}_kernel"] = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        out[f"conv{idx}_bias"] = b
        idx += 1
    assert idx == 16, f"expected 16 convs in VGG19 features, got {idx}"
    return out


def main(argv):
    if len(argv) == 3 and argv[1] == "--from-torchvision":
        import torchvision
        sd = torchvision.models.vgg19(weights="IMAGENET1K_V1").state_dict()
        out_path = argv[2]
    elif len(argv) == 3:
        import torch
        sd = torch.load(argv[1], map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        out_path = argv[2]
    else:
        print(__doc__)
        return 1
    np.savez_compressed(out_path, **convert_state_dict(sd))
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
