"""Visualization + monitoring: image grids, loss curves, LR/SR/HR/USR
panels, and the training animation.

Capability parity with reference utils.py:50-196 (save_curr_vis, _plot,
_anim) and visualisation.py's comparison figures — non-interactively: every
figure is written to disk (matplotlib Agg), with the reference's pickle
fallbacks kept for environments where even that fails.
"""
from __future__ import annotations

import pickle
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _normalize(img: np.ndarray) -> np.ndarray:
    """Per-grid min-max normalize to [0,1] (torchvision make_grid
    normalize=True semantics, reference utils.py:58-62)."""
    lo, hi = float(img.min()), float(img.max())
    return (img - lo) / max(hi - lo, 1e-5)


def make_grid(images: np.ndarray, nrow: int = 2, padding: int = 0,
              normalize: bool = True) -> np.ndarray:
    """NHWC batch -> single HWC grid image, row-major, nrow images/row."""
    n, h, w, c = images.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((nrows * (h + padding), ncol * (w + padding), c),
                    np.float32)
    img = _normalize(images) if normalize else images
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[r * (h + padding):r * (h + padding) + h,
             col * (w + padding):col * (w + padding) + w] = img[i]
    return grid


def _imshowable(img: np.ndarray) -> np.ndarray:
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return np.clip(img, 0, 1)


def save_loss_curves(losses: dict, path: str) -> Optional[str]:
    """Loss curves figure (reference _plot first figure, utils.py:125-133);
    pickle fallback `<path>.loss` on failure (utils.py:165-171)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(10, 5))
        plt.title("Generator and Discriminator Loss During Training")
        plt.plot(losses.get("G", []), label="G")
        plt.plot(losses.get("D", []), label="D")
        plt.plot(losses.get("cont", []), label="cont")
        plt.xlabel("iterations")
        plt.ylabel("Loss")
        plt.legend()
        out = path + "_loss.png"
        plt.savefig(out, dpi=100, bbox_inches="tight")
        plt.close()
        return out
    except Exception as e:
        print("loss plot failed", e)
        with open(path + ".loss", "wb") as f:
            pickle.dump(losses, f)
        return None


def save_quad_panel(test_lr: np.ndarray, test_hr: np.ndarray,
                    img_list: Sequence[Tuple[np.ndarray, ...]],
                    path: str) -> Optional[str]:
    """2x2 LR / SR / HR / USR figure (reference _plot, utils.py:135-163)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(8, 8))
        titles_imgs = [
            ("LR Images", make_grid(test_lr[:4])),
            ("SR Images", _normalize(make_grid(img_list[-1][0], normalize=False))),
            ("HR Images", make_grid(test_hr[:4])),
        ]
        if len(img_list[-1]) == 2:
            titles_imgs.append(
                ("USR Images", _normalize(make_grid(img_list[-1][1],
                                                    normalize=False))))
        pos = {0: 1, 1: 2, 2: 3, 3: 4}
        for i, (title, img) in enumerate(titles_imgs):
            plt.subplot(2, 2, pos[i])
            plt.axis("off")
            plt.title(title)
            plt.imshow(_imshowable(img))
        out = path + "_panel.png"
        plt.savefig(out, dpi=100, bbox_inches="tight")
        plt.close()
        return out
    except Exception as e:
        print("panel plot failed", e)
        return None


def save_animation(img_list: Sequence[Tuple[np.ndarray, ...]],
                   path: str) -> Optional[str]:
    """Training-progress mp4 (reference _anim, utils.py:174-196); pickle
    fallback `<path>.list`."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.animation as animation
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(8, 8))
        plt.axis("off")
        ims = [[plt.imshow(_imshowable(make_grid(frame[0])), animated=True)]
               for frame in img_list]
        ani = animation.ArtistAnimation(fig, ims, interval=1000,
                                        repeat_delay=1000, blit=True)
        if "ffmpeg" in animation.writers.list():
            out = path + ".mp4"
            ani.save(out, writer=animation.writers["ffmpeg"](fps=10,
                                                             bitrate=1800))
        else:  # PillowWriter gif when ffmpeg is absent
            out = path + ".gif"
            ani.save(out, writer=animation.PillowWriter(fps=10))
        plt.close(fig)
        return out
    except Exception as e:
        print("animation failed", e)
        with open(path + ".list", "wb") as f:
            pickle.dump(list(img_list), f)
        return None


def save_comparison_figure(rows: List[Tuple[str, np.ndarray]], path: str,
                           upscale_to: Optional[Tuple[int, int]] = None):
    """visualisation.py-style figure: each named image rendered twice
    (nearest and bicubic upsampling to a common size) so interpolation
    artifacts are visible (reference visualisation.py:59-75)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        n = len(rows)
        target = upscale_to or rows[-1][1].shape[:2]
        plt.figure(figsize=(3 * n, 6))
        for j, (title, img) in enumerate(rows):
            img01 = _imshowable(_normalize(img))
            for r, interp in enumerate(("nearest", "bicubic")):
                plt.subplot(2, n, r * n + j + 1)
                plt.axis("off")
                if r == 0:
                    plt.title(title)
                plt.imshow(img01, interpolation=interp,
                           extent=(0, target[1], target[0], 0))
        out = path + ".png"
        plt.savefig(out, dpi=100, bbox_inches="tight")
        plt.close()
        return out
    except Exception as e:
        print("comparison figure failed", e)
        return None
