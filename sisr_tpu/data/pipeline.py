"""Host-side input pipeline feeding the device.

Replaces the reference's torchvision datasets + DataLoader machinery
(reference config.py:202-277, utils.py:199-209) with a dependency-light
numpy/PIL pipeline:

- datasets return HR images as NHWC float32 in [-1, 1]
  (Resize -> ToTensor -> Normalize(.5,.5,.5) semantics, config.py:224-244);
- deterministic index-range splits replicate SamplerRange: with
  n = (len - batch_size) // 2, the supervised loader covers [0, 2n), the
  unsupervised DoubleLoader zips the disjoint halves [0, n) and [n, 2n)
  (config.py:248-269), and the held-out test batch is the *last*
  batch_size images (config.py:271-272);
- drop_last=True everywhere, like the reference;
- a background-thread prefetcher stands in for the reference's two
  dataloader worker subprocesses (config.py:251).

The synthetic dataset (procedural smooth textures, deterministic by index)
has no reference analog; it exists so tests and benchmarks run with zero
data dependencies.
"""
from __future__ import annotations

import os
import queue
import sys
import threading
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm"}


# ---------------------------------------------------------------------------
# datasets: __len__ + __getitem__ -> HWC float32 in [-1, 1]
# ---------------------------------------------------------------------------


class SyntheticDataset:
    """Procedural smooth random textures, deterministic per index."""

    # cap host memory spent on memoized images (fp32 HWC: a 128x128x3 image
    # is ~196 KB, so 8 GB holds ~43k images — past the cap, extra indices
    # regenerate each access instead of growing RSS unboundedly; regenerating
    # costs ~2.6 ms/image on this 1-core host, ~1 min/epoch at 22k misses).
    # SISR_SYNTH_CACHE_GB raises the cap for data-scaling runs whose working
    # set exceeds 8 GB (e.g. synthetic-len 131072 at 128x128 is ~26 GB).
    CACHE_BYTES_MAX = int(float(os.environ.get("SISR_SYNTH_CACHE_GB", "8")) * (1 << 30))

    def __init__(self, hr_size: Tuple[int, int, int], length: int = 512):
        self.c, self.h, self.w = hr_size
        self.length = length
        self._cache: dict = {}
        self._cache_max = max(
            1, self.CACHE_BYTES_MAX // (4 * self.c * self.h * self.w))

    def __len__(self):
        return self.length

    def __getitem__(self, i: int) -> np.ndarray:
        # memoize: procedural generation costs ~2.6 ms/image, which
        # dominates long training runs (deterministic per index)
        hit = self._cache.get(i)
        if hit is not None:
            return hit
        out = self._generate(i)
        if len(self._cache) < self._cache_max:
            self._cache[i] = out
        return out

    def _generate(self, i: int) -> np.ndarray:
        rng = np.random.default_rng(i)
        yy, xx = np.mgrid[0:self.h, 0:self.w].astype(np.float32)
        img = np.zeros((self.h, self.w, self.c), np.float32)
        # low-frequency gratings (base structure)
        for _ in range(4):
            fx, fy = rng.uniform(0.5, 6, 2)
            ph = rng.uniform(0, 2 * np.pi, self.c).astype(np.float32)
            amp = rng.uniform(0.2, 0.6)
            wave = np.sin(2 * np.pi * (fx * xx / self.w + fy * yy / self.h))
            img += amp * wave[..., None] * np.cos(ph)[None, None, :]
        # sharp-edged rectangles: high-frequency content that bicubic
        # upscaling blurs, so learned SR has something to win on
        for _ in range(8):
            y0, x0 = rng.integers(0, self.h - 2), rng.integers(0, self.w - 2)
            hh = int(rng.integers(2, max(3, self.h // 3)))
            ww = int(rng.integers(2, max(3, self.w // 3)))
            col = rng.uniform(-1.2, 1.2, self.c).astype(np.float32)
            img[y0:y0 + hh, x0:x0 + ww] += col
        img += rng.normal(0, 0.03, img.shape).astype(np.float32)
        return np.tanh(img).astype(np.float32)


class ImageFolderDataset:
    """Recursive image-folder reader (reference dset.ImageFolder semantics:
    sorted file order, any class subdirectories)."""

    def __init__(self, root: str, hr_size: Tuple[int, int, int]):
        from PIL import Image  # noqa: F401  (import check)
        self.root = root
        self.c, self.h, self.w = hr_size
        files = []
        for dirpath, _, names in sorted(os.walk(root)):
            for n in sorted(names):
                if os.path.splitext(n)[1].lower() in IMG_EXTS:
                    files.append(os.path.join(dirpath, n))
        if not files:
            raise FileNotFoundError(f"no images under {root}")
        self.files = files

    def __len__(self):
        return len(self.files)

    def getitem_uint8(self, i: int) -> np.ndarray:
        """The post-resize uint8 image the fp32 path normalizes — the
        uint8-transport unit (ops.resize.device_normalize applies the
        identical /255*2-1 on device)."""
        from PIL import Image
        img = Image.open(self.files[i])
        img = img.convert("RGB" if self.c == 3 else "L")
        # torchvision Resize((h, w)) default = bilinear (config.py:226)
        img = img.resize((self.w, self.h), Image.BILINEAR)
        arr = np.asarray(img, np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr

    def __getitem__(self, i: int) -> np.ndarray:
        arr = self.getitem_uint8(i).astype(np.float32) / 255.0
        return arr * 2.0 - 1.0  # Normalize(.5, .5) => [-1, 1]


class MNISTDataset:
    """MNIST from the standard idx files (train images), resized if needed
    (reference config.py:236-243)."""

    def __init__(self, root: str, hr_size: Tuple[int, int, int]):
        import gzip
        self.c, self.h, self.w = hr_size
        path = None
        for cand in ("train-images-idx3-ubyte", "train-images.idx3-ubyte",
                     "MNIST/raw/train-images-idx3-ubyte"):
            p = os.path.join(root, cand)
            if os.path.exists(p) or os.path.exists(p + ".gz"):
                path = p
                break
        if path is None:
            raise FileNotFoundError(f"no MNIST idx files under {root}")
        opener = (lambda p: gzip.open(p + ".gz", "rb")) \
            if not os.path.exists(path) else (lambda p: open(p, "rb"))
        with opener(path) as f:
            data = f.read()
        n = int.from_bytes(data[4:8], "big")
        h = int.from_bytes(data[8:12], "big")
        w = int.from_bytes(data[12:16], "big")
        self.images = np.frombuffer(data, np.uint8, n * h * w, 16).reshape(n, h, w)
        self.native_hw = (h, w)

    def __len__(self):
        return len(self.images)

    def getitem_uint8(self, i: int) -> np.ndarray:
        """Post-resize uint8 plane (the uint8-transport unit; the fp32
        round-trip below reproduces the historical resize input exactly:
        u8 -> f32/255 -> *255 -> u8 is the identity on exact values)."""
        arr = self.images[i]
        if (self.h, self.w) != self.native_hw:
            from PIL import Image
            a = (arr.astype(np.float32) / 255.0 * 255).astype(np.uint8)
            img = Image.fromarray(a)
            arr = np.asarray(img.resize((self.w, self.h), Image.BILINEAR),
                             np.uint8)
        return arr[:, :, None]

    def __getitem__(self, i: int) -> np.ndarray:
        u8 = self.getitem_uint8(i)
        return (u8.astype(np.float32) / 255.0 * 2.0 - 1.0)


class DihedralAugmentedDataset:
    """Opt-in 8x dihedral augmentation (4 rotations x mirror) for small
    datasets — no reference analog (the reference pipeline is
    Resize->ToTensor->Normalize only, config.py:224-244).

    Leak-free split layout: the last `reserve_last` base images are NOT
    augmented and sit at the END of the index space, so the reference's
    held-out-last-batch split (config.py:271-272) tests the same
    untouched images as an unaugmented run — augmented views of test
    images never enter the training range. Requires square images
    (rotations preserve shape)."""

    def __init__(self, base, reserve_last: int):
        self.base = base
        self.reserve = int(reserve_last)
        self.n_aug = len(base) - self.reserve
        if self.n_aug <= 0:
            raise ValueError("reserve_last >= len(base)")
        h, w = base[0].shape[:2]
        if h != w:
            raise ValueError("dihedral augmentation needs square images")

    def __len__(self):
        return 8 * self.n_aug + self.reserve

    def __getitem__(self, i: int) -> np.ndarray:
        if i >= 8 * self.n_aug:  # the untouched held-out tail
            return self.base[self.n_aug + (i - 8 * self.n_aug)]
        t, j = divmod(i, self.n_aug)
        img = self.base[j]
        if t % 4:
            img = np.rot90(img, k=t % 4, axes=(0, 1))
        if t >= 4:
            img = img[:, ::-1]
        return np.ascontiguousarray(img)


def make_dataset(name: str, root: Optional[str], hr_size: Tuple[int, int, int],
                 synthetic_len: int = 512):
    if name == "synthetic" or root is None:
        if name not in ("synthetic",) and root is None:
            # stderr: stdout may be a machine-read stream (eval_quality
            # pipes JSONL rows through tee into eval_r*.jsonl)
            print(f"[data] no data_root for '{name}' — using synthetic stand-in",
                  file=sys.stderr)
        # Native (C++) generator when buildable: bit-identical pixel stream
        # (self-checked at load), with a batched fast path; transparently
        # degrades to the pure-Python generator otherwise.
        from sisr_tpu.data.native_loader import NativeSyntheticDataset
        return NativeSyntheticDataset(hr_size, synthetic_len)
    if name == "mnist":
        return MNISTDataset(root, hr_size)
    return ImageFolderDataset(root, hr_size)


# ---------------------------------------------------------------------------
# loaders
# ---------------------------------------------------------------------------


class BatchLoader:
    """Sequential index-range loader with drop_last and thread prefetch."""

    def __init__(self, dataset, indices: Sequence[int], batch_size: int,
                 prefetch: int = 2):
        self.dataset = dataset
        self.indices = list(indices)
        self.batch_size = batch_size
        self.prefetch = prefetch

    def __len__(self):
        return len(self.indices) // self.batch_size  # drop_last=True

    def _produce(self, q: "queue.Queue"):
        # an exception here must reach the consumer: if the producer died
        # silently, __iter__ would block on q.get() forever
        try:
            n = len(self)
            batched = getattr(self.dataset, "batch", None)
            for b in range(n):
                idx = self.indices[b * self.batch_size:
                                   (b + 1) * self.batch_size]
                if batched is not None:
                    batch = batched(idx)
                else:
                    batch = np.stack([self.dataset[i] for i in idx])
                q.put(batch)
            q.put(None)
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            q.put(e)

    def __iter__(self) -> Iterator[np.ndarray]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


class DoubleLoader:
    """Zips two loaders over disjoint halves (reference DoubleDataloader,
    config.py:254-260)."""

    def __init__(self, l1: BatchLoader, l2: BatchLoader):
        assert len(l1) == len(l2)
        self.l1, self.l2 = l1, l2

    def __len__(self):
        return len(self.l1)

    def __iter__(self):
        return zip(self.l1, self.l2)


class _IndexDataset:
    """Dataset of its own indices: item i is np.int32(i). BatchLoader over
    this yields (B,) int32 index batches — the transport unit of the
    device-resident corpus mode (cfg.device_data)."""

    def __init__(self, n: int):
        self.n = int(n)

    def __len__(self):
        return self.n

    def __getitem__(self, i: int) -> np.ndarray:
        return np.int32(i)


class _Uint8View:
    """Index-parallel uint8 view of a dataset exposing getitem_uint8():
    same __len__ and index space, items are the raw post-resize uint8
    arrays the fp32 __getitem__ normalizes. Batches built from this view
    upload 4x less h2d than fp32 and are normalized on device
    (ops.resize.device_normalize — the identical /255*2-1 expression)."""

    def __init__(self, base):
        self.base = base

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i: int) -> np.ndarray:
        return self.base.getitem_uint8(i)


def build_data(cfg, synthetic_len: int = 512):
    """Full reference gen_dataset flow (config.py:202-277). Returns
    (loader, (test_hr, test_lr), n_batch) where loader yields
    (hr, hr_d) pairs — identical arrays in supervised mode."""
    from sisr_tpu.ops.resize import lr_from_hr
    import jax.numpy as jnp

    hr_s, lr_s = cfg.geometry()
    ds = make_dataset(cfg.dataset, cfg.data_root, hr_s, synthetic_len)

    # uint8 transport (cfg.uint8_transport): the TRAIN loaders read a
    # parallel uint8 view of the same dataset (identical index space);
    # the test batch below stays host-normalized fp32. The step functions
    # normalize uint8 batches on device (ops.resize.device_normalize).
    u8 = None
    if getattr(cfg, "uint8_transport", False):
        if hasattr(ds, "getitem_uint8"):
            u8 = _Uint8View(ds)
        else:
            print("[data] uint8_transport: dataset has no uint8 source "
                  "(procedural fp32) — falling back to fp32 transport",
                  file=sys.stderr)

    if getattr(cfg, "augment_dihedral", False):
        ds = DihedralAugmentedDataset(ds, reserve_last=cfg.batch_size)
        if u8 is not None:
            u8 = DihedralAugmentedDataset(u8, reserve_last=cfg.batch_size)
    train_ds = u8 if u8 is not None else ds
    assert len(train_ds) == len(ds), "uint8 view index space diverged"
    n = (len(ds) - cfg.batch_size) // 2
    if n < cfg.batch_size // 2:
        raise ValueError(f"dataset too small: {len(ds)}")

    # device-resident corpus (cfg.device_data): materialize the TRAIN range
    # [0, 2n) once; loaders then yield (B,) int32 index batches and the
    # step gathers the batch from HBM (train/step.py data_dev) — steady-
    # state h2d drops from the full batch to 4 bytes/image. Composes with
    # uint8_transport (the corpus itself is then uint8, 4x less HBM).
    corpus = None
    if getattr(cfg, "device_data", False):
        batched = getattr(train_ds, "batch", None)
        idx = list(range(2 * n))
        corpus = batched(idx) if batched is not None \
            else np.stack([train_ds[i] for i in idx])
        print(f"[data] device-resident corpus: {2 * n} images, "
              f"{corpus.nbytes / 1e6:.0f} MB ({corpus.dtype}) — loaders "
              "yield index batches", file=sys.stderr)
        train_ds = _IndexDataset(2 * n)

    if not cfg.content_loss_on_lr:
        base = BatchLoader(train_ds, range(0, 2 * n), cfg.batch_size)
        loader = _Paired(base)
        size = len(base)
    else:
        l1 = BatchLoader(train_ds, range(0, n), cfg.batch_size)
        l2 = BatchLoader(train_ds, range(n, 2 * n), cfg.batch_size)
        loader = DoubleLoader(l1, l2)
        size = len(l1)
    loader.device_corpus = corpus  # None unless cfg.device_data

    test_hr = np.stack([ds[i] for i in range(len(ds) - cfg.batch_size, len(ds))])
    test_lr = np.asarray(lr_from_hr(jnp.asarray(test_hr), (lr_s[1], lr_s[2])))

    if cfg.n_batch != -1:
        size = min(size, cfg.n_batch)
    return loader, (test_hr, test_lr), size


class _Paired:
    """Supervised mode: yields (hr, hr) so the step signature is uniform."""

    def __init__(self, loader: BatchLoader):
        self.loader = loader

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for b in self.loader:
            yield b, b
