"""File-based dataset readers: image folders (reference dset.ImageFolder via
config.py:224-234) and MNIST idx files (config.py:236-243).

The quality/CLI paths exercised elsewhere all use the synthetic dataset;
these tests cover the real-file loaders: recursive sorted traversal, PIL
conversion, bilinear geometry resize, and [-1,1] normalization.
"""
import gzip
import os

import numpy as np
import pytest
from PIL import Image

from sisr_tpu.data.pipeline import (ImageFolderDataset, MNISTDataset,
                                    make_dataset)


def _write_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture()
def image_root(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "photos"
    # two class subdirs + one root-level file, deliberately unsorted names
    _write_png(str(root / "b_class" / "img2.png"),
               rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    _write_png(str(root / "a_class" / "img1.png"),
               rng.integers(0, 255, (40, 80, 3), dtype=np.uint8))  # non-square
    _write_png(str(root / "a_class" / "gray.png"),
               rng.integers(0, 255, (64, 64), dtype=np.uint8))     # grayscale
    (root / "a_class" / "notes.txt").write_text("ignored")
    return str(root)


def test_imagefolder_sorted_recursive_order(image_root):
    ds = ImageFolderDataset(image_root, (3, 64, 64))
    names = [os.path.relpath(f, image_root) for f in ds.files]
    assert names == [os.path.join("a_class", "gray.png"),
                     os.path.join("a_class", "img1.png"),
                     os.path.join("b_class", "img2.png")]


def test_imagefolder_shapes_range_and_modes(image_root):
    ds = ImageFolderDataset(image_root, (3, 64, 64))
    for i in range(len(ds)):
        x = ds[i]
        assert x.shape == (64, 64, 3)          # HWC, resized
        assert x.dtype == np.float32
        assert x.min() >= -1.0 and x.max() <= 1.0
    # grayscale source expands to 3 identical channels via RGB convert
    g = ds[0]
    assert np.allclose(g[..., 0], g[..., 1]) and np.allclose(g[..., 1], g[..., 2])


def test_imagefolder_bilinear_resize_matches_pil(image_root):
    ds = ImageFolderDataset(image_root, (3, 32, 32))
    img = Image.open(ds.files[1]).convert("RGB").resize((32, 32), Image.BILINEAR)
    want = np.asarray(img, np.float32) / 255.0 * 2.0 - 1.0
    np.testing.assert_allclose(ds[1], want, atol=1e-6)


def test_imagefolder_single_channel_mode(image_root):
    ds = ImageFolderDataset(image_root, (1, 64, 64))
    assert ds[1].shape == (64, 64, 1)


def test_imagefolder_empty_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ImageFolderDataset(str(tmp_path), (3, 64, 64))


def _write_idx(path, images, gz=False):
    n, h, w = images.shape
    header = (2051).to_bytes(4, "big") + n.to_bytes(4, "big") \
        + h.to_bytes(4, "big") + w.to_bytes(4, "big")
    data = header + images.tobytes()
    if gz:
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)


@pytest.mark.parametrize("gz", [False, True])
def test_mnist_idx_reader(tmp_path, gz):
    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (5, 28, 28), dtype=np.uint8)
    name = "train-images-idx3-ubyte"
    _write_idx(str(tmp_path / (name + (".gz" if gz else ""))), images, gz=gz)
    ds = MNISTDataset(str(tmp_path), (1, 28, 28))
    assert len(ds) == 5
    x = ds[3]
    assert x.shape == (28, 28, 1) and x.dtype == np.float32
    np.testing.assert_allclose(
        x[..., 0], images[3].astype(np.float32) / 255.0 * 2.0 - 1.0, atol=1e-6)


def test_mnist_resize_to_geometry(tmp_path):
    images = np.zeros((2, 28, 28), dtype=np.uint8)
    images[:, ::2, :] = 255
    _write_idx(str(tmp_path / "train-images-idx3-ubyte"), images)
    ds = MNISTDataset(str(tmp_path), (1, 14, 14))
    assert ds[0].shape == (14, 14, 1)


def test_make_dataset_dispatch(tmp_path, image_root):
    synth_names = ("SyntheticDataset", "NativeSyntheticDataset")
    assert type(make_dataset("synthetic", None, (3, 64, 64))).__name__ \
        in synth_names
    # no root => synthetic stand-in with a notice (reference has no such
    # mode; this keeps the CLI runnable without data)
    assert type(make_dataset("celeba", None, (3, 64, 64))).__name__ \
        in synth_names
    assert isinstance(make_dataset("celeba", image_root, (3, 64, 64)),
                      ImageFolderDataset)


# ---------------------------------------------------------------------------
# dihedral augmentation (opt-in, no reference analog)
# ---------------------------------------------------------------------------


def test_dihedral_augmentation_layout_and_transforms():
    from sisr_tpu.data.pipeline import (DihedralAugmentedDataset,
                                        SyntheticDataset)

    base = SyntheticDataset((3, 16, 16), 20)
    aug = DihedralAugmentedDataset(base, reserve_last=4)
    n_aug = 16
    assert len(aug) == 8 * n_aug + 4

    # the reserved tail is the base's last images, untouched — the
    # held-out-last-batch split tests the same images as an unaugmented run
    for k in range(4):
        np.testing.assert_array_equal(aug[8 * n_aug + k], base[n_aug + k])

    # transform block t applies rot90^t (t<4) and mirror for t>=4
    j = 3
    np.testing.assert_array_equal(aug[j], base[j])
    np.testing.assert_array_equal(aug[n_aug + j],
                                  np.rot90(base[j], 1, axes=(0, 1)))
    np.testing.assert_array_equal(aug[4 * n_aug + j], base[j][:, ::-1])
    np.testing.assert_array_equal(
        aug[7 * n_aug + j], np.rot90(base[j], 3, axes=(0, 1))[:, ::-1])

    # all 8 views of one image are distinct for generic content
    views = {aug[t * n_aug + j].tobytes() for t in range(8)}
    assert len(views) == 8


def test_dihedral_augmentation_through_build_data():
    import dataclasses
    from sisr_tpu.config import preset_x2_mse
    from sisr_tpu.data.pipeline import build_data

    cfg = dataclasses.replace(preset_x2_mse("celeba"), dataset="synthetic",
                              batch_size=4, augment_dihedral=True)
    loader, (test_hr, _), n_batch = build_data(cfg, synthetic_len=20)
    # (8*16 + 4 - 4) // 2 = 64 -> 2n = 128 train images, 32 batches of 4
    assert n_batch == 32
    plain = dataclasses.replace(cfg, augment_dihedral=False)
    _, (test_hr_plain, _), _ = build_data(plain, synthetic_len=20)
    np.testing.assert_array_equal(test_hr, test_hr_plain)


# ---------------------------------------------------------------------------
# uint8 transport (opt-in: raw uint8 h2d + on-device normalization)
# ---------------------------------------------------------------------------


def test_uint8_view_matches_fp32_normalization(image_root, tmp_path):
    """device_normalize(getitem_uint8(i)) must reproduce __getitem__(i):
    the on-device /255*2-1 is the host pipeline's exact expression."""
    import jax.numpy as jnp
    from sisr_tpu.ops.resize import device_normalize

    folder = ImageFolderDataset(image_root, (3, 32, 32))
    images = np.random.default_rng(2).integers(0, 255, (4, 28, 28),
                                               dtype=np.uint8)
    _write_idx(str(tmp_path / "train-images-idx3-ubyte"), images)
    mnist = MNISTDataset(str(tmp_path), (1, 14, 14))  # exercises the resize

    for ds in (folder, mnist):
        for i in range(len(ds)):
            u8 = ds.getitem_uint8(i)
            assert u8.dtype == np.uint8 and u8.ndim == 3
            got = np.asarray(device_normalize(jnp.asarray(u8)))
            np.testing.assert_allclose(got, ds[i], atol=1e-6)
    # float inputs pass through untouched (already normalized)
    x = jnp.asarray(np.linspace(-1, 1, 8, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(device_normalize(x)),
                                  np.asarray(x))


def test_uint8_transport_through_build_data(image_root):
    """With uint8_transport=True the TRAIN loader yields uint8 batches over
    the same index space; the held-out test batch stays host-normalized
    fp32; batch values normalize to exactly the fp32-transport batches."""
    import dataclasses
    import jax.numpy as jnp
    from sisr_tpu.config import preset_x2_mse
    from sisr_tpu.data.pipeline import build_data
    from sisr_tpu.ops.resize import device_normalize

    # grow the folder so the split has room (needs len > batch_size + 1)
    rng = np.random.default_rng(3)
    for k in range(6):
        _write_png(os.path.join(image_root, "c_class", f"x{k}.png"),
                   rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))

    base = dataclasses.replace(preset_x2_mse("celeba"), data_root=image_root,
                               batch_size=2)
    u8cfg = dataclasses.replace(base, uint8_transport=True)
    loader8, (test_hr8, test_lr8), n8 = build_data(u8cfg)
    loader32, (test_hr, test_lr), n32 = build_data(base)
    assert n8 == n32
    assert test_hr8.dtype == np.float32
    np.testing.assert_array_equal(test_hr8, test_hr)

    for (h8, hd8), (h32, hd32) in zip(loader8, loader32):
        assert h8.dtype == np.uint8 and hd8.dtype == np.uint8
        np.testing.assert_allclose(
            np.asarray(device_normalize(jnp.asarray(h8))), h32, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(device_normalize(jnp.asarray(hd8))), hd32, atol=1e-6)


def test_uint8_transport_synthetic_falls_back_to_fp32():
    import dataclasses
    from sisr_tpu.config import preset_x2_mse
    from sisr_tpu.data.pipeline import build_data

    cfg = dataclasses.replace(preset_x2_mse("celeba"), dataset="synthetic",
                              batch_size=4, uint8_transport=True)
    loader, _, _ = build_data(cfg, synthetic_len=20)
    hr, _ = next(iter(loader))
    assert hr.dtype == np.float32  # procedural data has no uint8 source


def test_dihedral_augmentation_rejects_non_square():
    from sisr_tpu.data.pipeline import DihedralAugmentedDataset

    class Rect:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return np.zeros((8, 12, 3), np.float32)

    with pytest.raises(ValueError):
        DihedralAugmentedDataset(Rect(), reserve_last=2)
