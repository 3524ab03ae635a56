"""Dataset ingestion tests: native CIFAR pickle parsing against generated
archives, registry behavior, ImageNet folder validation."""

import os
import pickle

import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.data.datasets import (
    get_dataset,
    load_cifar10,
    load_cifar100,
    load_synthetic,
)


def _write_cifar10(tmp_path):
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rng = np.random.default_rng(0)
    all_x, all_y = [], []
    for b in range(1, 6):
        x = rng.integers(0, 256, size=(20, 3072), dtype=np.uint8)
        y = rng.integers(0, 10, size=(20,)).tolist()
        with open(base / f"data_batch_{b}", "wb") as f:
            pickle.dump({b"data": x, b"labels": y}, f)
        all_x.append(x)
        all_y.extend(y)
    xt = rng.integers(0, 256, size=(30, 3072), dtype=np.uint8)
    yt = rng.integers(0, 10, size=(30,)).tolist()
    with open(base / "test_batch", "wb") as f:
        pickle.dump({b"data": xt, b"labels": yt}, f)
    return np.concatenate(all_x), np.asarray(all_y), xt, np.asarray(yt)


def test_cifar10_native_parsing(tmp_path):
    raw_x, raw_y, raw_xt, raw_yt = _write_cifar10(tmp_path)
    tr = load_cifar10(str(tmp_path), train=True, download=False)
    te = load_cifar10(str(tmp_path), train=False, download=False)
    assert len(tr) == 100 and len(te) == 30
    assert tr.x.shape == (100, 32, 32, 3) and tr.x.dtype == np.uint8
    assert tr.num_classes == 10
    np.testing.assert_array_equal(tr.y, raw_y)
    # CHW-flat pickle rows -> NHWC: row layout is (3, 32, 32) C-major
    expected0 = raw_x[0].reshape(3, 32, 32).transpose(1, 2, 0)
    np.testing.assert_array_equal(tr.x[0], expected0)


def test_cifar100_native_parsing(tmp_path):
    base = tmp_path / "cifar-100-python"
    base.mkdir()
    rng = np.random.default_rng(1)
    for split, n in [("train", 40), ("test", 15)]:
        with open(base / split, "wb") as f:
            pickle.dump({
                b"data": rng.integers(0, 256, size=(n, 3072), dtype=np.uint8),
                b"fine_labels": rng.integers(0, 100, size=(n,)).tolist(),
            }, f)
    tr = load_cifar100(str(tmp_path), train=True, download=False)
    te = load_cifar100(str(tmp_path), train=False, download=False)
    assert len(tr) == 40 and len(te) == 15 and tr.num_classes == 100


def test_missing_data_raises_without_download(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_cifar10(str(tmp_path / "nope"), train=True, download=False)


def test_registry_dispatch(tmp_path):
    _write_cifar10(tmp_path)
    ds = get_dataset("CIFAR10", str(tmp_path), train=True, download=False)
    assert ds.name == "CIFAR10"
    syn = get_dataset("Synthetic", None, train=False)
    assert syn.name == "Synthetic"
    with pytest.raises(FileNotFoundError, match="folder-per-class"):
        get_dataset("ImageNet", str(tmp_path), train=True)


def _write_idx(path, arr):
    import struct

    with open(path, "wb") as f:
        f.write(bytes([0, 0, 0x08, arr.ndim]))
        for d in arr.shape:
            f.write(struct.pack(">i", d))
        f.write(arr.astype(np.uint8).tobytes())


def _write_mnist_like(tmp_path, subdir, n_train=12, n_test=5, gz=False):
    import gzip

    raw = tmp_path / subdir / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(3)
    out = {}
    for split, n in [("train", n_train), ("t10k", n_test)]:
        x = rng.integers(0, 256, size=(n, 28, 28), dtype=np.uint8)
        y = rng.integers(0, 10, size=(n,), dtype=np.uint8)
        _write_idx(raw / f"{split}-images-idx3-ubyte", x)
        _write_idx(raw / f"{split}-labels-idx1-ubyte", y)
        if gz:
            for f in raw.iterdir():
                if not f.name.endswith(".gz"):
                    (raw / (f.name + ".gz")).write_bytes(
                        gzip.compress(f.read_bytes()))
                    f.unlink()
        out[split] = (x, y)
    return out


@pytest.mark.parametrize("gz", [False, True])
def test_mnist_native_parsing(tmp_path, gz):
    from pytorch_ddp_resnet_tpu.data.datasets import load_mnist

    raw = _write_mnist_like(tmp_path, "MNIST", gz=gz)
    tr = load_mnist(str(tmp_path), train=True, download=False)
    te = load_mnist(str(tmp_path), train=False, download=False)
    assert tr.x.shape == (12, 28, 28, 1) and te.x.shape == (5, 28, 28, 1)
    np.testing.assert_array_equal(tr.x[..., 0], raw["train"][0])
    np.testing.assert_array_equal(te.y, raw["t10k"][1])
    assert tr.num_classes == 10


def test_fashion_mnist_dispatch(tmp_path):
    _write_mnist_like(tmp_path, "FashionMNIST")
    ds = get_dataset("FashionMNIST", str(tmp_path), train=True,
                     download=False)
    assert ds.name == "FashionMNIST" and ds.data_shape == (28, 28, 1)


def test_kmnist_dispatch(tmp_path):
    raw = _write_mnist_like(tmp_path, "KMNIST")
    ds = get_dataset("KMNIST", str(tmp_path), train=False, download=False)
    assert ds.name == "KMNIST" and ds.data_shape == (28, 28, 1)
    np.testing.assert_array_equal(ds.x[..., 0], raw["t10k"][0])


def _write_idx_int(path, arr):
    import struct

    with open(path, "wb") as f:
        f.write(bytes([0, 0, 0x0C, arr.ndim]))
        for d in arr.shape:
            f.write(struct.pack(">i", d))
        f.write(arr.astype(">i4").tobytes())


def test_qmnist_native_parsing(tmp_path):
    from pytorch_ddp_resnet_tpu.data.datasets import load_qmnist

    raw = tmp_path / "QMNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(7)
    out = {}
    for split, n in [("qmnist-train", 11), ("qmnist-test", 6)]:
        x = rng.integers(0, 256, size=(n, 28, 28), dtype=np.uint8)
        # (N, 8) int32 records; class is column 0 (torchvision compat target)
        rec = rng.integers(0, 60000, size=(n, 8)).astype(np.int64)
        rec[:, 0] = rng.integers(0, 10, size=(n,))
        _write_idx(raw / f"{split}-images-idx3-ubyte", x)
        _write_idx_int(raw / f"{split}-labels-idx2-int", rec)
        out[split] = (x, rec)
    tr = load_qmnist(str(tmp_path), train=True, download=False)
    te = load_qmnist(str(tmp_path), train=False, download=False)
    assert tr.x.shape == (11, 28, 28, 1) and te.x.shape == (6, 28, 28, 1)
    np.testing.assert_array_equal(tr.x[..., 0], out["qmnist-train"][0])
    np.testing.assert_array_equal(te.y, out["qmnist-test"][1][:, 0])
    assert te.y.dtype == np.int32 and tr.num_classes == 10


def test_usps_native_parsing(tmp_path):
    import bz2

    from pytorch_ddp_resnet_tpu.data.datasets import load_usps

    rng = np.random.default_rng(9)
    n = 7
    vals = rng.uniform(-1, 1, size=(n, 256)).astype(np.float32)
    labels = rng.integers(1, 11, size=(n,))  # libsvm labels are 1..10
    lines = []
    for i in range(n):
        toks = [f"{labels[i]}"] + [
            f"{j + 1}:{vals[i, j]:.6f}" for j in range(256)]
        lines.append(" ".join(toks))
    with bz2.open(tmp_path / "usps.bz2", "wt") as f:
        f.write("\n".join(lines) + "\n")
    ds = load_usps(str(tmp_path), train=True, download=False)
    assert ds.x.shape == (n, 16, 16, 1) and ds.num_classes == 10
    np.testing.assert_array_equal(ds.y, labels - 1)
    want = ((np.round(vals, 6).reshape(n, 16, 16, 1) + 1) / 2 * 255
            ).astype(np.uint8)
    np.testing.assert_array_equal(ds.x, want)
    # dispatch + missing-test-file behavior
    ds2 = get_dataset("USPS", str(tmp_path), train=True, download=False)
    assert ds2.name == "USPS"
    with pytest.raises(FileNotFoundError):
        load_usps(str(tmp_path), train=False, download=False)


def test_svhn_native_parsing(tmp_path):
    from scipy.io import savemat

    from pytorch_ddp_resnet_tpu.data.datasets import load_svhn

    rng = np.random.default_rng(4)
    x = rng.integers(0, 256, size=(32, 32, 3, 9), dtype=np.uint8)
    y = np.array([10, 1, 2, 3, 4, 5, 10, 7, 8], np.uint8).reshape(-1, 1)
    savemat(tmp_path / "train_32x32.mat", {"X": x, "y": y})
    ds = load_svhn(str(tmp_path), train=True, download=False)
    assert ds.x.shape == (9, 32, 32, 3)
    np.testing.assert_array_equal(ds.x[2], x[..., 2])
    # torchvision's label remap: 10 -> 0
    np.testing.assert_array_equal(ds.y, [0, 1, 2, 3, 4, 5, 0, 7, 8])


def test_stl10_native_parsing(tmp_path):
    from pytorch_ddp_resnet_tpu.data.datasets import load_stl10

    base = tmp_path / "stl10_binary"
    base.mkdir()
    rng = np.random.default_rng(5)
    n = 4
    x = rng.integers(0, 256, size=(n, 3, 96, 96), dtype=np.uint8)
    y = rng.integers(1, 11, size=(n,), dtype=np.uint8)  # 1-indexed on disk
    (base / "test_X.bin").write_bytes(x.tobytes())
    (base / "test_y.bin").write_bytes(y.tobytes())
    ds = load_stl10(str(tmp_path), train=False, download=False)
    assert ds.x.shape == (n, 96, 96, 3)
    np.testing.assert_array_equal(ds.y, y.astype(np.int32) - 1)
    # column-major planes: disk (C, W, H) -> memory NHWC
    np.testing.assert_array_equal(ds.x[0, :, :, 0], x[0, 0].T)


def test_unknown_dataset_lists_alternatives():
    with pytest.raises(ValueError, match="MNIST"):
        get_dataset("NoSuchDataset", "/tmp", train=True)


def test_synthetic_determinism():
    a = load_synthetic(None, train=True)
    b = load_synthetic(None, train=True)
    np.testing.assert_array_equal(a.x, b.x)
    c = load_synthetic(None, train=False)
    assert not np.array_equal(a.x[: len(c.x)], c.x)


def test_synthetic_spectral_properties():
    from pytorch_ddp_resnet_tpu.data.datasets import load_synthetic_spectral

    tr = load_synthetic_spectral(None, True, n_train=2000, n_test=64)
    te = load_synthetic_spectral(None, False, n_train=2000, n_test=64)
    assert tr.x.shape == (2000, 32, 32, 3) and tr.num_classes == 10
    # deterministic and train/test disjoint draws
    tr2 = load_synthetic_spectral(None, True, n_train=2000, n_test=64)
    np.testing.assert_array_equal(tr.x, tr2.x)
    assert not np.array_equal(tr.x[:64], te.x)
    # per-sample contrast normalization: no energy shortcut between classes
    stds = tr.x.astype(np.float32).std(axis=(1, 2, 3))
    assert stds.std() / stds.mean() < 0.1
    # zero-mean textures: a linear probe on raw class-mean templates is
    # near chance (labels live in spectral shape, not pixel means)
    means = np.stack([tr.x[tr.y == k].astype(np.float32).mean(0)
                      for k in range(10)])
    spread = means.std(axis=0).mean() / tr.x.astype(np.float32).std()
    assert spread < 0.1, spread  # ~200/class: sampling noise alone is ~0.07


def test_synthetic_spectral_class_sep_knob():
    from pytorch_ddp_resnet_tpu.data.datasets import load_synthetic_spectral

    base = load_synthetic_spectral(None, True, n_train=512, n_test=64)
    same = load_synthetic_spectral(None, True, n_train=512, n_test=64,
                                   class_sep=1.0)
    # class_sep=1.0 is the identity: bit-for-bit the original dataset
    np.testing.assert_array_equal(base.x, same.x)

    hard = load_synthetic_spectral(None, True, n_train=512, n_test=64,
                                   class_sep=0.2)
    assert hard.x.shape == base.x.shape
    assert not np.array_equal(hard.x, base.x)
    # lower separation => class-conditional spectra are closer together:
    # measure mean pairwise distance between class-mean power spectra
    def class_spectral_spread(ds):
        xf = np.abs(np.fft.rfft2(
            ds.x.astype(np.float32).mean(-1), axes=(1, 2)))
        cm = np.stack([xf[ds.y == k].mean(0) for k in range(10)])
        return np.linalg.norm(cm[:, None] - cm[None, :], axis=(2, 3)).mean()

    assert class_spectral_spread(hard) < 0.5 * class_spectral_spread(base)


def test_dataset_args_flow_from_config(tmp_path):
    """The factory accepts the YAML dataset_args kwargs (algos/train.py
    setup() splats config['dataset_args'] into this call)."""
    from pytorch_ddp_resnet_tpu.data.datasets import get_dataset

    ds = get_dataset("SyntheticSpectral", str(tmp_path), train=True,
                     n_train=256, n_test=32, num_classes=4, class_sep=0.5)
    assert ds.num_classes == 4 and len(ds) == 256


# --- streaming image-file datasets (Imagenette / DTD / Flowers102 / FGVC) ----


def _save_jpg(path, size=(12, 10), seed=0):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 256, size=(size[1], size[0], 3),
                                 dtype=np.uint8)).save(path)


def test_imagenette_folder_parsing(tmp_path):
    from pytorch_ddp_resnet_tpu.data.datasets import load_imagenette

    wnids = ["n01440764", "n02102040", "n02979186"]
    for split, n in (("train", 4), ("val", 2)):
        for wnid in wnids:
            for i in range(n):
                _save_jpg(str(tmp_path / "imagenette2" / split / wnid /
                              f"{wnid}_{i}.JPEG"), seed=i)
    tr = load_imagenette(str(tmp_path), train=True, download=False)
    va = load_imagenette(str(tmp_path), train=False, download=False)
    assert len(tr) == 12 and len(va) == 6
    assert tr.num_classes == va.num_classes == 3
    # sorted-wnid class indexing, per-class path grouping
    assert [tr.labels[i] for i in (0, 4, 8)] == [0, 1, 2]
    assert all(os.path.exists(p) for p in tr.paths)
    with pytest.raises(ValueError):
        load_imagenette(str(tmp_path), train=True, size="99px")
    with pytest.raises(FileNotFoundError):
        load_imagenette(str(tmp_path / "nope"), train=True, download=False)


def test_dtd_split_parsing(tmp_path):
    from pytorch_ddp_resnet_tpu.data.datasets import load_dtd

    base = tmp_path / "dtd" / "dtd"
    cats = ["banded", "dotted", "zigzagged"]
    rel = {}
    for c in cats:
        rel[c] = [f"{c}/{c}_{i:04d}.jpg" for i in range(1, 4)]
        for r in rel[c]:
            _save_jpg(str(base / "images" / r))
    (base / "labels").mkdir()
    # train1: first 2 of each; val1: the last of each; partition 2 differs
    with open(base / "labels" / "train1.txt", "w") as f:
        f.write("\n".join(rel[c][i] for c in cats for i in range(2)) + "\n")
    with open(base / "labels" / "val1.txt", "w") as f:
        f.write("\n".join(rel[c][2] for c in cats) + "\n")
    with open(base / "labels" / "train2.txt", "w") as f:
        f.write(rel["dotted"][0] + "\n")

    tr = load_dtd(str(tmp_path), train=True, download=False)
    va = load_dtd(str(tmp_path), train=False, download=False)
    assert len(tr) == 6 and len(va) == 3
    assert tr.num_classes == 3  # categories present under images/
    assert list(va.labels) == [0, 1, 2]  # sorted category order
    assert all(os.path.exists(p) for p in tr.paths + va.paths)
    p2 = load_dtd(str(tmp_path), train=True, download=False, partition=2)
    assert len(p2) == 1 and p2.labels[0] == 1
    with pytest.raises(ValueError):
        load_dtd(str(tmp_path), train=True, download=False, partition=11)


def test_flowers102_mat_split_parsing(tmp_path):
    from scipy.io import savemat

    from pytorch_ddp_resnet_tpu.data.datasets import load_flowers102

    base = tmp_path / "flowers-102"
    n = 10
    for i in range(1, n + 1):
        _save_jpg(str(base / "jpg" / f"image_{i:05d}.jpg"), seed=i)
    labels = np.arange(1, n + 1) % 102 + 1  # 1-indexed classes
    savemat(str(base / "imagelabels.mat"), {"labels": labels.reshape(1, -1)})
    savemat(str(base / "setid.mat"), {
        "trnid": np.array([[1, 3, 5, 7]]), "valid": np.array([[2, 4]]),
        "tstid": np.array([[6, 8, 9, 10]])})

    tr = load_flowers102(str(tmp_path), train=True, download=False)
    va = load_flowers102(str(tmp_path), train=False, download=False)
    assert len(tr) == 4 and len(va) == 2 and tr.num_classes == 102
    assert tr.paths[0].endswith("image_00001.jpg")
    # label of image id k is (k % 102 + 1) - 1 zero-indexed
    assert list(tr.labels) == [(k % 102 + 1) - 1 for k in (1, 3, 5, 7)]
    assert all(os.path.exists(p) for p in tr.paths + va.paths)


def test_fgvc_aircraft_parsing(tmp_path):
    from pytorch_ddp_resnet_tpu.data.datasets import load_fgvc_aircraft

    data = tmp_path / "fgvc-aircraft-2013b" / "data"
    variants = ["707-320", "A340-300", "DR-400"]
    (data / "images").mkdir(parents=True)
    with open(data / "variants.txt", "w") as f:
        f.write("\n".join(variants) + "\n")
    ids = {"train": ["0001", "0002", "0003"], "val": ["0004"]}
    pairs = {"0001": "A340-300", "0002": "707-320", "0003": "DR-400",
             "0004": "A340-300"}
    for split, id_list in ids.items():
        with open(data / f"images_variant_{split}.txt", "w") as f:
            f.write("\n".join(f"{i} {pairs[i]}" for i in id_list) + "\n")
    for i in pairs:
        _save_jpg(str(data / "images" / f"{i}.jpg"))

    tr = load_fgvc_aircraft(str(tmp_path), train=True, download=False)
    va = load_fgvc_aircraft(str(tmp_path), train=False, download=False)
    assert len(tr) == 3 and len(va) == 1 and tr.num_classes == 3
    # class index = variants.txt line order; names contain spaces/dashes
    assert list(tr.labels) == [1, 0, 2] and list(va.labels) == [1]
    assert all(os.path.exists(p) for p in tr.paths + va.paths)


def test_streaming_registry_dispatch(tmp_path):
    from pytorch_ddp_resnet_tpu.data.datasets import (
        ImageFolderDataset,
        get_dataset,
    )

    for wnid in ("a", "b"):
        _save_jpg(str(tmp_path / "imagenette2" / "train" / wnid / "x.jpg"))
        _save_jpg(str(tmp_path / "imagenette2" / "val" / wnid / "x.jpg"))
    ds = get_dataset("Imagenette", str(tmp_path), train=True, download=False)
    assert isinstance(ds, ImageFolderDataset) and ds.num_classes == 2


def test_caltech101_split_parsing(tmp_path):
    from pytorch_ddp_resnet_tpu.data.datasets import load_caltech101

    root = tmp_path / "caltech101" / "101_ObjectCategories"
    # 2 categories (sorted: ant < bee) + the excluded background dir;
    # 32 images in 'ant' so the standard 30-per-class split leaves 2 test
    for cat, n in (("ant", 32), ("bee", 31), ("BACKGROUND_Google", 5)):
        for i in range(n):
            _save_jpg(str(root / cat / f"image_{i:04d}.jpg"), seed=i)
    tr = load_caltech101(str(tmp_path), train=True, download=False)
    te = load_caltech101(str(tmp_path), train=False, download=False)
    assert tr.num_classes == te.num_classes == 2  # background excluded
    assert len(tr) == 60 and len(te) == 3  # 30+30 train; 2+1 test
    assert sorted(set(tr.labels)) == [0, 1]
    # first-30-sorted protocol: test paths are the tail images
    assert all("image_003" in p for p in te.paths if "ant" in p)
    with pytest.raises(FileNotFoundError):
        load_caltech101(str(tmp_path / "nope"), train=True, download=False)


def test_celeba_identity_parsing(tmp_path):
    from pytorch_ddp_resnet_tpu.data.datasets import load_celeba

    base = tmp_path / "celeba"
    names = [f"{i:06d}.jpg" for i in range(1, 7)]
    for i, n in enumerate(names):
        _save_jpg(str(base / "img_align_celeba" / n), seed=i)
    # partitions: 0=train, 1=val(test here), 2=held-out test (unused)
    parts = [0, 0, 1, 1, 2, 0]
    idents = [3, 1, 3, 2, 1, 2]  # 1-indexed identities, max=3
    with open(base / "list_eval_partition.txt", "w") as f:
        f.writelines(f"{n} {p}\n" for n, p in zip(names, parts))
    with open(base / "identity_CelebA.txt", "w") as f:
        f.writelines(f"{n} {i}\n" for n, i in zip(names, idents))
    tr = load_celeba(str(tmp_path), train=True)
    va = load_celeba(str(tmp_path), train=False)
    assert tr.num_classes == va.num_classes == 3
    assert len(tr) == 3 and len(va) == 2
    assert list(tr.labels) == [2, 0, 1]  # identities 3,1,2 -> 0-based
    assert list(va.labels) == [2, 1]
    with pytest.raises(FileNotFoundError):
        load_celeba(str(tmp_path / "nope"), train=True)
