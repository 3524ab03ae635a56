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


def test_synthetic_determinism():
    a = load_synthetic(None, train=True)
    b = load_synthetic(None, train=True)
    np.testing.assert_array_equal(a.x, b.x)
    c = load_synthetic(None, train=False)
    assert not np.array_equal(a.x[: len(c.x)], c.x)
