"""Transform semantics tests, cross-checked against torch where the reference
behavior is expressible (reference: resnet/utils/transform_util.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch as tc

from pytorch_ddp_resnet_tpu.data import transforms as T
from pytorch_ddp_resnet_tpu.data.datasets import load_synthetic
from pytorch_ddp_resnet_tpu.data.pipeline import build_transforms


def _imgs(n=16, h=8, w=8, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, size=(n, h, w, c)).astype(np.float32)


def test_to_tensor_scales_uint8():
    t = T.ToTensorTransform((8, 8, 3))
    x = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(1, 8, 8, 3)
    y = np.asarray(t.apply_batch(jnp.asarray(x)))
    np.testing.assert_allclose(y, x.astype(np.float32) / 255.0, rtol=1e-6)
    assert t.output_shape == (8, 8, 3)


def test_zero_mean_whitening_fit_and_apply():
    t = T.ZeroMeanWhiteningTransform((8, 8, 3))
    x = _imgs()
    with pytest.raises(RuntimeError):
        t.apply_batch(jnp.asarray(x))
    t.fit(jnp.asarray(x))
    y = np.asarray(t.apply_batch(jnp.asarray(x)))
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-6)
    # matches the reference's streaming per-pixel mean
    np.testing.assert_allclose(t.mean, x.mean(axis=0), rtol=1e-5)


def test_standardize_whitening_population_std():
    t = T.StandardizeWhiteningTransform((8, 8, 3))
    x = _imgs()
    t.fit(jnp.asarray(x))
    np.testing.assert_allclose(t.stddev, x.std(axis=0), rtol=1e-4)
    y = np.asarray(t.apply_batch(jnp.asarray(x)))
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(axis=0), 1.0, atol=1e-4)


def test_zca_whitening_matches_reference_formula():
    """W = U diag(rsqrt(s+1e-2)) U^T of the biased covariance; applied to the
    *uncentered* input (transform_util.py:121-153)."""
    x = _imgs(n=64, h=4, w=4, c=3)
    t = T.ZCAWhiteningTransform((4, 4, 3))
    t.fit(jnp.asarray(x))
    # reference formula in torch on the same (HWC-flattened) data
    flat = tc.tensor(x.reshape(64, -1))
    mean = flat.mean(dim=0)
    cen = flat - mean
    cov = cen.T @ cen / 64
    u, s, v = tc.linalg.svd(cov)
    w_ref = u @ tc.diag(tc.rsqrt(s + 1e-2)) @ u.T
    np.testing.assert_allclose(t.zca_matrix, w_ref.numpy(), atol=1e-4)
    y = np.asarray(t.apply_batch(jnp.asarray(x)))
    y_ref = (flat @ w_ref.T).numpy().reshape(64, 4, 4, 3)
    np.testing.assert_allclose(y, y_ref, atol=1e-4)


def test_flip_transform_probability_and_content():
    t = T.FlipTransform((8, 8, 3), p=0.5)
    x = _imgs(n=2048)
    y = np.asarray(t.apply_batch(jnp.asarray(x), jax.random.key(0)))
    flipped = np.all(np.isclose(y, x[:, :, ::-1, :]), axis=(1, 2, 3))
    same = np.all(np.isclose(y, x), axis=(1, 2, 3))
    assert np.all(flipped | same)
    assert 0.42 < flipped.mean() < 0.58  # Bernoulli(0.5)
    # p=0 and p=1 degenerate cases
    y0 = np.asarray(T.FlipTransform((8, 8, 3), 0.0).apply_batch(
        jnp.asarray(x), jax.random.key(1)))
    np.testing.assert_array_equal(y0, x)
    y1 = np.asarray(T.FlipTransform((8, 8, 3), 1.0).apply_batch(
        jnp.asarray(x), jax.random.key(1)))
    np.testing.assert_allclose(y1, x[:, :, ::-1, :])


@pytest.mark.parametrize("pad_type,torch_mode", [("zero", "constant"),
                                                 ("mirror", "reflect")])
def test_padding_matches_torch(pad_type, torch_mode):
    t = T.PaddingTransform((8, 8, 3), pad_size=2, pad_type=pad_type)
    assert t.output_shape == (12, 12, 3)
    x = _imgs(n=4)
    y = np.asarray(t.apply_batch(jnp.asarray(x)))
    xt = tc.tensor(x.transpose(0, 3, 1, 2))  # NCHW for torch
    yt = tc.nn.functional.pad(xt, (2, 2, 2, 2), mode=torch_mode)
    np.testing.assert_allclose(y, yt.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_random_crop_bounds_and_shape():
    t = T.RandomCropTransform((12, 12, 3), crop_size=8)
    assert t.output_shape == (8, 8, 3)
    x = _imgs(n=64, h=12, w=12)
    y = np.asarray(t.apply_batch(jnp.asarray(x), jax.random.key(0)))
    assert y.shape == (64, 8, 8, 3)
    # every crop must be an exact window of its source image
    for i in range(8):
        found = False
        for ti in range(5):
            for li in range(5):
                if np.allclose(y[i], x[i, ti:ti + 8, li:li + 8]):
                    found = True
        assert found, f"crop {i} is not a window of its source"
    # crops differ across samples (randomness is per-sample)
    corners = [tuple(np.argwhere(
        np.isclose(x[i, :, :, 0], y[i, 0, 0, 0]))[0]) for i in range(16)]
    assert len(set(corners)) > 1


def test_random_scale_short_side():
    t = T.RandomScaleTransform((None, None, 3), target_short_side=8)
    assert not t.device_compatible
    tall = np.zeros((16, 10, 3), np.float32)
    wide = np.zeros((10, 16, 3), np.float32)
    assert t.apply_single(tall).shape == (13, 8, 3)
    assert t.apply_single(wide).shape == (8, 13, 3)
    with pytest.raises(RuntimeError):
        t.apply_batch(jnp.zeros((1, 8, 8, 3)))


def test_color_transform_per_channel_jitter():
    x = _imgs(n=256)
    t = T.ColorTransform((8, 8, 3))
    t.fit(jnp.asarray(x))
    y = np.asarray(t.apply_batch(jnp.asarray(x), jax.random.key(0)))
    delta = y - x
    # the jitter is constant across spatial positions within a sample
    np.testing.assert_allclose(
        delta, np.broadcast_to(delta[:, :1, :1, :], delta.shape), atol=1e-5)
    # and differs across samples
    assert np.std(delta[:, 0, 0, :], axis=0).max() > 1e-4


def test_fit_checkpoint_roundtrip(tmp_path):
    x = _imgs()
    t = T.StandardizeWhiteningTransform((8, 8, 3))
    t.fit(jnp.asarray(x))
    from pytorch_ddp_resnet_tpu.utils.checkpoint import (
        maybe_load_checkpoint, save_checkpoint)
    save_checkpoint(str(tmp_path), "standardizewhiteningtransform", t, steps=1)
    t2 = T.StandardizeWhiteningTransform((8, 8, 3))
    assert maybe_load_checkpoint(
        str(tmp_path), "standardizewhiteningtransform", t2, verbose=False) == 1
    assert t2.fitted
    np.testing.assert_allclose(t2.mean, t.mean)
    np.testing.assert_allclose(t2.stddev, t.stddev)


# --- pipeline building ------------------------------------------------------

AUG_TRAIN = {
    "ToTensorTransform": {},
    "StandardizeWhiteningTransform": {},
    "FlipTransform": {"p": 0.5},
    "PaddingTransform": {"pad_size": 4, "pad_type": "mirror"},
    "RandomCropTransform": {"crop_size": 32},
}
AUG_TEST = {
    "ToTensorTransform": {},
    "StandardizeWhiteningTransform": {},
}


def test_build_transforms_shape_threading_and_reuse(tmp_path):
    ds = load_synthetic(None, train=True, n_train=64)
    tr = build_transforms(ds, AUG_TRAIN, str(tmp_path), is_train=True)
    shapes = [t.output_shape for t in tr.values()]
    assert shapes == [(32, 32, 3), (32, 32, 3), (32, 32, 3), (40, 40, 3),
                      (32, 32, 3)]
    # fitted transform was checkpointed at step 1 under its lowercased name
    import os
    assert "standardizewhiteningtransform_1.ckpt" in os.listdir(str(tmp_path))
    # test pipeline reuses the fitted train instance
    te = build_transforms(ds, AUG_TEST, str(tmp_path), is_train=False,
                          reusable_transforms=tr)
    assert te["StandardizeWhiteningTransform"] is tr["StandardizeWhiteningTransform"]
    # fit statistics were computed through the upstream pipeline (/255)
    fitted = tr["StandardizeWhiteningTransform"]
    assert fitted.mean.max() <= 1.0


def test_build_transforms_restores_fitted_from_checkpoint(tmp_path):
    ds = load_synthetic(None, train=True, n_train=64)
    tr1 = build_transforms(ds, AUG_TRAIN, str(tmp_path), is_train=True)
    # second build (a restart) must load, not refit: poison the dataset to
    # detect an accidental refit
    ds2 = load_synthetic(None, train=True, n_train=64, seed=99)
    tr2 = build_transforms(ds2, AUG_TRAIN, str(tmp_path), is_train=True)
    np.testing.assert_allclose(
        tr2["StandardizeWhiteningTransform"].mean,
        tr1["StandardizeWhiteningTransform"].mean)


def test_build_transforms_rejects_missing_reusable(tmp_path):
    ds = load_synthetic(None, train=True, n_train=32)
    with pytest.raises(ValueError, match="reusable"):
        build_transforms(ds, AUG_TEST, str(tmp_path), is_train=False,
                         reusable_transforms={})


def test_stochastic_before_fittable_fits_deterministically(tmp_path):
    """A stochastic transform ahead of a fittable one is applied with a fixed
    key during fitting, so statistics are reproducible across builds (the
    reference would re-sample augmentation randomness inside fit)."""
    ds = load_synthetic(None, train=True, n_train=32)
    aug = {
        "ToTensorTransform": {},
        "FlipTransform": {"p": 0.5},
        "StandardizeWhiteningTransform": {},
    }
    import shutil
    t1 = build_transforms(ds, aug, str(tmp_path / "a"), is_train=True)
    t2 = build_transforms(ds, aug, str(tmp_path / "b"), is_train=True)
    np.testing.assert_array_equal(
        t1["StandardizeWhiteningTransform"].mean,
        t2["StandardizeWhiteningTransform"].mean)


def test_make_batch_augment_fn_composes_and_jits():
    ds = load_synthetic(None, train=True, n_train=64)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        tr = build_transforms(ds, AUG_TRAIN, d, is_train=True)
    fn = T.make_batch_augment_fn(list(tr.values()))
    jfn = jax.jit(fn)
    x = jnp.asarray(ds.x[:8])
    y1 = jfn(x, jax.random.key(0))
    y2 = jfn(x, jax.random.key(0))
    y3 = jfn(x, jax.random.key(1))
    assert y1.shape == (8, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert not np.array_equal(np.asarray(y1), np.asarray(y3))
