"""Pallas fused augmentation kernel: semantic equivalence with the XLA
transform path (interpret mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.ops.pallas.augment import (
    chw_planar_to_nhwc,
    make_pallas_augment_fn,
    pallas_augment,
    to_chw_planar,
)

H = W = 16
C = 3
PAD = 2
CROP = 16
N = 32
B = 8


def _dataset():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, size=(N, H, W, C), dtype=np.uint8)


def _stats():
    rng = np.random.default_rng(1)
    mean = rng.uniform(0.3, 0.7, size=(H, W, C)).astype(np.float32)
    std = rng.uniform(0.2, 0.5, size=(H, W, C)).astype(np.float32)
    return mean, std


def _reference_nhwc(ds, idx, top, left, flip, mean, std, mirror):
    """The XLA/numpy semantics of the fused pipeline."""
    x = ds[idx].astype(np.float32) / 255.0
    x = (x - mean) / std
    x = np.where(flip[:, None, None, None].astype(bool), x[:, :, ::-1, :], x)
    mode = "reflect" if mirror else "constant"
    x = np.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)), mode=mode)
    out = np.stack([
        x[i, top[i]:top[i] + CROP, left[i]:left[i] + CROP, :]
        for i in range(len(idx))
    ])
    return out


def test_layout_roundtrip():
    ds = _dataset()
    chw = to_chw_planar(ds)
    assert chw.shape == (N, C * H, W)
    back = np.asarray(chw_planar_to_nhwc(jnp.asarray(chw), C))
    np.testing.assert_array_equal(back, ds)


@pytest.mark.parametrize("mirror", [False, True])
def test_kernel_matches_reference_semantics(mirror):
    ds = _dataset()
    mean, std = _stats()
    rng = np.random.default_rng(2)
    idx = rng.integers(0, N, size=(B,)).astype(np.int32)
    top = rng.integers(0, 2 * PAD + 1, size=(B,)).astype(np.int32)
    left = rng.integers(0, 2 * PAD + 1, size=(B,)).astype(np.int32)
    flip = rng.integers(0, 2, size=(B,)).astype(np.int32)

    out = pallas_augment(
        jnp.asarray(to_chw_planar(ds)), jnp.asarray(idx), jnp.asarray(top),
        jnp.asarray(left), jnp.asarray(flip),
        jnp.asarray(to_chw_planar(mean[None])[0]),
        jnp.asarray(1.0 / to_chw_planar(std[None])[0]),
        h=H, w=W, c=C, pad=PAD, crop=CROP, mirror=mirror, interpret=True)
    got = np.asarray(chw_planar_to_nhwc(out, C), np.float32)
    want = _reference_nhwc(ds, idx, top, left, flip, mean, std, mirror)
    # output is bf16: tolerance accordingly
    np.testing.assert_allclose(got, want, atol=0.02, rtol=0.02)


def test_make_pallas_augment_fn_distribution():
    """The wrapper's randomness matches the XLA path's semantics: same-key
    determinism, different-key variation, flip fraction ~ p."""
    ds = _dataset()
    mean, std = _stats()
    fn = make_pallas_augment_fn(ds, mean, std, flip_p=0.5, pad=PAD, crop=CROP,
                                mirror=False, interpret=True)
    idx = jnp.arange(B, dtype=jnp.int32)
    a = fn(idx, jax.random.key(0))
    b = fn(idx, jax.random.key(0))
    c = fn(idx, jax.random.key(1))
    assert a.shape == (B, CROP, CROP, C) and a.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))
    assert not np.array_equal(np.asarray(a, np.float32),
                              np.asarray(c, np.float32))


def test_no_whitening_variant():
    ds = _dataset()
    fn = make_pallas_augment_fn(ds, None, None, flip_p=0.0, pad=PAD,
                                crop=CROP, mirror=False, interpret=True)
    idx = jnp.arange(B, dtype=jnp.int32)
    out = np.asarray(fn(idx, jax.random.key(3)), np.float32)
    # values are x/255 windows of the source images
    assert out.min() >= 0.0 and out.max() <= 1.0
