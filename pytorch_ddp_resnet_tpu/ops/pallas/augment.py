"""Pallas TPU kernel: fused gather + augmentation for resident datasets.

One kernel performs, per sample, what the reference does in five Python/PIL
steps on the CPU (reference: transform_util.py — ToTensor, Zero-mean or
Standardize whitening, horizontal flip, zero/mirror pad, random crop):

    HBM uint8 dataset row --DMA--> VMEM -> /255 -> (x-mean)*inv_std
        -> optional lane-reversal flip -> pad -> dynamic-slice crop
        -> bf16 output (the conv input dtype)

Layout choice: images are stored CHW-**planar** as (C*H, W) so a horizontal
flip is a pure lane reversal (no channel interleaving on the 128-lane axis)
and per-channel padding/cropping are contiguous sublane windows. The XLA
fallback path (data/transforms.py) is NHWC; equality between the two is
asserted in tests up to layout transposition.

The per-sample randomness (source index, crop corner, flip bit) is computed
*outside* the kernel with the standard JAX PRNG and enters as scalar-prefetch
operands, so the kernel itself is deterministic and the stochastic semantics
stay identical to the XLA path.

This covers the standard CIFAR recipe (both shipped configs):
    [ToTensor, ZeroMean|Standardize, Flip(p), Pad(zero|mirror), RandomCrop]
Recipes outside this pattern use the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def to_chw_planar(x_nhwc: np.ndarray) -> np.ndarray:
    """(N, H, W, C) -> (N, C*H, W), the kernel's resident layout."""
    n, h, w, c = x_nhwc.shape
    return np.ascontiguousarray(
        x_nhwc.transpose(0, 3, 1, 2).reshape(n, c * h, w))


def _augment_kernel(
    # scalar prefetch
    idx_ref, top_ref, left_ref, flip_ref,
    # inputs
    src_ref,      # (1, C*H, W) uint8 VMEM — this sample's image, gathered by
                  # the pipeline via the scalar-prefetched index map
    mean_ref,     # (C*H, W) f32, VMEM
    inv_std_ref,  # (C*H, W) f32, VMEM
    # output block
    out_ref,      # (1, C*crop, crop) bf16, VMEM
    # scratch
    pad_ref,      # (C*Hp, Wp) f32 VMEM — staging for the dynamic crop
    *,
    h: int, w: int, c: int, pad: int, crop: int, mirror: bool,
):
    hp, wp = h + 2 * pad, w + 2 * pad
    i = pl.program_id(0)

    # u8 -> i32 -> f32: Mosaic has no direct uint8->float cast
    x = src_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    x = (x - mean_ref[:]) * inv_std_ref[:]

    # horizontal flip = lane reversal in CHW-planar layout (no channel mix).
    # Mosaic lacks a `rev` lowering, so reverse via a W x W antidiagonal
    # permutation matmul — a tiny MXU op.
    do_flip = flip_ref[i] == 1
    rows = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    rev_mat = (rows + cols == w - 1).astype(jnp.float32)
    x_flipped = jnp.dot(x, rev_mat, preferred_element_type=jnp.float32)
    x = jnp.where(do_flip, x_flipped, x)

    # pad per channel plane (reflect == torch 'reflect': edge not repeated),
    # then crop a dynamic window. jnp.pad(mode='reflect') lowers to `rev`,
    # which Mosaic lacks, so reflected borders are built with the same
    # antidiagonal-matmul reversal (einsum -> dot_general).
    x3 = x.reshape(c, h, w)
    if mirror and pad > 0:
        p_rows = jax.lax.broadcasted_iota(jnp.int32, (pad, pad), 0)
        p_cols = jax.lax.broadcasted_iota(jnp.int32, (pad, pad), 1)
        p_rev = (p_rows + p_cols == pad - 1).astype(jnp.float32)
        top = jnp.einsum("km,cmw->ckw", p_rev, x3[:, 1:pad + 1, :],
                         preferred_element_type=jnp.float32)
        bot = jnp.einsum("km,cmw->ckw", p_rev, x3[:, h - pad - 1:h - 1, :],
                         preferred_element_type=jnp.float32)
        xv = jnp.concatenate([top, x3, bot], axis=1)
        left = jnp.einsum("chm,mk->chk", xv[:, :, 1:pad + 1], p_rev,
                          preferred_element_type=jnp.float32)
        right = jnp.einsum("chm,mk->chk", xv[:, :, w - pad - 1:w - 1], p_rev,
                           preferred_element_type=jnp.float32)
        xp = jnp.concatenate([left, xv, right], axis=2)
    else:
        xp = jnp.pad(x3, ((0, 0), (pad, pad), (pad, pad)), mode="constant")

    # Crop. Dynamic *sublane* starts are supported on ref reads (pl.ds), but
    # dynamic *lane* offsets are not: select the horizontal window with a
    # left-dependent one-hot matmul instead (S[m, k] = [m == left + k]).
    pad_ref[:] = xp.reshape(c * hp, wp)
    top = top_ref[i]
    left = left_ref[i]
    sel_rows = jax.lax.broadcasted_iota(jnp.int32, (wp, crop), 0)
    sel_cols = jax.lax.broadcasted_iota(jnp.int32, (wp, crop), 1)
    sel = (sel_rows == left + sel_cols).astype(jnp.float32)
    for ch in range(c):
        band = pad_ref[pl.ds(ch * hp + top, crop), :]  # (crop, Wp)
        win = jnp.dot(band, sel, preferred_element_type=jnp.float32)
        out_ref[0, ch * crop:(ch + 1) * crop, :] = win.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "c", "pad", "crop", "mirror", "interpret"))
def pallas_augment(
    dataset_chw: jax.Array,   # (N, C*H, W) uint8 resident dataset
    idx: jax.Array,           # (B,) int32 sample indices
    top: jax.Array,           # (B,) int32 crop top offsets in [0, 2*pad]
    left: jax.Array,          # (B,) int32 crop left offsets
    flip: jax.Array,          # (B,) int32 {0,1} flip bits
    mean: jax.Array,          # (C*H, W) f32 whitening mean (zeros if none)
    inv_std: jax.Array,       # (C*H, W) f32 reciprocal stddev (ones if none)
    *,
    h: int, w: int, c: int, pad: int, crop: int, mirror: bool,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, C*crop, crop) bf16 augmented batch in CHW-planar layout."""
    b = idx.shape[0]
    kernel = functools.partial(
        _augment_kernel, h=h, w=w, c=c, pad=pad, crop=crop, mirror=mirror)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            # the gather: block (1, C*H, W) whose index map reads the
            # scalar-prefetched sample index — Pallas's pipeline emitter
            # issues (and double-buffers) the HBM->VMEM DMAs
            pl.BlockSpec((1, c * h, w),
                         lambda i, idx_ref, *_: (idx_ref[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c * h, w), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # mean
            pl.BlockSpec((c * h, w), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # inv_std
        ],
        out_specs=pl.BlockSpec(
            (1, c * crop, crop), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c * (h + 2 * pad), w + 2 * pad), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c * crop, crop), jnp.bfloat16),
        interpret=interpret,
    )(idx.astype(jnp.int32), top.astype(jnp.int32), left.astype(jnp.int32),
      flip.astype(jnp.int32), dataset_chw, mean, inv_std)


def chw_planar_to_nhwc(x: jax.Array, c: int) -> jax.Array:
    """(B, C*H, W) -> (B, H, W, C) for the NHWC model input."""
    b, ch, w = x.shape
    hh = ch // c
    return jnp.transpose(x.reshape(b, c, hh, w), (0, 2, 3, 1))


def make_pallas_augment_fn(
    dataset_nhwc_u8: np.ndarray,
    mean_nhwc: Optional[np.ndarray],
    std_nhwc: Optional[np.ndarray],
    flip_p: float,
    pad: int,
    crop: int,
    mirror: bool,
    interpret: bool = False,
):
    """Build ``(idx, rng) -> (B, crop, crop, C) bf16`` — the fused resident
    gather+augment pipeline. ``mean/std`` are the fitted whitening stats in
    NHWC (None -> identity)."""
    n, h, w, c = dataset_nhwc_u8.shape
    dataset_chw = jnp.asarray(to_chw_planar(dataset_nhwc_u8))
    mean = (to_chw_planar(mean_nhwc[None])[0] if mean_nhwc is not None
            else np.zeros((c * h, w), np.float32))
    inv_std = (1.0 / to_chw_planar(std_nhwc[None])[0]
               if std_nhwc is not None else np.ones((c * h, w), np.float32))
    mean = jnp.asarray(mean, jnp.float32)
    inv_std = jnp.asarray(inv_std, jnp.float32)

    top_range = h + 2 * pad - crop + 1   # randint bounds match the XLA
    left_range = w + 2 * pad - crop + 1  # RandomCropTransform semantics

    def augment(idx, rng):
        bsz = idx.shape[0]
        r_top, r_left, r_flip = jax.random.split(rng, 3)
        top = jax.random.randint(r_top, (bsz,), 0, top_range)
        left = jax.random.randint(r_left, (bsz,), 0, left_range)
        flip = jax.random.bernoulli(r_flip, flip_p, (bsz,)).astype(jnp.int32)
        out = pallas_augment(
            dataset_chw, idx, top, left, flip, mean, inv_std,
            h=h, w=w, c=c, pad=pad, crop=crop, mirror=mirror,
            interpret=interpret)
        return chw_planar_to_nhwc(out, c)

    return augment


def try_from_transforms(transforms, dataset_nhwc_u8: np.ndarray,
                        interpret: bool = False):
    """Pattern-match an ordered transform pipeline onto the fused kernel.

    Supported shape (the standard CIFAR recipe, both shipped configs):
        ToTensorTransform
        [ZeroMeanWhiteningTransform | StandardizeWhiteningTransform]
        [FlipTransform(p)]
        [PaddingTransform(pad, zero|mirror)]
        [RandomCropTransform(crop)]
    Returns the fused ``(idx, rng) -> batch`` function, or None when the
    pipeline doesn't match (callers fall back to the XLA path).
    """
    from pytorch_ddp_resnet_tpu.data import transforms as T

    seq = list(transforms.values())
    n, h, w, c = dataset_nhwc_u8.shape
    if not seq or not isinstance(seq[0], T.ToTensorTransform):
        return None
    i = 1
    mean = std = None
    if i < len(seq) and isinstance(seq[i], T.ZeroMeanWhiteningTransform):
        mean, std = np.asarray(seq[i].mean), None
        i += 1
    elif i < len(seq) and isinstance(seq[i], T.StandardizeWhiteningTransform):
        mean, std = np.asarray(seq[i].mean), np.asarray(seq[i].stddev)
        i += 1
    flip_p = 0.0
    if i < len(seq) and isinstance(seq[i], T.FlipTransform):
        flip_p = seq[i]._p
        i += 1
    pad, mirror = 0, False
    if i < len(seq) and isinstance(seq[i], T.PaddingTransform):
        pad, mirror = seq[i]._pad_size, seq[i]._pad_type == "mirror"
        i += 1
    crop = h + 2 * pad
    if i < len(seq) and isinstance(seq[i], T.RandomCropTransform):
        crop = seq[i]._crop_size
        i += 1
    if i != len(seq) or h != w or crop > h + 2 * pad:
        return None
    return make_pallas_augment_fn(
        dataset_nhwc_u8, mean, std, flip_p=flip_p, pad=pad, crop=crop,
        mirror=mirror, interpret=interpret)
