"""Shared machinery for the NV ("batch-in-sublanes") kernel families.

The NV carrier is [h, wp, N, C]: XLA:TPU's own preferred conv activation
layout (physical {3,0,2,1} of NHWC), with the image columns at [1, w+1)
of a power-of-two-padded wp so W-borders are real rows and every 3x3 tap
is a tile-aligned row shift of the flattened [h*wp*N, C] row space. See
ops/pallas/bneck_nv.py's module docstring for the full derivation and
the measured boundary-cost story.

This module holds the pieces shared by the serving kernels
(bneck_nv.py) and the training kernels (bneck_nv_train.py): geometry,
NHWC<->NV packing, row shifts, the W-column border mask, and the
requant epilogue. One implementation, one set of tests
(tests/test_bneck_nv.py exercises them through both families).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nv_geometry(h: int, w: int) -> int:
    """wp of the NV layout for an [h, w] plane: smallest power of two
    >= w + 2 (image at columns [1, w+1); pow2 so the W-border mask uses
    bit ops)."""
    if h < 1 or w < 1:
        raise ValueError(f"degenerate plane {h}x{w}")
    wp = 8
    while wp < w + 2:
        wp *= 2
    return wp


def check_nv(wp: int, w: int):
    """Carriers may be WIDER than minimal (a stride-2 transition emits
    wp_in//2, which can exceed nv_geometry of the output plane) — any
    power of two >= w + 2 works; the masks only need pow2."""
    if wp & (wp - 1) or wp < w + 2:
        raise ValueError(f"wp={wp} is not a pow2 >= w+2={w + 2}")


def to_nv(x_nhwc: jax.Array) -> jax.Array:
    """[N, h, w, C] -> [h, wp, N, C] with zero W-borders. Pure XLA; the
    transpose is layout-cheap against XLA's {3,0,2,1} conv outputs."""
    n, h, w, c = x_nhwc.shape
    wp = nv_geometry(h, w)
    xt = jnp.transpose(x_nhwc, (1, 2, 0, 3))
    return jnp.pad(xt, ((0, 0), (1, wp - 1 - w), (0, 0), (0, 0)))


def from_nv(x_nv: jax.Array, w: int) -> jax.Array:
    """[h, wp, N, C] -> [N, h, w, C]."""
    return jnp.transpose(x_nv[:, 1:1 + w], (2, 0, 1, 3))


def shift_rows(a: jax.Array, o: int) -> jax.Array:
    """out[i] = a[i + o] with zero fill; o is a multiple of N in all
    callers, so the slice+concat never breaks sublane tiles."""
    if o == 0:
        return a
    z = jnp.zeros((abs(o), a.shape[1]), a.dtype)
    if o > 0:
        return jnp.concatenate([a[o:], z], axis=0)
    return jnp.concatenate([z, a[:o]], axis=0)


def requant(acc, p_ref, q_ref):
    """Folded-scale epilogue of the serving kernels: dequant + affine +
    relu + symmetric int8 requantization."""
    y = jnp.maximum(acc.astype(jnp.float32) * p_ref[:] + q_ref[:], 0.0)
    return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def wcol_mask(rows: int, wdt: int, *, wp: int, n: int, w: int):
    """[rows, wdt] bool over a flattened [*, wp, N] row space: True where
    the W coordinate is an image column (1 <= col <= w)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, wdt), 0)
    col = jnp.bitwise_and(
        jax.lax.shift_right_logical(idx, int(n).bit_length() - 1), wp - 1)
    return (col >= 1) & (col <= w)


# --- padded-flat layout + host-side scale folding ----------------------------
# These predate the NV carrier (they were the round-4 flat bottleneck
# kernel's packing, ops/pallas/bneck.py — displaced by the NV family,
# BASELINE.md "Fused bottleneck kernel, round 4"); they remain the
# XLA-side packing for entry quantization, the weight packers shared by
# the NV serving/test paths, and the reference mirrors in tests.


def flat_geometry(h: int, w: int):
    """(rows, stride, M) of the padded-flat layout for an [h, w] plane.

    stride: smallest power of two >= w + 2 (so 2-D shifts are exact 1-D
    shifts and iota masks use power-of-two bit ops); rows: h + 2 plus
    minimal padding so M = rows * stride is a multiple of 32 (the int8
    sublane tile)."""
    if h < 1 or w < 1:
        raise ValueError(f"degenerate plane {h}x{w}")
    stride = 8
    while stride < w + 2:
        stride *= 2
    rows = h + 2
    while (rows * stride) % 32 != 0:
        rows += 1
    return rows, stride, rows * stride


def pad_flat(x_nhwc: jax.Array) -> jax.Array:
    """[N, h, w, C] -> [N, M, C] padded-flat (zeros in the border/pad
    slots). Pure XLA, fused with the entry quantization."""
    n, h, w, c = x_nhwc.shape
    rows, stride, m = flat_geometry(h, w)
    padded = jnp.pad(x_nhwc, ((0, 0), (1, rows - 1 - h),
                              (1, stride - 1 - w), (0, 0)))
    return padded.reshape(n, m, c)


def unpad_flat(x_flat: jax.Array, h: int, w: int) -> jax.Array:
    """[N, M, C] padded-flat -> [N, h, w, C]."""
    n, m, c = x_flat.shape
    rows, stride, m2 = flat_geometry(h, w)
    if m != m2:
        raise ValueError(f"flat M={m} does not match {h}x{w} -> {m2}")
    return x_flat.reshape(n, rows, stride, c)[:, 1:1 + h, 1:1 + w, :]


def quantize_pad_flat(x_nhwc: jax.Array, scale: float) -> jax.Array:
    """Entry quantization + padded-flat packing in one XLA fusion.
    Multiplies by the inverse scale — bit-identical to the NV kernels'
    entry handling (x/s and x*(1/s) differ in f32)."""
    q = jnp.clip(jnp.round(x_nhwc.astype(jnp.float32) * (1.0 / scale)),
                 -127.0, 127.0).astype(jnp.int8)
    return pad_flat(q)


def pack_w2(w_hwio: jax.Array) -> jax.Array:
    """3x3 HWIO [3, 3, W, W] -> [9, W, W], tap-major (dy, dx)."""
    kh, kw, wi, wo = w_hwio.shape
    if (kh, kw) != (3, 3):
        raise ValueError("pack_w2 expects a 3x3 kernel")
    return w_hwio.reshape(9, wi, wo)


def fold_block_scales(s_in: float, s2: float, s3: float, s_out,
                      w1s, i1, t1, w2s, i2, t2, w3s, i3, t3):
    """Fold per-tensor activation scales, per-channel weight scales, and
    BN eval affines into an identity bottleneck block's (p1,q1,p2,q2,
    p3,q3,r) requant vectors (shared by the NV serving kernels,
    ops/pallas/bneck_nv.py).

    Derivation (post-act v1 block, models/blocks.py):
        a1_f = relu(acc1 * s_in*w1s * i1 + t1); conv2 input q = a1_f/s2
          -> p1 = s_in*w1s*i1 / s2, q1 = t1 / s2     (relu commutes with
             the positive 1/s2; clip/round = the quantization)
        a2_f = relu(acc2 * s2*w2s * i2 + t2); conv3 input q = a2_f/s3
          -> p2 = s2*w2s*i2 / s3, q2 = t2 / s3
        out_f = relu(x_f + acc3 * s3*w3s * i3 + t3), x_f = q_in*s_in;
        emitted as out_f/s_out (s_out = 1.0 for the bf16 exit)
          -> p3 = s3*w3s*i3 / s_out, q3 = t3 / s_out, r = s_in / s_out
    """
    f32 = lambda v: jnp.asarray(v, jnp.float32)  # noqa: E731
    s_out = float(s_out)
    p1 = f32(w1s) * f32(i1) * (s_in / s2)
    q1 = f32(t1) / s2
    p2 = f32(w2s) * f32(i2) * (s2 / s3)
    q2 = f32(t2) / s3
    p3 = f32(w3s) * f32(i3) * (s3 / s_out)
    q3 = f32(t3) / s_out
    return p1, q1, p2, q2, p3, q3, float(s_in) / s_out
