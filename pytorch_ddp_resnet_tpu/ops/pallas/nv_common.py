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
