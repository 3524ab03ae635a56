"""Fused int8 bottleneck-block kernels, batch-in-sublanes ("NV") layout.

The second-generation ImageNet-geometry kernel family (first generation:
ops/pallas/bneck.py, per-image padded-flat). The flat kernels win 1.6-2.7x
at stage level but LOSE end-to-end: XLA:TPU's preferred activation layout
for these convolutions is {3,0,2,1} — physically [H, W, N, C], batch in
the sublane dimension — and every custom-call boundary to a row-major
[N, H, W, C] operand pays a full-tensor relayout (measured 0.9 ms per
boundary at ResNet-50 stage 1, b128; see BASELINE.md round 4). This
module adopts the hardware's own layout instead:

    carrier: [h, wp, N, C] int8, wp = pow2 >= w+2, image cols at
    [1, w+1), W-border columns stored as real zeros. No H borders.

What the layout buys, all at once:
- **Boundary cost halves and boundary COUNT collapses**: kernel I/O is
  bitcast-compatible with XLA's conv layout (measured: a [h,w,N,c]
  passthrough costs ~0.4 ms/boundary vs ~0.8 for [N,h,w,c] at 205 MB).
- **Every 3x3 tap is a tile-aligned row shift**: tap (dy, dx) is a flat
  offset of (dy*wp + dx - 1) * N rows; N = batch >= 32, so the int8
  sublane tiling is never broken — no VPU shifts at all (the flat
  kernels paid sublane rotates per tap).
- **Stride-2 is FREE**: spatial subsampling is alternate-(wp*N)-row-block
  selection — reshape [h/2, 2, wp/2(...), N, C] and index a MAJOR dim.
  The transition blocks (stride-2 conv2 + projection shortcuts), which
  no previous kernel family could express without a lane gather, become
  ordinary aligned slices — so the ENTIRE residual trunk can run int8
  with int8 carriers, leaving float boundaries only at the stem and the
  head.

Halo without manual DMA: the grid walks row-chunks of R (R | h); each
step gets THREE block views of the carrier — main [R] rows at chunk k,
plus 1-row head/tail slivers at rows kR-1 / kR+R (block indices clamp at
the array edge; the kernel zeroes the clamped slivers' conv1 outputs at
k == 0 / k == K-1, which is exactly conv2's zero padding). conv1 is
recomputed on the slivers (2/R duplicate work) so conv2's taps see a
contiguous (R+2)-row activation slab.

Numerics are IDENTICAL to ops/pallas/bneck.py (same folded (p, q)
epilogue vectors, same round/clip, same single a1 mask) — the tests
assert bit-equality against the same independent 2-D mirror.

Reference parity target: BottleneckResidualBlock.apply(train=False)
semantics (reference residual_block.py:102-215) at the quantized point.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --- geometry ---------------------------------------------------------------


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


def quantize_to_nv(x_nhwc: jax.Array, scale: float) -> jax.Array:
    """Entry quantization + NV packing in one XLA fusion (multiplies by
    the inverse scale — bit-identical to the in-kernel entry)."""
    q = jnp.clip(jnp.round(x_nhwc.astype(jnp.float32) * (1.0 / scale)),
                 -127.0, 127.0).astype(jnp.int8)
    return to_nv(q)


def _pick_chunk(h: int, wp: int, n: int, cin: int,
                budget: int = 8 * 1024 * 1024) -> int:
    """Largest R dividing h whose main input block fits the budget."""
    best = None
    for r in range(1, h + 1):
        if h % r:
            continue
        if r * wp * n * cin <= budget or best is None:
            best = r
    return best


# --- kernel body helpers ----------------------------------------------------


def _shift_rows(a: jax.Array, o: int) -> jax.Array:
    """out[i] = a[i + o] with zero fill; o is a multiple of N here, so
    the slice+concat never breaks sublane tiles."""
    if o == 0:
        return a
    z = jnp.zeros((abs(o), a.shape[1]), a.dtype)
    if o > 0:
        return jnp.concatenate([a[o:], z], axis=0)
    return jnp.concatenate([z, a[:o]], axis=0)


def _requant(acc, p_ref, q_ref):
    y = jnp.maximum(acc.astype(jnp.float32) * p_ref[:] + q_ref[:], 0.0)
    return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def _wcol_mask(rows: int, wdt: int, *, wp: int, n: int, w: int):
    """[rows, wdt] bool over a flattened [*, wp, N] row space: True where
    the W coordinate is an image column (1 <= col <= w)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, wdt), 0)
    col = jnp.bitwise_and(
        jax.lax.shift_right_logical(idx, int(n).bit_length() - 1), wp - 1)
    return (col >= 1) & (col <= w)


# --- identity-block kernel ---------------------------------------------------


def _nv_kernel(head_ref, main_ref, tail_ref, w1_ref, w2_ref, w3_ref,
               p1_ref, q1_ref, p2_ref, q2_ref, p3_ref, q3_ref, r_ref,
               out_ref, *, rchunk, wp, n, w, nsteps, out_int8, conv2_impl):
    k = pl.program_id(0)
    cin = main_ref.shape[-1]
    wdt = w1_ref.shape[1]
    rowsz = wp * n

    def c1(piece, zero_when):
        v = piece[...].reshape(-1, cin)
        acc = jax.lax.dot_general(v, w1_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        a = _requant(acc, p1_ref, q1_ref)
        if zero_when is not None:
            a = jnp.where(zero_when, jnp.zeros_like(a), a)
        return a

    # conv1 on the three views; clamped slivers become conv2's H padding
    a1h = c1(head_ref, k == 0)
    a1m = c1(main_ref, None)
    a1t = c1(tail_ref, k == nsteps - 1)
    slab = jnp.concatenate([a1h, a1m, a1t], axis=0)  # [(R+2)*wp*N, W]
    slab = jnp.where(_wcol_mask(slab.shape[0], wdt, wp=wp, n=n, w=w),
                     slab, jnp.zeros_like(slab))

    m_out = rchunk * rowsz
    acc2 = jnp.zeros((m_out, wdt), jnp.int32)
    if conv2_impl == "grouped3":
        # K-pack the three dy taps (all row-aligned in this layout)
        wg = w2_ref[:].reshape(3, 3, wdt, wdt)
        for dx in range(3):
            cols = jnp.concatenate(
                [_shift_rows(slab, (dy * wp + dx - 1) * n)[:m_out]
                 for dy in range(3)], axis=1)
            acc2 = acc2 + jax.lax.dot_general(
                cols, wg[:, dx].reshape(3 * wdt, wdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    else:  # "dots9"
        for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                     for dx in range(3)):
            lhs = _shift_rows(slab, (dy * wp + dx - 1) * n)[:m_out]
            acc2 = acc2 + jax.lax.dot_general(
                lhs, w2_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    a2 = _requant(acc2, p2_ref, q2_ref)

    acc3 = jax.lax.dot_general(a2, w3_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    x = main_ref[...].reshape(m_out, cin)
    y = acc3.astype(jnp.float32) * p3_ref[:] + q3_ref[:]
    y = jnp.maximum(x.astype(jnp.float32) * r_ref[0, 0] + y, 0.0)
    if out_int8:
        o = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    else:
        o = y.astype(out_ref.dtype)
    out_ref[...] = o.reshape(out_ref.shape)


@functools.partial(jax.jit, static_argnames=(
    "w", "out_int8", "conv2_impl", "chunk_rows", "interpret"))
def bneck_block_nv(x_nv: jax.Array, w1q: jax.Array, w2q: jax.Array,
                   w3q: jax.Array, p1, q1, p2, q2, p3, q3, r, *,
                   w: int, out_int8: bool = True,
                   conv2_impl: str = "dots9",
                   chunk_rows: Optional[int] = None,
                   interpret: bool = False):
    """One identity-shortcut post-act bottleneck block in the NV layout.

    x_nv: [h, wp, N, Cin] int8 carrier (wp from nv_geometry, zero
    W-borders). Weights/affines exactly as bneck_block_int8 (bneck.py).
    Returns [h, wp, N, Cout] int8 (out_int8 — the next block's carrier,
    W-border columns carry garbage that downstream masks ignore) or
    bf16 (run exit; from_nv recovers NHWC).
    """
    h, wp, n, cin = x_nv.shape
    if wp != nv_geometry(h, w):
        raise ValueError(f"wp={wp} does not match w={w}")
    if n % 32:
        raise ValueError(f"N={n} must be a multiple of the 32-row tile")
    wdt = w1q.shape[1]
    cout = w3q.shape[1]
    if cout != cin:
        raise ValueError("identity-shortcut block needs Cout == Cin")
    rch = chunk_rows or _pick_chunk(h, wp, n, cin)
    if h % rch:
        raise ValueError(f"chunk_rows={rch} must divide h={h}")
    nsteps = h // rch

    def vec(c):
        return pl.BlockSpec((1, c), lambda k: (0, 0),
                            memory_space=pltpu.VMEM)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda k, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _nv_kernel, rchunk=rch, wp=wp, n=n, w=w, nsteps=nsteps,
        out_int8=out_int8, conv2_impl=conv2_impl)
    fvec = lambda v, c: jnp.asarray(v, jnp.float32).reshape(1, c)
    args = [x_nv, x_nv, x_nv, w1q, w2q, w3q,
            fvec(p1, wdt), fvec(q1, wdt), fvec(p2, wdt), fvec(q2, wdt),
            fvec(p3, cout), fvec(q3, cout),
            jnp.float32(r).reshape(1, 1)]
    # three views of the carrier: main chunk + 1-row halo slivers whose
    # indices clamp at the edges (zeroed in-kernel at k==0 / k==K-1)
    in_specs = [
        pl.BlockSpec((1, wp, n, cin), lambda k: (k * rch - 1, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rch, wp, n, cin), lambda k: (k, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, wp, n, cin), lambda k: (k * rch + rch, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        full((cin, wdt)), full((9, wdt, wdt)), full((wdt, cout)),
        vec(wdt), vec(wdt), vec(wdt), vec(wdt), vec(cout), vec(cout),
        vec(1),
    ]
    flops = 2 * h * wp * n * (cin * wdt + 9 * wdt * wdt + wdt * cout)
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rch, wp, n, cout), lambda k: (k, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (h, wp, n, cout), jnp.int8 if out_int8 else jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(h * wp * n * (cin * (rch + 2) // rch
                                          + cout * (1 if out_int8 else 2))
                            + cin * wdt + 9 * wdt * wdt + wdt * cout),
            transcendentals=0),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
