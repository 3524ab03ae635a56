"""Fused int8 bottleneck-block kernels, batch-in-sublanes ("NV") layout.

The second-generation ImageNet-geometry kernel family (first generation:
the round-4 per-image padded-flat kernel, displaced in round 5 — its
packing helpers live on in nv_common.py). The flat kernels won 1.6-2.7x
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

Numerics are IDENTICAL to the displaced flat kernel (same folded
(p, q) epilogue vectors — nv_common.fold_block_scales — same round/clip,
same single a1 mask) — the tests assert bit-equality against the same
independent 2-D mirror (tests/test_bneck_mirror.py).

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

from pytorch_ddp_resnet_tpu.ops.pallas.nv_common import (
    check_nv as _check_nv,
    from_nv,
    nv_geometry,
    requant as _requant,
    shift_rows as _shift_rows,
    to_nv,
    wcol_mask as _wcol_mask,
)

# geometry / packing / masks live in ops/pallas/nv_common.py (shared
# with the training kernel family, bneck_nv_train.py)


def quantize_to_nv(x_nhwc: jax.Array, scale: float) -> jax.Array:
    """Entry quantization + NV packing in one XLA fusion (multiplies by
    the inverse scale — bit-identical to the in-kernel entry)."""
    q = jnp.clip(jnp.round(x_nhwc.astype(jnp.float32) * (1.0 / scale)),
                 -127.0, 127.0).astype(jnp.int8)
    return to_nv(q)


def _pick_chunk(oh: int, wp_in: int, n: int, cin: int, wdt: int,
                cout: int, wp_out: int, stride: int = 1,
                out_int8: bool = True,
                budget: int = 88 * 1024 * 1024) -> int:
    """Largest output-row chunk R dividing oh that fits VMEM.

    The per-output-row cost model is calibrated against a real Mosaic
    OOM report (R50 stage-1 entry transition, 14 rows -> 247.1 MB used
    = 17.8 MB/row: 4 MB 2-level output window + 2 MB input window +
    11.4 MB of i32 register-spill slots — exactly the conv1/conv2/conv3
    s32 accumulators). Budgeting only the input block, as this function
    originally did, under-counts by ~10x when cout >> cin and the
    compiler spills the accumulators to scoped VMEM."""
    wp2 = wp_in // stride
    row = n * (2 * stride * wp_in * cin        # 2-level input window
               + stride * wp_in * wdt * 5      # conv1 s32 acc + s8 slab
               + wp2 * wdt * 4                 # conv2 s32 acc
               # conv3/proj s32 acc: the transition kernel nominally has
               # BOTH a conv3 and a projection accumulator of this size,
               # but the calibration report (17.8 vs 17.65 MB/row on the
               # R50 stage-1 entry transition) shows the compiler reuses
               # the slot — one term, backed by the 88-vs-100MB slack and
               # the pinned-geometry checks below. Revisit if a large-cout
               # transition outside the pinned set OOMs.
               + wp2 * cout * 4
               + wp_out * cout * 2 * (1 if out_int8 else 2))  # out window
    fixed = cin * wdt + 9 * wdt * wdt + wdt * cout + cin * cout  # weights
    best = None
    for r in range(1, oh + 1):
        if oh % r:
            continue
        if r * row + fixed <= budget:
            best = r
    if best is None:
        raise ValueError(
            f"NV geometry does not fit the VMEM budget even at 1-row "
            f"chunks: est {(row + fixed) / 2**20:.1f} MB/row vs "
            f"{budget / 2**20:.0f} MB (oh={oh} wp_in={wp_in} n={n} "
            f"cin={cin} wdt={wdt} cout={cout} stride={stride}); shrink "
            f"the batch or image plane, or raise `budget`")
    return best


def _pick_grid(oh: int, wp_in: int, n: int, cin: int, wdt: int,
               cout: int, wp_out: int, stride: int = 1,
               out_int8: bool = True,
               budget: int = 88 * 1024 * 1024) -> Tuple[int, int]:
    """Jointly pick (output-row chunk R, batch tile nb) for the NV grid.

    The VMEM row cost is linear in the batch tile, so halving nb doubles
    the largest R that fits — and the halo overhead (1-row conv1 slivers
    recomputed + re-read per chunk) scales as (R*s + slivers)/(R*s).
    At b128 the one-batch-tile picker forces R=2 at h=14 (100% extra
    conv1 work) and R=1 at h=7 (200%); tiling the batch into the grid
    is numerics-free (rows of distinct images never interact) and lets
    the small-plane stages run near-minimal halo fractions (measured
    A/B in BASELINE.md round 5).

    Policy: minimize the halo ratio; on ties prefer the LARGER batch
    tile (fewer grid steps). nb candidates are pow2 multiples of 32
    dividing n (the kernels' sublane-tile contract).
    """
    slivers = 2 if stride == 1 else 1
    best = None  # (halo_ratio, -nb, R, nb)
    nb = n
    while nb >= 32 and nb % 32 == 0 and not (nb & (nb - 1)):
        try:
            r = _pick_chunk(oh, wp_in, nb, cin, wdt, cout, wp_out,
                            stride=stride, out_int8=out_int8,
                            budget=budget)
        except ValueError:
            if nb == 32:
                raise
            nb //= 2
            continue
        key = ((r * stride + slivers) / (r * stride), -nb)
        if best is None or key < best[:2]:
            best = key + (r, nb)
        nb //= 2
    if best is None:
        # n itself is not tileable (validated upstream); fall through to
        # the single-tile picker so its error names the geometry.
        return _pick_chunk(oh, wp_in, n, cin, wdt, cout, wp_out,
                           stride=stride, out_int8=out_int8,
                           budget=budget), n
    return best[2], best[3]


# --- identity-block kernel ---------------------------------------------------


def _nv_kernel(head_ref, main_ref, tail_ref, w1_ref, w2_ref, w3_ref,
               p1_ref, q1_ref, p2_ref, q2_ref, p3_ref, q3_ref, r_ref,
               out_ref, *, rchunk, wp, n, w, nsteps, out_int8, conv2_impl):
    k = pl.program_id(1)  # grid = (batch tiles, row chunks); rows fastest
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
    "w", "out_int8", "conv2_impl", "chunk_rows", "batch_tile",
    "interpret"))
def bneck_block_nv(x_nv: jax.Array, w1q: jax.Array, w2q: jax.Array,
                   w3q: jax.Array, p1, q1, p2, q2, p3, q3, r, *,
                   w: int, out_int8: bool = True,
                   conv2_impl: str = "dots9",
                   chunk_rows: Optional[int] = None,
                   batch_tile: Optional[int] = None,
                   interpret: bool = False):
    """One identity-shortcut post-act bottleneck block in the NV layout.

    x_nv: [h, wp, N, Cin] int8 carrier (wp from nv_geometry, zero
    W-borders). Weights/affines exactly as nv_common.fold_block_scales.
    Returns [h, wp, N, Cout] int8 (out_int8 — the next block's carrier,
    W-border columns carry garbage that downstream masks ignore) or
    bf16 (run exit; from_nv recovers NHWC).

    The grid tiles (batch, output rows); ``batch_tile`` slices N so the
    row chunk can grow within VMEM (halo fraction 2/R shrinks — distinct
    images never interact, so any tiling is bit-identical). Defaults:
    joint auto-pick (_pick_grid); ``chunk_rows`` alone pins the legacy
    single-batch-tile geometry.
    """
    h, wp, n, cin = x_nv.shape
    _check_nv(wp, w)
    if n % 32 or n & (n - 1):
        raise ValueError(f"N={n} must be a pow2 multiple of the 32-row "
                         f"tile (the W-coordinate masks use bit ops)")
    wdt = w1q.shape[1]
    cout = w3q.shape[1]
    if cout != cin:
        raise ValueError("identity-shortcut block needs Cout == Cin")
    if chunk_rows and batch_tile is None:
        rch, nb = chunk_rows, n
    elif chunk_rows:
        rch, nb = chunk_rows, batch_tile
    elif batch_tile:
        nb = batch_tile
        rch = _pick_chunk(h, wp, nb, cin, wdt, cout, wp,
                          out_int8=out_int8)
    else:
        rch, nb = _pick_grid(h, wp, n, cin, wdt, cout, wp,
                             out_int8=out_int8)
    if h % rch:
        raise ValueError(f"chunk_rows={rch} must divide h={h}")
    if n % nb or nb % 32 or nb & (nb - 1):
        raise ValueError(f"batch_tile={nb} must be a pow2 multiple of "
                         f"32 dividing N={n}")
    nsteps = h // rch
    jsteps = n // nb

    def vec(c):
        return pl.BlockSpec((1, c), lambda j, k: (0, 0),
                            memory_space=pltpu.VMEM)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda j, k, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _nv_kernel, rchunk=rch, wp=wp, n=nb, w=w, nsteps=nsteps,
        out_int8=out_int8, conv2_impl=conv2_impl)
    fvec = lambda v, c: jnp.asarray(v, jnp.float32).reshape(1, c)
    args = [x_nv, x_nv, x_nv, w1q, w2q, w3q,
            fvec(p1, wdt), fvec(q1, wdt), fvec(p2, wdt), fvec(q2, wdt),
            fvec(p3, cout), fvec(q3, cout),
            jnp.float32(r).reshape(1, 1)]
    # three views of the carrier: main chunk + 1-row halo slivers. The
    # sliver indices are clamped EXPLICITLY at the edges (the interpret
    # path clamps out-of-range block indices but the real Mosaic backend
    # faults on them — FAILED_PRECONDITION device error, round 4); the
    # kernel zeroes the clamped slivers' conv1 output at k==0 / k==K-1.
    in_specs = [
        pl.BlockSpec((1, wp, nb, cin),
                     lambda j, k: (jax.lax.max(k * rch - 1, 0), 0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rch, wp, nb, cin), lambda j, k: (k, 0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, wp, nb, cin),
                     lambda j, k: (jax.lax.min(k * rch + rch, h - 1),
                                   0, j, 0),
                     memory_space=pltpu.VMEM),
        full((cin, wdt)), full((9, wdt, wdt)), full((wdt, cout)),
        vec(wdt), vec(wdt), vec(wdt), vec(wdt), vec(cout), vec(cout),
        vec(1),
    ]
    flops = 2 * h * wp * n * (cin * wdt + 9 * wdt * wdt + wdt * cout)
    return pl.pallas_call(
        kernel,
        grid=(jsteps, nsteps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rch, wp, nb, cout),
                               lambda j, k: (k, 0, j, 0),
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


# --- transition-block kernel --------------------------------------------------
#
# The shortcut-transforming bottleneck block (stage entries): conv2 runs at
# stride s (1 or 2) and the shortcut is a 1x1 projection on the
# stride-subsampled input (models/blocks.py:899-905, post-act; reference
# residual_block.py:102-215). In the NV layout stride-2 needs no gather:
# input position (2*oy + dy - 1, NV col 2*ox + dx) for output (oy, ox)
# factors into a ROW-PARITY select (reshape [.., 2, wp/2, 2, N, C], index
# two middle dims) plus a +-N-row shift per dx — all tile-aligned because
# N >= 32 rows of int8. The output wp is wp_in//2 (or nv_geometry of the
# output plane if larger, zero-padded), so carriers stay NV end-to-end and
# the ENTIRE trunk — transitions included — runs int8 between stem and head.


def fold_transition_scales(s_in: float, s2: float, s3: float, s_out,
                           w1s, i1, t1, w2s, i2, t2, w3s, i3, t3, wps):
    """fold_block_scales (nv_common.py) for the transition block:
    same (p1..q3) derivation; the residual term r becomes a per-channel
    projection dequant pp (the post-act proj has NO BatchNorm —
    models/blocks.py:899-903):
        out_f = relu(accP * s_in*wps + acc3 * s3*w3s*i3 + t3), / s_out
          -> pp = s_in * wps / s_out
    """
    from pytorch_ddp_resnet_tpu.ops.pallas.nv_common import (
        fold_block_scales,
    )
    p1, q1, p2, q2, p3, q3, _ = fold_block_scales(
        s_in, s2, s3, s_out, w1s, i1, t1, w2s, i2, t2, w3s, i3, t3)
    pp = jnp.asarray(wps, jnp.float32) * (float(s_in) / float(s_out))
    return p1, q1, p2, q2, p3, q3, pp


def _sel_stride2(src: jax.Array, row_off: int, parity: int, *,
                 nrows: int, wp2: int, n: int) -> jax.Array:
    """From a flattened [>= (row_off + 2*nrows) * 2*wp2 * n, C] row space,
    take rows (row_off + 2*i) for i < nrows and every-other wp-column at
    ``parity``: reshape + two static middle-dim indices, all tile-aligned
    (N >= 32 int8 sublane rows ride untouched)."""
    c = src.shape[-1]
    rowsz = 2 * wp2 * n
    t = src[row_off * rowsz:(row_off + 2 * nrows) * rowsz]
    v = t.reshape(nrows, 2, wp2, 2, n, c)[:, 0, :, parity]
    return v.reshape(nrows * wp2 * n, c)


def _nv_transition_kernel(head_ref, main_ref, tail_ref, w1_ref, w2_ref,
                          w3_ref, wp_ref, p1_ref, q1_ref, p2_ref, q2_ref,
                          p3_ref, q3_ref, pp_ref, out_ref, *, rchunk, wp_in,
                          wp_out, n, w, nsteps, stride, out_int8,
                          conv2_impl):
    """rchunk = OUTPUT rows per grid step. stride==2: main_ref holds the
    2*rchunk input rows of chunk k plus a 1-row head sliver (clamped at
    k==0; no tail sliver — the dy=2 tap's last input row is 2*oh-1 = h-1).
    stride==1: identity-kernel geometry (head + main + tail slivers)."""
    k = pl.program_id(1)  # grid = (batch tiles, row chunks); rows fastest
    cin = main_ref.shape[-1]
    wdt = w1_ref.shape[1]
    cout = w3_ref.shape[1]
    wp2 = wp_in // 2 if stride == 2 else wp_in
    rowsz = wp_in * n
    in_rows = rchunk * stride

    def c1(piece, zero_when):
        v = piece[...].reshape(-1, cin)
        acc = jax.lax.dot_general(v, w1_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        a = _requant(acc, p1_ref, q1_ref)
        if zero_when is not None:
            a = jnp.where(zero_when, jnp.zeros_like(a), a)
        return a

    a1h = c1(head_ref, k == 0)
    a1m = c1(main_ref, None)
    if stride == 1:
        a1t = c1(tail_ref, k == nsteps - 1)
        slab = jnp.concatenate([a1h, a1m, a1t], axis=0)
    else:
        # one zero row group so the dy=2 selection slice stays in range
        # (its odd rows are discarded by the parity select)
        slab = jnp.concatenate(
            [a1h, a1m, jnp.zeros((rowsz, wdt), a1m.dtype)], axis=0)
    slab = jnp.where(_wcol_mask(slab.shape[0], wdt, wp=wp_in, n=n, w=w),
                     slab, jnp.zeros_like(slab))

    m_out = rchunk * wp2 * n
    acc2 = jnp.zeros((m_out, wdt), jnp.int32)
    if stride == 1:
        if conv2_impl == "grouped3":
            wg = w2_ref[:].reshape(3, 3, wdt, wdt)
            for dx in range(3):
                cols = jnp.concatenate(
                    [_shift_rows(slab, (dy * wp_in + dx - 1) * n)[:m_out]
                     for dy in range(3)], axis=1)
                acc2 = acc2 + jax.lax.dot_general(
                    cols, wg[:, dx].reshape(3 * wdt, wdt),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        else:
            for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                         for dx in range(3)):
                lhs = _shift_rows(slab, (dy * wp_in + dx - 1) * n)[:m_out]
                acc2 = acc2 + jax.lax.dot_general(
                    lhs, w2_ref[t], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
    else:
        # tap (dy, dx) -> row offset dy (slab row 2*oy + dy), column
        # parity dx&1, then a ((dx>>1) - 1)*N row shift in the selected
        # space (output image col ox lands at NV col ox+1)
        wg = w2_ref[:].reshape(3, 3, wdt, wdt)
        if conv2_impl == "grouped3":
            for dx in range(3):
                cols = jnp.concatenate(
                    [_sel_stride2(slab, dy, dx & 1, nrows=rchunk,
                                  wp2=wp2, n=n) for dy in range(3)],
                    axis=1)
                acc2 = acc2 + jax.lax.dot_general(
                    _shift_rows(cols, ((dx >> 1) - 1) * n),
                    wg[:, dx].reshape(3 * wdt, wdt),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        else:
            for dy in range(3):
                for dx in range(3):
                    lhs = _shift_rows(
                        _sel_stride2(slab, dy, dx & 1, nrows=rchunk,
                                     wp2=wp2, n=n),
                        ((dx >> 1) - 1) * n)
                    acc2 = acc2 + jax.lax.dot_general(
                        lhs, wg[dy, dx], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    a2 = _requant(acc2, p2_ref, q2_ref)

    acc3 = jax.lax.dot_general(a2, w3_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    # projection shortcut on the stride-subsampled input
    xm = main_ref[...].reshape(in_rows * rowsz, cin)
    if stride == 2:
        # image (2*oy, 2*ox) = main row 2*oy, NV col 2*ox+1 (parity 1)
        xs = _shift_rows(
            _sel_stride2(xm, 0, 1, nrows=rchunk, wp2=wp2, n=n), -n)
    else:
        xs = xm
    accp = jax.lax.dot_general(xs, wp_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    y = acc3.astype(jnp.float32) * p3_ref[:] + q3_ref[:]
    y = jnp.maximum(accp.astype(jnp.float32) * pp_ref[:] + y, 0.0)
    if out_int8:
        o = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    else:
        o = y.astype(out_ref.dtype)
    o = o.reshape(rchunk, wp2, n, cout)
    if wp_out > wp2:
        o = jnp.concatenate(
            [o, jnp.zeros((rchunk, wp_out - wp2, n, cout), o.dtype)],
            axis=1)
    out_ref[...] = o


@functools.partial(jax.jit, static_argnames=(
    "w", "stride", "out_int8", "conv2_impl", "chunk_rows", "batch_tile",
    "interpret"))
def bneck_transition_nv(x_nv: jax.Array, w1q: jax.Array, w2q: jax.Array,
                        w3q: jax.Array, wpq: jax.Array,
                        p1, q1, p2, q2, p3, q3, pp, *,
                        w: int, stride: int = 2, out_int8: bool = True,
                        conv2_impl: str = "grouped3",
                        chunk_rows: Optional[int] = None,
                        batch_tile: Optional[int] = None,
                        interpret: bool = False):
    """One shortcut-transforming post-act bottleneck block in the NV
    layout: conv2 at ``stride``, 1x1 projection shortcut on the
    subsampled input (use_proj=True; models/blocks.py:899-905).

    x_nv: [h, wp_in, N, Cin] int8. wpq: [Cin, Cout] int8 projection.
    pp: [Cout] f32 projection dequant (fold_transition_scales). Returns
    [oh, wp_out, N, Cout] with oh = h/stride, wp_out = max(wp_in/stride,
    nv_geometry(oh, ow)) — a valid NV carrier for the next block.
    """
    h, wp_in, n, cin = x_nv.shape
    _check_nv(wp_in, w)
    if n % 32 or n & (n - 1):
        raise ValueError(f"N={n} must be a pow2 multiple of 32")
    if stride not in (1, 2):
        raise ValueError(f"stride={stride} not supported")
    if stride == 2 and (h % 2 or w % 2):
        raise ValueError(f"stride-2 transition needs even h, w; got "
                         f"{h}x{w}")
    wdt = w1q.shape[1]
    cout = w3q.shape[1]
    if wpq.shape != (cin, cout):
        raise ValueError(f"projection {wpq.shape} != ({cin}, {cout})")
    oh, ow = h // stride, w // stride
    wp2 = wp_in // stride
    wp_out = max(wp2, nv_geometry(oh, ow))
    if chunk_rows and batch_tile is None:
        rch, nb = chunk_rows, n
    elif chunk_rows:
        rch, nb = chunk_rows, batch_tile
    elif batch_tile:
        nb = batch_tile
        rch = _pick_chunk(oh, wp_in, nb, cin, wdt, cout, wp_out,
                          stride=stride, out_int8=out_int8)
    else:
        rch, nb = _pick_grid(oh, wp_in, n, cin, wdt, cout, wp_out,
                             stride=stride, out_int8=out_int8)
    if oh % rch:
        raise ValueError(f"chunk_rows={rch} must divide oh={oh}")
    if n % nb or nb % 32 or nb & (nb - 1):
        raise ValueError(f"batch_tile={nb} must be a pow2 multiple of "
                         f"32 dividing N={n}")
    nsteps = oh // rch
    jsteps = n // nb

    def vec(c):
        return pl.BlockSpec((1, c), lambda j, k: (0, 0),
                            memory_space=pltpu.VMEM)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda j, k, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _nv_transition_kernel, rchunk=rch, wp_in=wp_in, wp_out=wp_out,
        n=nb, w=w, nsteps=nsteps, stride=stride, out_int8=out_int8,
        conv2_impl=conv2_impl)
    fvec = lambda v, c: jnp.asarray(v, jnp.float32).reshape(1, c)
    args = [x_nv, x_nv, x_nv, w1q, w2q, w3q, wpq,
            fvec(p1, wdt), fvec(q1, wdt), fvec(p2, wdt), fvec(q2, wdt),
            fvec(p3, cout), fvec(q3, cout), fvec(pp, cout)]
    s = stride
    # sliver block indices are clamped EXPLICITLY (real Mosaic faults on
    # out-of-range indices; see the identity kernel's note)
    in_specs = [
        pl.BlockSpec((1, wp_in, nb, cin),
                     lambda j, k: (jax.lax.max(k * rch * s - 1, 0),
                                   0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rch * s, wp_in, nb, cin), lambda j, k: (k, 0, j, 0),
                     memory_space=pltpu.VMEM),
        # tail sliver: only consumed at stride 1 (clamped, zeroed there);
        # at stride 2 it aliases the head block and is never read
        pl.BlockSpec((1, wp_in, nb, cin),
                     (lambda j, k: (jax.lax.min(k * rch + rch, h - 1),
                                    0, j, 0)) if s == 1
                     else (lambda j, k: (0, 0, j, 0)),
                     memory_space=pltpu.VMEM),
        full((cin, wdt)), full((9, wdt, wdt)), full((wdt, cout)),
        full((cin, cout)),
        vec(wdt), vec(wdt), vec(wdt), vec(wdt), vec(cout), vec(cout),
        vec(cout),
    ]
    flops = (2 * h * wp_in * n * cin * wdt            # conv1 (all inputs)
             + 2 * oh * wp2 * n * (9 * wdt * wdt      # conv2 (9 taps)
                                   + wdt * cout       # conv3
                                   + cin * cout))     # projection
    return pl.pallas_call(
        kernel,
        grid=(jsteps, nsteps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rch, wp_out, nb, cout),
                               lambda j, k: (k, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (oh, wp_out, n, cout), jnp.int8 if out_int8 else jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(h * wp_in * n * cin
                            + oh * wp_out * n * cout
                            * (1 if out_int8 else 2)
                            + cin * wdt + 9 * wdt * wdt + wdt * cout
                            + cin * cout),
            transcendentals=0),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
