"""Fused int8 bottleneck-block kernel for ImageNet geometry (NHWC family).

One pallas_call runs an ENTIRE identity-shortcut bottleneck residual block
(reference residual_block.py:102-215; models/blocks.py
BottleneckResidualBlock, post-act v1 ordering):

    conv1 1x1 (Cin->W) -> BN -> relu
    conv2 3x3/s1 SAME (W->W) -> BN -> relu
    conv3 1x1 (W->Cout) -> BN
    out = relu(residual + .)

with every conv an s8 x s8 -> s32 MXU dot (the v5e 2x int8 mode), every
BN eval affine / relu / requantization folded into in-VMEM epilogues, and
the residual carrier itself INT8: consecutive eligible blocks hand each
other quantized activations, so a block's HBM traffic is its int8 input
+ int8 output + weights — nothing else.

Why this exists (BASELINE.md "Int8 serving, bottleneck family"): at
ImageNet geometry the bottleneck blocks are HBM-bound on their bf16
residual carriers (205 MB/block at ResNet-50 stage 1, b128); XLA int8
dots alone measured 0.99x end-to-end because the carrier bytes — not the
MXU — are the bottleneck, and the lane-layout kernels cannot express
these geometries at all (HW 49-factors force whole-image 6272-lane
tiles). This kernel attacks the bytes and the FLOPs together, the design
ROADMAP #9 scoped: NHWC-native tiling, int8 carriers, scales that never
leave the kernel.

Layout: "padded-flat". An [h, w] image plane is stored as a flat
[M, C] tile, M = rows * stride, where stride is the smallest power of
two >= w + 2 and rows = h + 2 (+ minimal padding so M % 32 == 0, the
int8 sublane tile). Pixel (y, x) lives at flat row (y+1)*stride + (x+1);
the one-pixel SAME-padding border is real zeros in the layout. The
payoff: a 3x3 tap at offset (dy, dx) is a STATIC 1-D shift of the flat
tile by (dy-1)*stride + (dx-1) — no halo DMA, no lane gathers, no
masking at the edges (the shifted-in values are the border zeros), and
the [M, C] <-> [rows, stride, C] views are layout-free because stride
is a multiple of the sublane tile or divides it exactly. Pad positions
compute garbage through the 1x1 dots; the single place padding can leak
into real outputs is conv2's taps, so the kernel zero-masks exactly one
tensor (conv1's quantized output) and nothing else.

Scales: per-output-channel int8 weights, per-tensor static activation
scales (models/quantize.py calibration). All dequant/BN/requant factors
are folded host-side into one (p, q) f32 vector pair per conv:
    a_next = clip(round(relu(acc * p + q)))         (conv1, conv2)
    out    = relu(x_q * r + acc3 * p3 + q3)         (conv3 + residual)
so the kernel body is three dots, nine shifted tap dots, and three
fused elementwise epilogues.

Scope: serving (models/quantize.py) first; the QAT training forward can
reuse the same kernel shape-for-shape. Reference parity target: exact
block semantics of BottleneckResidualBlock.apply(train=False) at the
quantized point (tests/test_bneck_kernel.py asserts bit-equality with a
pure-jnp integer mirror and closeness to the float block).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --- padded-flat geometry ---------------------------------------------------


def flat_geometry(h: int, w: int) -> Tuple[int, int, int]:
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
    slots). Pure XLA; runs once per run entry, fused with the entry
    quantization."""
    n, h, w, c = x_nhwc.shape
    rows, stride, m = flat_geometry(h, w)
    padded = jnp.pad(x_nhwc, ((0, 0), (1, rows - 1 - h),
                              (1, stride - 1 - w), (0, 0)))
    return padded.reshape(n, m, c)


def unpad_flat(x_flat: jax.Array, h: int, w: int) -> jax.Array:
    """[N, M, C] padded-flat -> [N, h, w, C]. Pure XLA; once per run
    exit."""
    n, m, c = x_flat.shape
    rows, stride, m2 = flat_geometry(h, w)
    if m != m2:
        raise ValueError(f"flat M={m} does not match {h}x{w} -> {m2}")
    return x_flat.reshape(n, rows, stride, c)[:, 1:1 + h, 1:1 + w, :]


def quantize_pad_flat(x_nhwc: jax.Array, scale: float) -> jax.Array:
    """Entry quantization + padded-flat packing in one XLA fusion.
    Multiplies by the inverse scale — bit-identical to the kernel's
    in_mode="nhwc" entry (x/s and x*(1/s) differ in f32)."""
    q = jnp.clip(jnp.round(x_nhwc.astype(jnp.float32) * (1.0 / scale)),
                 -127.0, 127.0).astype(jnp.int8)
    return pad_flat(q)


def pack_w2(w_hwio: jax.Array) -> jax.Array:
    """3x3 HWIO [3, 3, W, W] -> [9, W, W], tap-major (dy, dx)."""
    kh, kw, wi, wo = w_hwio.shape
    if (kh, kw) != (3, 3):
        raise ValueError("pack_w2 expects a 3x3 kernel")
    return w_hwio.reshape(9, wi, wo)


# --- the kernel --------------------------------------------------------------


def _shift_flat(a: jax.Array, o: int) -> jax.Array:
    """out[i] = a[i + o], zeros shifted in. Static slice + concat (no
    wraparound semantics to reason about; Mosaic lowers the misaligned
    slice to a sublane shift)."""
    if o == 0:
        return a
    z = jnp.zeros((abs(o), a.shape[1]), a.dtype)
    if o > 0:
        return jnp.concatenate([a[o:], z], axis=0)
    return jnp.concatenate([z, a[:o]], axis=0)


def _image_mask(m: int, width: int, *, h: int, w: int, stride: int):
    """[m, width] bool: True at real image positions of the padded-flat
    plane (row in [1, 1+h), col in [1, 1+w)); power-of-two bit ops only."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (m, width), 0)
    col = jnp.bitwise_and(idx, stride - 1)
    row = jax.lax.shift_right_logical(idx, int(stride).bit_length() - 1)
    return ((row >= 1) & (row <= h) & (col >= 1) & (col <= w))


def _requant(acc, p_ref, q_ref):
    """clip(round(relu(acc * p + q))) -> int8 (p, q fold dequant scale,
    BN eval affine, and the next conv's input scale; see module doc)."""
    y = jnp.maximum(acc.astype(jnp.float32) * p_ref[:] + q_ref[:], 0.0)
    return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def _bneck_kernel(x_ref, w1_ref, w2_ref, w3_ref, p1_ref, q1_ref,
                  p2_ref, q2_ref, p3_ref, q3_ref, r_ref, qs_ref, out_ref, *,
                  h, w, rows, stride, in_mode, out_mode, conv2_impl):
    wdt = w1_ref.shape[1]
    m = rows * stride
    if in_mode == "nhwc":
        # run entry INSIDE the kernel: quantize + padded-flat packing are
        # VMEM-local (an XLA-side entry costs a full quantize pass plus a
        # pad clone plus a layout copy into the custom call — measured
        # ~1.5 ms/run at ResNet-50 stage 1, BASELINE.md)
        xn = x_ref[0].astype(jnp.float32) * qs_ref[0, 0]   # [h, w, Cin]
        xq = jnp.clip(jnp.round(xn), -127.0, 127.0).astype(jnp.int8)
        x = jnp.pad(xq, ((1, rows - 1 - h), (1, stride - 1 - w),
                         (0, 0))).reshape(m, -1)
    else:
        x = x_ref[0]                                       # [M, Cin] s8

    # conv1 (1x1): [M, Cin] @ [Cin, W] -> s32
    acc1 = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    a1 = _requant(acc1, p1_ref, q1_ref)                       # [M, W] s8
    # the ONE mask in the block: conv2's taps must see zeros at pad slots
    a1 = jnp.where(_image_mask(m, a1.shape[1], h=h, w=w, stride=stride),
                   a1, jnp.zeros_like(a1))

    # conv2 (3x3 SAME) on the flat tile
    acc2 = jnp.zeros((m, wdt), jnp.int32)
    if conv2_impl == "grouped3":
        # dy-grouped K-packing (measured 2x over nine narrow tap dots at
        # width 64, tools/bench_bneck.py): the three dy-shifts are
        # whole-row moves (offset = +-stride, sublane-tile-aligned for
        # stride >= 32), so packing them on K is one cheap concat; each
        # dx then costs one +-1 sublane shift of the packed tile and one
        # K=3W dot — 3 wide dots instead of 9 narrow ones.
        colsy = jnp.concatenate(
            [_shift_flat(a1, -stride), a1, _shift_flat(a1, stride)],
            axis=1)                                           # [M, 3W]
        wg = w2_ref[:].reshape(3, 3, wdt, wdt)                # [dy,dx,i,o]
        for dx in range(3):
            acc2 = acc2 + jax.lax.dot_general(
                _shift_flat(colsy, dx - 1),
                wg[:, dx].reshape(3 * wdt, wdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    else:  # "dots9": nine shifted tap dots
        for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                     for dx in range(3)):
            o = (dy - 1) * stride + (dx - 1)
            acc2 = acc2 + jax.lax.dot_general(
                _shift_flat(a1, o), w2_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    a2 = _requant(acc2, p2_ref, q2_ref)                       # [M, W] s8

    # conv3 (1x1) + BN affine + residual + relu
    acc3 = jax.lax.dot_general(
        a2, w3_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc3.astype(jnp.float32) * p3_ref[:] + q3_ref[:]
    y = jnp.maximum(x.astype(jnp.float32) * r_ref[0, 0] + y, 0.0)
    if out_mode == "flat_int8":
        out_ref[0] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    elif out_mode == "flat_bf16":
        out_ref[0] = y.astype(out_ref.dtype)
    else:  # "nhwc_bf16": run exit inside the kernel (see in_mode note)
        yv = y.reshape(rows, stride, -1)[1:1 + h, 1:1 + w, :]
        out_ref[0] = yv.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "in_mode",
                                             "out_mode", "conv2_impl",
                                             "interpret"))
def bneck_block_int8(x_in: jax.Array, w1q: jax.Array, w2q: jax.Array,
                     w3q: jax.Array, p1, q1, p2, q2, p3, q3, r,
                     s_in=None, *, h: int, w: int,
                     in_mode: str = "flat_int8",
                     out_mode: str = "flat_int8",
                     conv2_impl: str = "grouped3",
                     interpret: bool = False):
    """One identity-shortcut post-act bottleneck block, fully fused.

    x_in: the carrier — [N, M, Cin] int8 padded-flat (``in_mode=
    "flat_int8"``, mid-run) or [N, h, w, Cin] float (``in_mode="nhwc"``,
    run entry: quantization by ``s_in`` and padded-flat packing happen
    inside the kernel). w1q [Cin, W], w2q [9, W, W] (pack_w2),
    w3q [W, Cout] — int8 per-output-channel quantized; Cout == Cin
    (identity shortcut). p1/q1, p2/q2 [W] f32 and p3/q3 [Cout] f32:
    folded epilogue affines (see module doc). r: python float — residual
    rescale s_in / s_out (s_out = 1 when emitting bf16).

    out_mode: "flat_int8" (mid-run carrier [N, M, Cout] int8),
    "flat_bf16" ([N, M, Cout] bf16; unpad_flat recovers NHWC), or
    "nhwc_bf16" (run exit [N, h, w, Cout] bf16, unpadded in-kernel).

    Keeping entry/exit INSIDE the kernel matters more than it looks:
    the XLA-side equivalents cost ~3.2 ms/batch at ResNet-50 b128 —
    quantize+pad fusions, slice-outs, and layout copies at the custom
    call boundary — which is more than the fused kernels save
    (BASELINE.md round 4).
    """
    rows, stride, m = flat_geometry(h, w)
    if in_mode == "flat_int8":
        n, m_in, cin = x_in.shape
        if m_in != m:
            raise ValueError(f"carrier M={m_in} != {h}x{w} -> {m}")
    elif in_mode == "nhwc":
        n, h_in, w_in, cin = x_in.shape
        if (h_in, w_in) != (h, w):
            raise ValueError(f"input {x_in.shape} != {h}x{w}")
        if s_in is None:
            raise ValueError("in_mode='nhwc' needs the entry scale s_in")
    else:
        raise ValueError(f"unknown in_mode {in_mode!r}")
    wdt = w1q.shape[1]
    cout = w3q.shape[1]
    if cout != cin:
        raise ValueError("identity-shortcut block needs Cout == Cin")
    if conv2_impl not in ("grouped3", "dots9"):
        raise ValueError(f"unknown conv2_impl {conv2_impl!r}")
    if out_mode not in ("flat_int8", "flat_bf16", "nhwc_bf16"):
        raise ValueError(f"unknown out_mode {out_mode!r}")

    def vec(c):
        return pl.BlockSpec((1, c), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_bneck_kernel, h=h, w=w, rows=rows,
                               stride=stride, in_mode=in_mode,
                               out_mode=out_mode, conv2_impl=conv2_impl)
    fvec = lambda v, c: jnp.asarray(v, jnp.float32).reshape(1, c)
    args = [x_in, w1q, w2q, w3q,
            fvec(p1, wdt), fvec(q1, wdt), fvec(p2, wdt), fvec(q2, wdt),
            fvec(p3, cout), fvec(q3, cout),
            jnp.float32(r).reshape(1, 1),
            jnp.float32(0.0 if s_in is None else 1.0 / s_in).reshape(1, 1)]
    in_spec_x = (
        pl.BlockSpec((1, m, cin), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        if in_mode == "flat_int8" else
        pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM))
    in_specs = [
        in_spec_x,
        full((cin, wdt)), full((9, wdt, wdt)), full((wdt, cout)),
        vec(wdt), vec(wdt), vec(wdt), vec(wdt), vec(cout), vec(cout),
        vec(1), vec(1),
    ]
    if out_mode == "nhwc_bf16":
        out_spec = pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, h, w, cout), jnp.bfloat16)
    else:
        out_spec = pl.BlockSpec((1, m, cout), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (n, m, cout),
            jnp.int8 if out_mode == "flat_int8" else jnp.bfloat16)
    flops = 2 * n * m * (cin * wdt + 9 * wdt * wdt + wdt * cout)
    in_bytes = n * m * cin * (1 if in_mode == "flat_int8" else 2)
    out_bytes = n * (h * w if out_mode == "nhwc_bf16" else m) * cout \
        * (1 if out_mode == "flat_int8" else 2)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(in_bytes + out_bytes
                            + cin * wdt + 9 * wdt * wdt + wdt * cout),
            transcendentals=0),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# --- host-side scale folding -------------------------------------------------


def fold_block_scales(s_in: float, s2: float, s3: float, s_out,
                      w1s, i1, t1, w2s, i2, t2, w3s, i3, t3):
    """Fold per-tensor activation scales, per-channel weight scales, and
    BN eval affines into the kernel's (p1,q1,p2,q2,p3,q3,r) vectors.

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
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    s_out = float(s_out)
    p1 = f32(w1s) * f32(i1) * (s_in / s2)
    q1 = f32(t1) / s2
    p2 = f32(w2s) * f32(i2) * (s2 / s3)
    q2 = f32(t2) / s3
    p3 = f32(w3s) * f32(i3) * (s3 / s_out)
    q3 = f32(t3) / s_out
    return p1, q1, p2, q2, p3, q3, float(s_in) / s_out
