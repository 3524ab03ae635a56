"""Pallas TPU kernel: lane-packed 3x3 SAME conv for narrow-channel stages.

Why this exists (BASELINE.md "Step-time physics"): XLA:TPU lowers the WRN
convs to matmuls whose *output lane* dimension is Cout, so the 160-channel
stage pads 160 -> 256 lanes (62.5% MXU utilization) and the 320-channel
stage 320 -> 384 (83%); the measured equal-FLOP stage times are
2.0 : 1.25 : 1. Every cheaper fix was measured dead (int8-via-XLA does not
engage the 2x MXU mode; composed Winograd is -8x because its transforms
live on the VPU). This kernel attacks the padding directly with a layout
the XLA lowering cannot choose (VERDICT round 2, next-round #1, design b):

- **Spatial in lanes, channels in sublanes.** Activations are [C, B*H*W].
  The matmul is out[Cout, S] = W[Cout, K] @ patches[K, S]: the output lane
  dim S is batch*spatial — always a multiple of 128 — so Cout (160/320/640,
  all multiples of the 16-sublane bf16 tile) pads nothing.
- **Taps grouped to lane-align the contraction.** The 9 taps of a 3x3 are
  processed in groups of g = 640 // Cin taps (4 for 160ch, 2 for 320ch,
  1 for 640ch), so each accumulated matmul contracts exactly K = 640 lanes
  with zero padding; only the remainder group (1 tap at 160ch: K 160->256;
  1 tap at 320ch: K 320->384) pads. Padded-lane utilization:
      160ch: 1440/1536 = 93.75%   (XLA: 62.5%)
      320ch: 2880/2944 = 97.8%    (XLA: 83%)
      640ch: 5760/5760 = 100%     (XLA: 100%)
- **Shifted-tap patches from lane rolls.** A tap's patch is a roll of the
  flattened [C, B*H*W] tile by (dh-1)*W + (dw-1) lanes plus an
  out-of-image mask (also covers cross-image contamination, because a
  rolled source position lies in a neighboring image exactly when the
  decoded (h,w) source is out of range). VPU cost: 9 masked copies of the
  tile vs 9*Cin MACs/element on the MXU — ~1%.

Scope: stride-1 3x3 SAME convs (the FLOP-dominant shapes; the network's
two stride-2 transitions and 1x1 projections stay on XLA). All three
derivatives are covered: forward (conv3x3_lanes), input gradient (the
same kernel with rot180/transposed weights, pack_weights_dgrad), and
weight gradient (conv3x3_wgrad_lanes — dy @ patches^T with the same tap
grouping, so the output lane dim is 640-aligned per group too). The
microbenchmark (tools/bench_conv.py) decides whether a model-wide C-major
layout integration is worth it; see BASELINE.md for verdict and numbers.

Reference parity target: semantics of jax.lax.conv_general_dilated NHWC
'SAME' (itself the analog of the reference's nn.Conv2d stride-1 blocks,
residual_block.py); equality is asserted in tests/test_pallas_conv.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tap_groups(cin: int):
    """Group the 9 taps so each group's contraction K = len(group)*Cin is
    lane-aligned (640 = 5*128 for the WRN widths); remainder group last."""
    taps = [(dh, dw) for dh in range(3) for dw in range(3)]
    g = max(1, 640 // cin) if cin <= 640 else 1
    return [taps[i:i + g] for i in range(0, 9, g)]


def _pick_tile(hw: int, n: int, c: int = 160, max_tile: int = 2048) -> int:
    """Lane-tile size: a multiple of the per-image spatial size (so image
    boundaries never cross a tile and rolls need no halo) that is also a
    multiple of 128 and divides the total. The target shrinks with the
    channel count: VMEM holds x/out/patch-scratch/f32-acc tiles all
    proportional to c*tile, and c=320 at tile 2048 blows the 16MB scoped
    VMEM limit on v5e (measured: 19.2M > 16M); c*tile <= 160*2048 fits
    with room. max_tile lifts the cap for callers whose per-tile working
    set is int8 (the quantized training kernels)."""
    target = max(128, min(max_tile, (160 * 2048) // max(c, 1)))
    t = hw
    while t < target and (t * 2) <= n and n % (t * 2) == 0:
        t *= 2
    while t % 128 != 0:
        if t * 2 > n or n % (t * 2) != 0:
            raise ValueError(
                f"cannot reach a 128-multiple lane tile from HW={hw}, N={n}")
        t *= 2
    if t > 2 * target:
        # Whole-image alignment overshot the VMEM budget: at ImageNet
        # geometries (HW = 3136/784/196/49, all with a 49 factor) the
        # smallest 128-multiple image-aligned tile is 6272 lanes, which
        # blows the 16MB scoped-VMEM limit at c >= 128 (measured on v5e:
        # c=128 tile 6272 -> 16.56M > 16M compile-time OOM). CIFAR
        # geometries (power-of-2 HW) never overshoot, so this guard only
        # rejects shapes that could not compile or run well anyway;
        # callers treat the raise as "not lane-eligible" and fall back.
        raise ValueError(
            f"image-aligned lane tile {t} exceeds the VMEM budget for "
            f"c={c} (target {target}): HW={hw} alignment would overflow "
            f"the 16MB scoped VMEM")
    return t


def _accumulate_taps(x_ref, w_ref, patch_ref, *, cin, h, w_img, tile,
                     groups):
    """Shared tap-grouped accumulation: returns the conv accumulator
    (s32 for int8 inputs — the MXU's 2x mode — f32 otherwise)."""
    hw = h * w_img
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    pos = lane % hw
    hh = pos // w_img
    ww = pos % w_img

    acc = None
    col = 0
    for taps in groups:
        for j, (dh, dw) in enumerate(taps):
            shift = (dh - 1) * w_img + (dw - 1)
            # patch[p] = x[p + shift]  (source h+dh-1, w+dw-1 for output p).
            # Static jnp.roll (slice+concat), NOT pltpu.roll: the latter
            # lowers to tpu.dynamic_rotate, unimplemented for bf16 on the
            # real v5e backend (probed 2026-08-17; all of jnp.roll/concat/
            # f32-rotate compile and are exact). The center tap must skip
            # the roll: a zero shift emits a zero-width slice that Mosaic
            # rejects ("vector types must have positive constant sizes").
            rolled = (x_ref[:] if shift == 0
                      else jnp.roll(x_ref[:], -shift, axis=1))
            src_h = hh + (dh - 1)
            src_w = ww + (dw - 1)
            mask = ((src_h >= 0) & (src_h < h)
                    & (src_w >= 0) & (src_w < w_img))
            patch_ref[j * cin:(j + 1) * cin, :] = jnp.where(
                mask, rolled, jnp.zeros_like(rolled))
        kg = len(taps) * cin
        wg = w_ref[:, col:col + kg]
        # int8 inputs accumulate in s32 and engage the MXU's int8 mode
        # (measured 336 T/s vs 146 bf16 on square matmuls, v5e —
        # tools/bench_int8_mxu.py); float inputs accumulate in f32.
        acc_t = (jnp.int32 if x_ref.dtype == jnp.int8 else jnp.float32)
        contrib = jax.lax.dot_general(
            wg, patch_ref[0:kg, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_t)
        acc = contrib if acc is None else acc + contrib
        col += kg
    return acc


def _conv_kernel(x_ref, w_ref, out_ref, patch_ref, *, cin, cout, h, w_img,
                 tile, groups):
    acc = _accumulate_taps(x_ref, w_ref, patch_ref, cin=cin, h=h,
                           w_img=w_img, tile=tile, groups=groups)
    out_ref[:] = acc.astype(out_ref.dtype)


def pack_weights(w_hwio: jax.Array) -> jax.Array:
    """[3, 3, Cin, Cout] (lax.conv HWIO) -> [Cout, 9*Cin], taps row-major
    in (dh, dw) — the kernel's contraction order."""
    kh, kw, cin, cout = w_hwio.shape
    if (kh, kw) != (3, 3):
        raise ValueError("pack_weights expects a 3x3 kernel.")
    # -> [dh, dw, cin, cout] -> [cout, dh*dw*cin]
    return jnp.transpose(w_hwio, (3, 0, 1, 2)).reshape(cout, 9 * cin)


@functools.partial(jax.jit, static_argnames=("h", "w_img", "interpret"))
def conv3x3_lanes(x_cs: jax.Array, w_packed: jax.Array, *, h: int,
                  w_img: int, interpret: bool = False) -> jax.Array:
    """Stride-1 SAME 3x3 conv in the lane-packed layout.

    x_cs: [Cin, N] with N = B*H*W (image-major flattening, whole images).
    w_packed: [Cout, 9*Cin] from pack_weights.
    Returns [Cout, N] in x_cs.dtype — except int8 inputs, which return the
    raw s32 accumulator (the quantized-serving caller applies its own
    requantization scales).
    """
    cin, n = x_cs.shape
    cout = w_packed.shape[0]
    if w_packed.shape[1] != 9 * cin:
        raise ValueError(f"weights {w_packed.shape} vs Cin {cin}")
    hw = h * w_img
    if n % hw != 0:
        raise ValueError(f"N={n} not a multiple of H*W={hw}")
    out_dtype = jnp.int32 if x_cs.dtype == jnp.int8 else x_cs.dtype
    tile = _pick_tile(hw, n, max(cin, cout))
    groups = _tap_groups(cin)
    gmax = max(len(g) for g in groups)
    kernel = functools.partial(
        _conv_kernel, cin=cin, cout=cout, h=h, w_img=w_img, tile=tile,
        groups=groups)
    return pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((cin, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 9 * cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cout, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((gmax * cin, tile), x_cs.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * cout * 9 * cin * n,
            bytes_accessed=(cin * n + cout * n) * x_cs.dtype.itemsize
            + cout * 9 * cin * w_packed.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x_cs, w_packed)


def _requant_kernel(x_ref, w_ref, scale_ref, shift_ref, *rest, cin, cout,
                    h, w_img, tile, groups, relu, inv_out_scale, has_res,
                    has_dual):
    """Conv + fused requantization epilogue, all in VMEM:
        y = acc * scale[Cout] + shift[Cout] (+ res)
        if relu: y = max(y, 0)
        out = s8(clip(round(y * inv_out_scale)))  or  bf16(y)
        out2 = s8(clip(round(max(y*sb + tb, 0))))          (dual mode)
    The epilogue is the whole point: without it the s32 accumulator makes a
    full HBM round trip per conv (4 B/elem out + 4 B/elem back in), which
    was measured to cancel the int8 MXU win end-to-end (BASELINE.md
    "Int8 serving"). Dual mode additionally emits the NEXT conv's
    quantized input (the next block's norm1 affine and input scale folded
    into sb/tb), removing the per-block XLA entry-quantize pass."""
    rest = list(rest)
    res_ref = rest.pop(0) if has_res else None
    sb_ref = rest.pop(0) if has_dual else None
    tb_ref = rest.pop(0) if has_dual else None
    if has_dual:
        out_ref, out2_ref, patch_ref = rest
    else:
        (out_ref, patch_ref), out2_ref = rest, None
    acc = _accumulate_taps(x_ref, w_ref, patch_ref, cin=cin, h=h,
                           w_img=w_img, tile=tile, groups=groups)
    y = acc.astype(jnp.float32) * scale_ref[:] + shift_ref[:]
    if has_res:
        y = y + res_ref[:].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    if inv_out_scale is not None:
        q = jnp.clip(jnp.round(y * inv_out_scale), -127.0, 127.0)
        out_ref[:] = q.astype(jnp.int8)
    else:
        out_ref[:] = y.astype(out_ref.dtype)
    if has_dual:
        g = jnp.maximum(y * sb_ref[:] + tb_ref[:], 0.0)
        out2_ref[:] = jnp.clip(jnp.round(g), -127.0, 127.0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=(
    "h", "w_img", "relu", "inv_out_scale", "interpret"))
def conv3x3_lanes_requant(x_q: jax.Array, w_q: jax.Array, scale: jax.Array,
                          shift: jax.Array, res=None, dual=None, *, h: int,
                          w_img: int, relu: bool = False, inv_out_scale=None,
                          interpret: bool = False):
    """Int8 stride-1 SAME 3x3 conv with the requantization epilogue fused
    into the kernel (quantized serving, models/quantize.py).

    x_q: [Cin, N] int8; w_q: [Cout, 9*Cin] int8 (pack_weights of the
    quantized HWIO kernel). scale/shift: [Cout] f32 — the dequant scale
    (activation_scale * per-channel weight scale, with any following BN
    eval affine folded in) and additive shift. res: optional [Cout, N]
    bf16 residual added before the relu. inv_out_scale: static float —
    when given, the output is the NEXT conv's quantized input (int8,
    symmetric per-tensor); when None the output is bf16.

    dual: optional (sb, tb) pair of [Cout] f32 — bf16-output mode only;
    emits a SECOND output s8(clip(round(max(y*sb + tb, 0)))) — the next
    block's quantized conv1 input with its norm1 affine and input scale
    pre-folded into sb/tb — and returns (carrier_bf16, next_q_s8).
    """
    cin, n = x_q.shape
    cout = w_q.shape[0]
    if w_q.shape[1] != 9 * cin:
        raise ValueError(f"weights {w_q.shape} vs Cin {cin}")
    hw = h * w_img
    if n % hw != 0:
        raise ValueError(f"N={n} not a multiple of H*W={hw}")
    if dual is not None and inv_out_scale is not None:
        raise ValueError("dual output requires the bf16-carrier mode")
    tile = _pick_tile(hw, n, max(cin, cout))
    groups = _tap_groups(cin)
    gmax = max(len(g) for g in groups)
    out_dtype = jnp.int8 if inv_out_scale is not None else jnp.bfloat16
    inv = float(inv_out_scale) if inv_out_scale is not None else None
    kernel = functools.partial(
        _requant_kernel, cin=cin, cout=cout, h=h, w_img=w_img, tile=tile,
        groups=groups, relu=relu, inv_out_scale=inv, has_res=res is not None,
        has_dual=dual is not None)

    def vec():
        return pl.BlockSpec((cout, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((cin, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((cout, 9 * cin), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        vec(), vec(),
    ]
    args = [x_q, w_q, scale.reshape(cout, 1).astype(jnp.float32),
            shift.reshape(cout, 1).astype(jnp.float32)]
    if res is not None:
        in_specs.append(pl.BlockSpec((cout, tile), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(res.astype(jnp.bfloat16))
    if dual is not None:
        sb, tb = dual
        in_specs += [vec(), vec()]
        args += [sb.reshape(cout, 1).astype(jnp.float32),
                 tb.reshape(cout, 1).astype(jnp.float32)]
    tile_spec = pl.BlockSpec((cout, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out_specs = tile_spec if dual is None else (tile_spec, tile_spec)
    out_shape = jax.ShapeDtypeStruct((cout, n), out_dtype)
    if dual is not None:
        out_shape = (out_shape, jax.ShapeDtypeStruct((cout, n), jnp.int8))
    return pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((gmax * cin, tile), x_q.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * cout * 9 * cin * n,
            bytes_accessed=(cin * n
                            + cout * n * (1 if inv is not None else 2)
                            + (cout * n * 2 if res is not None else 0)
                            + (cout * n if dual is not None else 0)
                            + cout * 9 * cin),
            transcendentals=0),
        interpret=interpret,
    )(*args)


def pack_weights_dgrad(w_hwio: jax.Array) -> jax.Array:
    """Weights for the INPUT gradient of a stride-1 SAME 3x3 conv, packed
    for conv3x3_lanes: dx = conv(dy, rot180(W) with in/out channels
    swapped), i.e. W'[dh, dw, co, ci] = W[2-dh, 2-dw, ci, co]. The dgrad
    is then the SAME lane-packed forward kernel applied to dy."""
    w_rot = jnp.transpose(w_hwio[::-1, ::-1], (0, 1, 3, 2))  # [3,3,Cout,Cin]
    return pack_weights(w_rot)


def _wgrad_kernel(x_ref, dy_ref, out_ref, patch_ref, *, cin, h, w_img,
                  tile, taps, n_tiles):
    """One tap-group's dW block: dW[Cout, Kg] += dy_tile @ patches_tile^T,
    accumulated across the (minor) spatial-tile grid dimension."""
    s = pl.program_id(0)
    hw = h * w_img
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    pos = lane % hw
    hh = pos // w_img
    ww = pos % w_img

    for j in range(patch_ref.shape[0] // cin):
        if j < len(taps):
            dh, dw = taps[j]
            shift = (dh - 1) * w_img + (dw - 1)
            rolled = (x_ref[:] if shift == 0  # see _conv_kernel
                      else jnp.roll(x_ref[:], -shift, axis=1))
            src_h = hh + (dh - 1)
            src_w = ww + (dw - 1)
            mask = ((src_h >= 0) & (src_h < h)
                    & (src_w >= 0) & (src_w < w_img))
            patch_ref[j * cin:(j + 1) * cin, :] = jnp.where(
                mask, rolled, jnp.zeros_like(rolled))
        else:
            # remainder group: zero the unused rows so the padded dW
            # columns come out zero instead of garbage
            patch_ref[j * cin:(j + 1) * cin, :] = jnp.zeros(
                (cin, tile), patch_ref.dtype)

    contrib = jax.lax.dot_general(
        dy_ref[:], patch_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),  # contract lanes (S)
        preferred_element_type=jnp.float32)

    @pl.when(s == 0)
    def _init():
        out_ref[:] = contrib

    @pl.when(s > 0)
    def _acc():
        out_ref[:] = out_ref[:] + contrib


@functools.partial(jax.jit, static_argnames=("h", "w_img", "interpret"))
def conv3x3_wgrad_lanes(x_cs: jax.Array, dy_cs: jax.Array, *, h: int,
                        w_img: int, interpret: bool = False) -> jax.Array:
    """Weight gradient of the stride-1 SAME 3x3 conv in the lane layout.

    x_cs: [Cin, N]; dy_cs: [Cout, N] (N = B*H*W, whole images).
    Returns dW as [3, 3, Cin, Cout] (HWIO, matching lax.conv's cotangent).

    MXU mapping: per tap-group, dW_block[Cout, Kg<=640] = dy @ patches^T —
    M = Cout (sublanes), K = spatial (lanes, 128-aligned), N = Kg lanes
    (640 exact for every WRN width; only the remainder group pads).
    """
    cin, n = x_cs.shape
    cout = dy_cs.shape[0]
    hw = h * w_img
    if n % hw != 0 or dy_cs.shape[1] != n:
        raise ValueError(f"bad shapes x={x_cs.shape} dy={dy_cs.shape}")
    tile = _pick_tile(hw, n, max(cin, cout))
    groups = _tap_groups(cin)
    gmax = max(len(g) for g in groups)
    n_tiles = n // tile

    blocks = []
    for taps in groups:
        kernel = functools.partial(
            _wgrad_kernel, cin=cin, h=h, w_img=w_img, tile=tile, taps=taps,
            n_tiles=n_tiles)
        blk = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((cin, tile), lambda s: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cout, tile), lambda s: (0, s),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((cout, gmax * cin), lambda s: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((cout, gmax * cin), jnp.float32),
            scratch_shapes=[pltpu.VMEM((gmax * cin, tile), x_cs.dtype)],
            cost_estimate=pl.CostEstimate(
                flops=2 * cout * len(taps) * cin * n,
                bytes_accessed=(cin * n + cout * n) * x_cs.dtype.itemsize
                + cout * gmax * cin * 4,
                transcendentals=0),
            interpret=interpret,
        )(x_cs, dy_cs)
        blocks.append(blk[:, :len(taps) * cin])
    dw_flat = jnp.concatenate(blocks, axis=1)      # [Cout, 9*Cin]
    # [Cout, dh, dw, Cin] -> HWIO [dh, dw, Cin, Cout]
    return jnp.transpose(dw_flat.reshape(cout, 3, 3, cin), (1, 2, 3, 0))


def nhwc_to_lanes(x_nhwc: jax.Array) -> Tuple[jax.Array, int, int]:
    """[B, H, W, C] -> ([C, B*H*W], H, W). The transpose XLA inserts here is
    the integration cost a model-wide C-major layout would amortize away."""
    b, h, w, c = x_nhwc.shape
    return jnp.transpose(x_nhwc, (3, 0, 1, 2)).reshape(c, b * h * w), h, w


def lanes_to_nhwc(y_cs: jax.Array, b: int, h: int, w: int) -> jax.Array:
    c = y_cs.shape[0]
    return jnp.transpose(y_cs.reshape(c, b, h, w), (1, 2, 3, 0))


def conv3x3_nhwc(x_nhwc: jax.Array, w_hwio: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """NHWC convenience wrapper (includes the layout transposes — use for
    correctness checks and for measuring integration cost)."""
    b, h, w, _ = x_nhwc.shape
    x_cs, _, _ = nhwc_to_lanes(x_nhwc)
    y = conv3x3_lanes(x_cs, pack_weights(w_hwio), h=h, w_img=w,
                      interpret=interpret)
    return lanes_to_nhwc(y, b, h, w)


# --- differentiable model-facing entry point ---------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_same(x_nhwc: jax.Array, w_hwio: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """Differentiable stride-1 SAME 3x3 conv, NHWC x HWIO -> NHWC, with all
    three derivatives on the lane-packed Pallas kernels (fwd + dgrad via
    conv3x3_lanes, wgrad via conv3x3_wgrad_lanes). Drop-in for the eligible
    lax.conv_general_dilated calls in models/layers.py Conv.apply; gated by
    the ``use_pallas_conv`` config flag."""
    return conv3x3_nhwc(x_nhwc, w_hwio, interpret=interpret)


def _conv3x3_same_fwd(x_nhwc, w_hwio, interpret):
    b, h, w, _ = x_nhwc.shape
    x_cs, _, _ = nhwc_to_lanes(x_nhwc)
    y = conv3x3_lanes(x_cs, pack_weights(w_hwio), h=h, w_img=w,
                      interpret=interpret)
    # save the lane-layout activations: both backward kernels consume them
    return lanes_to_nhwc(y, b, h, w), (x_cs, w_hwio, (b, h, w))


def _conv3x3_same_bwd(interpret, res, dy_nhwc):
    x_cs, w_hwio, (b, h, w) = res
    dy_cs, _, _ = nhwc_to_lanes(dy_nhwc)
    dx_cs = conv3x3_lanes(dy_cs, pack_weights_dgrad(w_hwio), h=h, w_img=w,
                          interpret=interpret)
    dw = conv3x3_wgrad_lanes(x_cs, dy_cs, h=h, w_img=w, interpret=interpret)
    return lanes_to_nhwc(dx_cs, b, h, w), dw.astype(w_hwio.dtype)


conv3x3_same.defvjp(_conv3x3_same_fwd, _conv3x3_same_bwd)
