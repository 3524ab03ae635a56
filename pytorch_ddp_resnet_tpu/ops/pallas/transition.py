"""Pallas TPU kernels: strided-lane STAGE-TRANSITION conv (int8 training).

The trunk's interior blocks run entirely in the lane layout ([C, B*H*W];
ops/pallas/fused_block.py), but each stage transition used to break the
run: the strided conv1 ran as an XLA NHWC conv, so the previous stage's
lane output was transposed to NHWC and conv1's output (plus the projection
shortcut) transposed back — the largest non-conv line in the WRN-28-10
b512 step attribution (BASELINE.md). Two cheap fixes measured negative
(CNHW convs, a pallas relayout kernel: tools/bench_transition_layout.py);
this module is the real one — the stride-2 conv itself in lane layout, so
transitions become lane-in -> lane-out and the trunk is lane-resident
from stem to head.

**Parity-packed stride-2 taps.** A stride-2 3x3 conv with symmetric
padding 1 (torch Conv2d(stride=2, padding=1) == models/layers.py Conv —
NOT lax 'SAME', which pads only hi at stride 2) reads, for output
(oh, ow), input pixels (2oh+dh-1, 2ow+dw-1). Split the input into four
half-resolution PARITY PLANES p = 2*(h%2) + (w%2), each in the lane
layout of the OUTPUT geometry ([Cin, B*OH*OW]). Then every tap lands
entirely in one plane, at plane coordinates (oh + dh_, ow + dw_) with
dh_, dw_ in {-1, 0}:

    tap (dh, dw) -> plane (2*((dh+1)%2) + (dw+1)%2), shifts -1 iff d==0

so each tap's patch is a STATIC LANE ROLL of its plane plus a boundary
mask — exactly the machinery of the stride-1 kernels — and the matmul
tap-grouping/alignment story carries over unchanged. The projection
shortcut (1x1 stride-2) reads raw x at (2oh, 2ow): the even-even plane
with no shift, so it rides the same kernel as one extra (un-prologued)
tap; option-A shortcuts (subsample + zero-pad) are the raw even-even
plane copied through.

**The planes are FOUR SEPARATE ARRAYS, not one stacked tensor.** The
first cut packed them as [4*Cin, N/4] via reshape/6D-transpose/reshape;
XLA lowered that to a 5-op copy chain costing ~2.7 ms per boundary
(measured, b512 — worse than the transposes it replaced). As separate
arrays each plane is ONE strided-slice fusion of the producer's [Cin, N]
output, and the backward recombines the four plane gradients with a
single interior-pad-and-add fusion — no 6D intermediates anywhere.
Dropout bits still arrive as one [4*Cin, N/4] array (plane-major
sublanes: tests/test_transition.py's bit-placement contract).

Fused into the forward kernel, as in fused_block.py: the prologue
(norm1-apply + relu + quantized dropout), per-TILE dynamic int8
activation scales (one joint absmax across the four planes — the conv
dots mix planes within a tap group, so the scale must be shared), the
s8 x s8 -> s32 conv on the MXU's 2x mode, the projection/option-A
shortcut, and norm2's batch statistics (zsum/zssq epilogue). The
backward is ONE fused kernel (dgrad + wgrad + proj gradients +
d(scale)/d(shift) partials), reading every operand once; dgrad groups
taps BY PLANE (each plane's cotangent is a separate dot, K =
{1,2,2,4}*Cout — no zero-padding waste), wgrad reuses the forward tap
groups. quant_bwd mirrors fused_block: int8 dgrad/wgrad cores with
per-tile cotangent scales (FQT); the projection chain stays bf16 (its
FLOPs are 1/9 of conv1's — not worth an extra quantization error term).

Reference parity target: the transition composite in
models/blocks.py ResidualBlock._forward (preact branch) — norm1, relu,
dropout, stride-2 conv1, subsample(+proj | +zero-pad) — asserted value-
and gradient-level against the layer path in tests/test_transition.py.
(Reference semantics: resnet/architectures/residual_block.py:8-99.)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_ddp_resnet_tpu.ops.pallas.conv import _pick_tile, _tap_groups
from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
    _lane_coords,
    _prologue,
    dropout_thresh,
)

__all__ = ["transition_half_int8", "parity_planes", "parity_interleave",
           "parity_pack", "parity_unpack", "transition_tile"]


def _f32_if_interpret(x, interpret: bool):
    """The CPU interpreter's dot thunk has no bf16 x bf16 -> f32 kernel
    ("Unsupported element type for DotThunk"); f32-casting the operands
    is bit-identical (bf16 values are exact in f32, accumulation is f32
    on both paths) and only happens off-TPU."""
    return (x.astype(jnp.float32)
            if interpret and x.dtype == jnp.bfloat16 else x)


def _tap_info(dh: int, dw: int) -> Tuple[int, int, int]:
    """(plane, dh_, dw_) for tap (dh, dw): the parity plane it reads and
    its shift within that plane (in OUTPUT-geometry coordinates)."""
    ph, dlh = ((1, -1) if dh == 0 else (0, 0) if dh == 1 else (1, 0))
    pw, dlw = ((1, -1) if dw == 0 else (0, 0) if dw == 1 else (1, 0))
    return 2 * ph + pw, dlh, dlw


# dgrad plane grouping: plane -> its taps, row-major (dh, dw) order.
_PLANE_TAPS = {p: [(dh, dw) for dh in range(3) for dw in range(3)
                   if _tap_info(dh, dw)[0] == p] for p in range(4)}


def parity_planes(x_cs: jax.Array, h: int, w_img: int):
    """[Cin, B*H*W] lane layout -> 4 plane arrays [Cin, B*(H/2)*(W/2)]
    (plane p = 2*(h%2)+(w%2), output-geometry image-major lanes). Each
    plane is one strided slice — no stacked intermediate."""
    c, n = x_cs.shape
    b = n // (h * w_img)
    v = x_cs.reshape(c, b, h, w_img)
    return tuple(
        v[:, :, ph::2, pw::2].reshape(c, n // 4)
        for ph in (0, 1) for pw in (0, 1))


def parity_interleave(planes, h: int, w_img: int) -> jax.Array:
    """Inverse of parity_planes: 4 x [Cin, N/4] -> [Cin, B*H*W]. Interior-
    padded (dilated) planes summed — XLA fuses the four pads and adds
    into one output-loop fusion (a single pass over N)."""
    c, q = planes[0].shape
    oh, ow = h // 2, w_img // 2
    b = q // (oh * ow)
    out = None
    for p, pln in enumerate(planes):
        ph, pw = p // 2, p % 2
        v = pln.reshape(c, b, oh, ow)
        v = jax.lax.pad(v, jnp.zeros((), v.dtype),
                        ((0, 0, 0), (0, 0, 0),
                         (ph, 1 - ph, 1), (pw, 1 - pw, 1)))
        out = v if out is None else out + v
    return out.reshape(c, b * h * w_img)


def parity_pack(x_cs: jax.Array, h: int, w_img: int) -> jax.Array:
    """Reference helper (tests, bits layout): the four parity planes
    stacked plane-major on the sublane axis, [4*Cin, N/4]."""
    return jnp.concatenate(parity_planes(x_cs, h, w_img), axis=0)


def parity_unpack(xp: jax.Array, h: int, w_img: int) -> jax.Array:
    """Inverse of parity_pack (reference helper)."""
    c = xp.shape[0] // 4
    return parity_interleave(
        tuple(xp[p * c:(p + 1) * c] for p in range(4)), h, w_img)


def pack_weights_transition_dgrad(w_hwio: jax.Array) -> jax.Array:
    """[3,3,Cin,Cout] -> [Cin, 9*Cout] PLANE-MAJOR: per parity plane, the
    tap blocks W[dh,dw] ([Cin, Cout] — dd[ci] = sum_co W[ci,co]*gz[co],
    so the blocks go in untransposed) in row-major tap order — the column
    layout the backward kernel's per-plane dgrad dots consume."""
    blocks = [w_hwio[dh, dw]
              for p in range(4) for (dh, dw) in _PLANE_TAPS[p]]
    return jnp.concatenate(blocks, axis=1)


def _quant_pack_w_fwd(w_hwio):
    """Per-output-channel int8 quantize + pack [Cout, 9*Cin] (row-major
    taps, same order as ops/pallas/conv.py pack_weights)."""
    wf = w_hwio.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))
    ws = jnp.maximum(absmax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)
    kh, kw, cin, cout = w_hwio.shape
    return (jnp.transpose(w_q, (3, 0, 1, 2)).reshape(cout, 9 * cin), ws)


def _quant_pack_w_dgrad(w_hwio):
    """Per-INPUT-channel int8 quantize + transition-dgrad pack (the
    per-plane dots contract over Cout, so the dequant scale must live on
    the Cin output axis; cf. fused_block._quantize_pack_weights_dgrad)."""
    wf = w_hwio.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=(0, 1, 3))
    ws = jnp.maximum(absmax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(wf / ws[:, None]), -127, 127).astype(jnp.int8)
    return pack_weights_transition_dgrad(w_q), ws


def _pack_w_dgrad(w_hwio, dtype):
    return pack_weights_transition_dgrad(w_hwio.astype(dtype))


def transition_tile(oh: int, ow: int, n_out: int, cin: int,
                    cout: int) -> int:
    """Lane-tile pick at the OUTPUT geometry. The int8 working set lets
    the quant rule (c//2, like fused_block's backward picks) apply; the
    VMEM anchor is the backward's resident f32 dW accumulator."""
    c = max(4 * cin, cout)
    return _pick_tile(oh * ow, n_out, c // 2, max_tile=4096)


def _build_plane_patches(planes, patch_ref, taps, cin, oh, ow, hh, ww):
    """FORWARD patch rows, one per tap, each a masked lane roll of the
    tap's parity plane (planes: list of 4 [Cin, tile] values):
    patch[o] = plane[o + dh_*OW + dw_], valid while the shifted source
    stays in-image."""
    for j, (dh, dw) in enumerate(taps):
        p, dlh, dlw = _tap_info(dh, dw)
        shift = dlh * ow + dlw
        src = planes[p]
        rolled = src if shift == 0 else jnp.roll(src, -shift, axis=1)
        src_h = hh + dlh
        src_w = ww + dlw
        mask = ((src_h >= 0) & (src_h < oh) & (src_w >= 0) & (src_w < ow))
        patch_ref[j * cin:(j + 1) * cin, :] = jnp.where(
            mask, rolled, jnp.zeros_like(rolled))


def _dgrad_patches(g_ref, patch_ref, taps, cout, oh, ow, hh, ww):
    """DGRAD patches of the (shared) cotangent g for one plane's taps:
    the transposed scatter — shift -dh_/-dw_, masked where the
    contributing output position exists."""
    for j, (dh, dw) in enumerate(taps):
        _, dlh, dlw = _tap_info(dh, dw)
        dlh, dlw = -dlh, -dlw
        shift = dlh * ow + dlw
        src = g_ref[:]
        rolled = src if shift == 0 else jnp.roll(src, -shift, axis=1)
        src_h = hh + dlh
        src_w = ww + dlw
        mask = ((src_h >= 0) & (src_h < oh) & (src_w >= 0) & (src_w < ow))
        patch_ref[j * cout:(j + 1) * cout, :] = jnp.where(
            mask, rolled, jnp.zeros_like(rolled))


# --- forward ------------------------------------------------------------------


def _fwd_kernel(*refs, cin, cout, oh, ow, tile, groups, thresh, use_bits,
                use_proj, interpret):
    it = iter(refs)
    xp_refs = [next(it) for _ in range(4)]      # 4 x [Cin, tile] raw
    w_ref = next(it)                            # [Cout, 9Cin] int8
    dscale_ref = next(it)                       # [Cout, 1] weight scales
    wp_ref = next(it) if use_proj else None     # [Cout, Cin] proj weights
    scale_ref = next(it)                        # [Cin, 1] folded norm1
    shift_ref = next(it)
    bits_ref = next(it) if use_bits else None   # [4Cin, tile] u8
    z_ref = next(it)
    zsum_ref = next(it)
    zssq_ref = next(it)
    res_ref = next(it)
    d_ref = next(it)                            # [4Cin, tile] int8 scratch
    patch_ref = next(it)                        # [gmax*Cin, tile] int8

    hh, ww = _lane_coords(oh * ow, ow, tile)

    # prologue per plane; ONE joint per-tile activation scale (the conv
    # dots mix planes within a tap group, so the int8 scale is shared)
    dqs = []
    for p in range(4):
        dqs.append(_prologue(
            xp_refs[p][:], scale_ref[:], shift_ref[:],
            bits_ref[p * cin:(p + 1) * cin, :] if use_bits else None,
            thresh if use_bits else None, jnp.float32))
    amax_t = jnp.max(jnp.stack([jnp.max(jnp.abs(d)) for d in dqs]))
    inv_t = 127.0 / jnp.maximum(amax_t, 1e-12)
    planes = []
    for p in range(4):
        q = jnp.clip(jnp.round(dqs[p] * inv_t), -127.0, 127.0).astype(
            jnp.int8)
        d_ref[p * cin:(p + 1) * cin, :] = q
        planes.append(q)

    acc = None
    col = 0
    for taps in groups:
        _build_plane_patches(planes, patch_ref, taps, cin, oh, ow, hh, ww)
        kg = len(taps) * cin
        contrib = jax.lax.dot_general(
            w_ref[:, col:col + kg], patch_ref[0:kg, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = contrib if acc is None else acc + contrib
        col += kg
    acc = acc.astype(jnp.float32) * (dscale_ref[:] * (amax_t * (1.0 / 127.0)))

    z = acc.astype(z_ref.dtype)
    z_ref[:] = z

    # shortcut at (2oh, 2ow): the RAW even-even plane — projected (1x1,
    # bf16 core: exactness of the residual path) or passed through with
    # zero-padded channels (option A)
    raw0 = xp_refs[0][:]
    if use_proj:
        res = jax.lax.dot_general(
            _f32_if_interpret(wp_ref[:], interpret),
            _f32_if_interpret(raw0, interpret),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        res_ref[:] = res.astype(res_ref.dtype)
    else:
        res_ref[0:cin, :] = raw0.astype(res_ref.dtype)
        if cout > cin:  # static: a zero-width write would not lower
            res_ref[cin:, :] = jnp.zeros((cout - cin, tile), res_ref.dtype)

    zf = z.astype(jnp.float32)
    part_sum = jnp.sum(zf, axis=1, keepdims=True)
    part_ssq = jnp.sum(jnp.square(zf), axis=1, keepdims=True)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        zsum_ref[:] = part_sum
        zssq_ref[:] = part_ssq

    @pl.when(i > 0)
    def _acc():
        zsum_ref[:] = zsum_ref[:] + part_sum
        zssq_ref[:] = zssq_ref[:] + part_ssq


def _fwd_call(xps, w_q, dscale, wp, scale, shift, bits, *, thresh, oh, ow,
              use_proj, interpret):
    cin, n = xps[0].shape
    cout = w_q.shape[0]
    tile = transition_tile(oh, ow, n, cin, cout)
    groups = _tap_groups(cin)
    gmax = max(len(g) for g in groups)
    use_bits = bits is not None

    kernel = functools.partial(
        _fwd_kernel, cin=cin, cout=cout, oh=oh, ow=ow, tile=tile,
        groups=groups, thresh=thresh, use_bits=use_bits,
        use_proj=use_proj, interpret=interpret)

    tile_in = pl.BlockSpec((cin, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    tile_out = pl.BlockSpec((cout, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    vec_out = pl.BlockSpec((cout, 1), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    vec_in = pl.BlockSpec((cin, 1), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)

    in_specs = [tile_in] * 4 + [
        pl.BlockSpec((cout, 9 * cin), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        vec_out,
    ]
    inputs = list(xps) + [w_q, dscale.reshape(cout, 1).astype(jnp.float32)]
    if use_proj:
        in_specs.append(pl.BlockSpec((cout, cin), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(wp)
    in_specs += [vec_in, vec_in]
    inputs += [scale.reshape(cin, 1).astype(jnp.float32),
               shift.reshape(cin, 1).astype(jnp.float32)]
    if use_bits:
        in_specs.append(pl.BlockSpec((4 * cin, tile), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        inputs.append(bits)

    outs = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=[tile_out, vec_out, vec_out, tile_out],
        out_shape=[
            jax.ShapeDtypeStruct((cout, n), xps[0].dtype),
            jax.ShapeDtypeStruct((cout, 1), jnp.float32),
            jax.ShapeDtypeStruct((cout, 1), jnp.float32),
            jax.ShapeDtypeStruct((cout, n), xps[0].dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((4 * cin, tile), jnp.int8),
            pltpu.VMEM((gmax * cin, tile), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * cout * (9 + (1 if use_proj else 0)) * cin * n,
            bytes_accessed=(4 * cin * n + 2 * cout * n)
            * xps[0].dtype.itemsize
            + (4 * cin * n if use_bits else 0) + cout * 9 * cin,
            transcendentals=0),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    z, zsum, zssq, res = outs
    return z, zsum[:, 0], zssq[:, 0], res


# --- backward: fused dgrad + wgrad + proj gradients ---------------------------


def _bwd_kernel(*refs, cin, cout, oh, ow, tile, wgroups, thresh, use_bits,
                use_proj, quant_bwd, interpret):
    it = iter(refs)
    dz_ref = next(it)
    z_ref = next(it)
    dzsum_ref = next(it)
    dzssq_ref = next(it)
    dres_ref = next(it)
    xp_refs = [next(it) for _ in range(4)]
    wd_ref = next(it)           # [Cin, 9*Cout] plane-major (int8|bf16)
    wsin_ref = next(it) if quant_bwd else None  # [Cin, 1]
    wpt_ref = next(it) if use_proj else None    # [Cin, Cout] = Wp
    scale_ref = next(it)        # [Cin, 1]
    shift_ref = next(it)
    bits_ref = next(it) if use_bits else None   # [4Cin, tile]
    dxp_refs = [next(it) for _ in range(4)]     # 4 x [Cin, tile]
    ds_ref = next(it)           # [Cin, 1]
    dt_ref = next(it)
    dw_ref = next(it)           # [Cout, 9*Cin] f32 resident accumulator
    dwp_ref = next(it) if use_proj else None    # [Cout, Cin] f32 resident
    g_ref = next(it)            # [Cout, tile] int8|bf16
    d_ref = next(it)            # [4Cin, tile] int8|bf16
    patch_ref = next(it)        # [max(4Cout, gmax*Cin), tile]

    hh, ww = _lane_coords(oh * ow, ow, tile)
    s = pl.program_id(0)

    # fold the stats cotangents once (norm2 differentiates through its
    # batch statistics: zsum = sum(z), zssq = sum(z^2))
    gf = (dz_ref[:].astype(jnp.float32)
          + dzsum_ref[:]
          + 2.0 * z_ref[:].astype(jnp.float32) * dzssq_ref[:])
    if quant_bwd:
        g_amax = jnp.max(jnp.abs(gf))
        g_inv = 127.0 / jnp.maximum(g_amax, 1e-30)
        g_ref[:] = jnp.clip(jnp.round(gf * g_inv),
                            -127.0, 127.0).astype(jnp.int8)
        g_scale = g_amax * (1.0 / 127.0)
    else:
        g_ref[:] = gf.astype(g_ref.dtype)

    # dgrad, plane by plane: each parity plane's cotangent is its own dot
    # (K = n_taps * Cout — no zero-block padding), then the prologue's
    # relu/dropout masks and norm1 scale chain, recomputed from the raw
    # plane (+ scale, shift, bits)
    part_ds = None
    part_dt = None
    col = 0
    for p in range(4):
        taps = _PLANE_TAPS[p]
        _dgrad_patches(g_ref, patch_ref, taps, cout, oh, ow, hh, ww)
        kp = len(taps) * cout
        acc = jax.lax.dot_general(
            _f32_if_interpret(wd_ref[:, col:col + kp], interpret),
            _f32_if_interpret(patch_ref[0:kp, :], interpret),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quant_bwd else jnp.float32)
        col += kp
        if quant_bwd:
            acc = acc.astype(jnp.float32) * (wsin_ref[:] * g_scale)
        xf = xp_refs[p][:].astype(jnp.float32)
        nrm = xf * scale_ref[:] + shift_ref[:]
        live = nrm > 0
        if use_bits:
            live = live & (
                bits_ref[p * cin:(p + 1) * cin, :].astype(jnp.int32)
                < thresh)
            dn = jnp.where(live, acc * (256.0 / thresh), 0.0)
        else:
            dn = jnp.where(live, acc, 0.0)
        dx_p = dn * scale_ref[:]
        if p == 0:
            # the raw shortcut chain lands on the even-even plane,
            # bypassing the prologue: proj (Wp @ dres, bf16 core) or
            # the option-A passthrough (first Cin rows of dres)
            if use_proj:
                dx_p = dx_p + jax.lax.dot_general(
                    _f32_if_interpret(wpt_ref[:], interpret),
                    _f32_if_interpret(dres_ref[:], interpret),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                dx_p = dx_p + dres_ref[0:cin, :].astype(jnp.float32)
        dxp_refs[p][:] = dx_p.astype(dxp_refs[p].dtype)

        pds = jnp.sum(dn * xf, axis=1, keepdims=True)
        pdt = jnp.sum(dn, axis=1, keepdims=True)
        part_ds = pds if part_ds is None else part_ds + pds
        part_dt = pdt if part_dt is None else part_dt + pdt

    @pl.when(s == 0)
    def _init():
        ds_ref[:] = part_ds
        dt_ref[:] = part_dt

    @pl.when(s > 0)
    def _acc():
        ds_ref[:] = ds_ref[:] + part_ds
        dt_ref[:] = dt_ref[:] + part_dt

    # wgrad: recompute the dropped activation planes once, contract the
    # SAME cotangent against the forward patches (cf. fused_block
    # _bwd_kernel)
    wplanes = []
    if quant_bwd:
        dqs = []
        for p in range(4):
            dqs.append(_prologue(
                xp_refs[p][:], scale_ref[:], shift_ref[:],
                bits_ref[p * cin:(p + 1) * cin, :] if use_bits else None,
                thresh if use_bits else None, jnp.float32))
        d_amax = jnp.max(jnp.stack([jnp.max(jnp.abs(d)) for d in dqs]))
        d_inv = 127.0 / jnp.maximum(d_amax, 1e-30)
        for p in range(4):
            q = jnp.clip(jnp.round(dqs[p] * d_inv),
                         -127.0, 127.0).astype(jnp.int8)
            d_ref[p * cin:(p + 1) * cin, :] = q
            wplanes.append(q)
        tile_scale = (d_amax * g_amax) * (1.0 / (127.0 * 127.0))
    else:
        for p in range(4):
            q = _prologue(
                xp_refs[p][:], scale_ref[:], shift_ref[:],
                bits_ref[p * cin:(p + 1) * cin, :] if use_bits else None,
                thresh if use_bits else None, d_ref.dtype)
            d_ref[p * cin:(p + 1) * cin, :] = q
            wplanes.append(q)

    col = 0
    for taps in wgroups:
        _build_plane_patches(wplanes, patch_ref, taps, cin, oh, ow, hh, ww)
        kg = len(taps) * cin
        contrib = jax.lax.dot_general(
            _f32_if_interpret(g_ref[:], interpret),
            _f32_if_interpret(patch_ref[0:kg, :], interpret),
            dimension_numbers=(((1,), (1,)), ((), ())),  # contract lanes
            preferred_element_type=jnp.int32 if quant_bwd else jnp.float32)
        if quant_bwd:
            contrib = contrib.astype(jnp.float32) * tile_scale

        def _w_init(col=col, kg=kg, contrib=contrib):
            dw_ref[:, col:col + kg] = contrib

        def _w_acc(col=col, kg=kg, contrib=contrib):
            dw_ref[:, col:col + kg] = dw_ref[:, col:col + kg] + contrib

        pl.when(s == 0)(_w_init)
        pl.when(s > 0)(_w_acc)
        col += kg

    if use_proj:
        # dWp = dres @ raw_plane0^T (bf16 core, f32 accumulate)
        contrib_p = jax.lax.dot_general(
            _f32_if_interpret(dres_ref[:], interpret),
            _f32_if_interpret(xp_refs[0][:], interpret),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(s == 0)
        def _p_init():
            dwp_ref[:] = contrib_p

        @pl.when(s > 0)
        def _p_acc():
            dwp_ref[:] = dwp_ref[:] + contrib_p


def _bwd_call(dz, z, dzsum, dzssq, dres, xps, wd_packed, wpt, scale,
              shift, bits, *, thresh, oh, ow, use_proj, quant_bwd,
              interpret, wscale_in=None):
    cout, n = dz.shape
    cin = xps[0].shape[0]
    tile = transition_tile(oh, ow, n, cin, cout)
    wgroups = _tap_groups(cin)
    gmax = max(4 * cout, max(len(g) for g in wgroups) * cin)
    use_bits = bits is not None
    bwd_dtype = jnp.int8 if quant_bwd else dz.dtype

    kernel = functools.partial(
        _bwd_kernel, cin=cin, cout=cout, oh=oh, ow=ow, tile=tile,
        wgroups=wgroups, thresh=thresh, use_bits=use_bits,
        use_proj=use_proj, quant_bwd=quant_bwd, interpret=interpret)

    tile_in = pl.BlockSpec((cin, tile), lambda s: (0, s),
                           memory_space=pltpu.VMEM)
    tile_out = pl.BlockSpec((cout, tile), lambda s: (0, s),
                            memory_space=pltpu.VMEM)
    vec_out = pl.BlockSpec((cout, 1), lambda s: (0, 0),
                           memory_space=pltpu.VMEM)
    vec_in = pl.BlockSpec((cin, 1), lambda s: (0, 0),
                          memory_space=pltpu.VMEM)

    in_specs = [tile_out, tile_out, vec_out, vec_out, tile_out]
    inputs = [dz, z, dzsum.reshape(cout, 1).astype(jnp.float32),
              dzssq.reshape(cout, 1).astype(jnp.float32), dres]
    in_specs += [tile_in] * 4
    inputs += list(xps)
    in_specs.append(pl.BlockSpec((cin, 9 * cout), lambda s: (0, 0),
                                 memory_space=pltpu.VMEM))
    inputs.append(wd_packed)
    if quant_bwd:
        in_specs.append(vec_in)
        inputs.append(wscale_in.reshape(cin, 1).astype(jnp.float32))
    if use_proj:
        in_specs.append(pl.BlockSpec((cin, cout), lambda s: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(wpt)
    in_specs += [vec_in, vec_in]
    inputs += [scale.reshape(cin, 1).astype(jnp.float32),
               shift.reshape(cin, 1).astype(jnp.float32)]
    if use_bits:
        in_specs.append(pl.BlockSpec((4 * cin, tile), lambda s: (0, s),
                                     memory_space=pltpu.VMEM))
        inputs.append(bits)

    out_specs = [tile_in] * 4 + [
        vec_in, vec_in,
        pl.BlockSpec((cout, 9 * cin), lambda s: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((cin, n), xps[0].dtype)] * 4 + [
        jax.ShapeDtypeStruct((cin, 1), jnp.float32),
        jax.ShapeDtypeStruct((cin, 1), jnp.float32),
        jax.ShapeDtypeStruct((cout, 9 * cin), jnp.float32),
    ]
    if use_proj:
        out_specs.append(pl.BlockSpec((cout, cin), lambda s: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((cout, cin), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((cout, tile), bwd_dtype),
            pltpu.VMEM((4 * cin, tile), bwd_dtype),
            pltpu.VMEM((gmax, tile), bwd_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * cout * (9 + (2 if use_proj else 0)) * cin * n,
            bytes_accessed=(8 * cin * n + 3 * cout * n) * dz.dtype.itemsize
            + (4 * cin * n if use_bits else 0) + cout * 9 * cin * 4,
            transcendentals=0),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    dxps = outs[:4]
    ds, dt, dw_flat = outs[4], outs[5], outs[6]
    dwp = outs[7] if use_proj else None
    # plane-major wgrad columns are ROW-MAJOR tap order (wgroups iterate
    # taps row-major): [Cout, dh, dw, Cin] -> HWIO
    dw = jnp.transpose(dw_flat.reshape(cout, 3, 3, cin), (1, 2, 3, 0))
    return dxps, ds[:, 0], dt[:, 0], dw, dwp


# --- differentiable entry point -----------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_op(thresh: Optional[int], use_bits: bool, use_proj: bool,
             quant_bwd: bool, h: int, w_img: int, interpret: bool):
    """Custom-VJP transition op for one static config.

    Signature: op(x_cs, w1_hwio[, wp], scale, shift[, bits]) ->
    (z_cs, zsum, zssq, res_cs) at the output geometry (OH, OW) =
    (h/2, w/2). x_cs is [Cin, B*h*w] lane layout; w1_hwio [3,3,Cin,Cout];
    wp [Cin, Cout] (nested 1x1 HWIO squeezed) when use_proj. The parity
    plane slices / the interleave of the plane gradients live INSIDE the
    op, so callers see plain lane tensors on both sides."""
    oh, ow = h // 2, w_img // 2

    def unpack(args):
        x_cs, w1 = args[0], args[1]
        i = 2
        wp = args[i] if use_proj else None
        i += use_proj
        scale, shift = args[i], args[i + 1]
        i += 2
        bits = args[i] if use_bits else None
        return x_cs, w1, wp, scale, shift, bits

    def run_fwd(x_cs, w1, wp, scale, shift, bits):
        xps = parity_planes(x_cs, h, w_img)
        w_q, ws = _quant_pack_w_fwd(w1)
        # the fwd kernel's proj dot is [Cout, Cin] @ raw0[Cin, tile]
        wp_c = jnp.transpose(wp).astype(x_cs.dtype) if use_proj else None
        z, zsum, zssq, res = _fwd_call(
            xps, w_q, ws, wp_c, scale, shift, bits, thresh=thresh,
            oh=oh, ow=ow, use_proj=use_proj, interpret=interpret)
        return (z, zsum, zssq, res), xps

    @jax.custom_vjp
    def op(*args):
        out, _ = run_fwd(*unpack(args))
        return out

    def fwd(*args):
        x_cs, w1, wp, scale, shift, bits = unpack(args)
        out, xps = run_fwd(x_cs, w1, wp, scale, shift, bits)
        return out, (xps, w1, wp, scale, shift, bits, out[0])

    def bwd(resid, cts):
        xps, w1, wp, scale, shift, bits, z = resid
        dz, dzsum, dzssq, dres = cts
        cd = xps[0].dtype
        if quant_bwd:
            wd, ws_in = _quant_pack_w_dgrad(w1)
        else:
            wd, ws_in = _pack_w_dgrad(w1, cd), None
        # the bwd kernel's raw-chain dot is Wp[Cin, Cout] @ dres — the
        # API orientation as-is
        wpt = wp.astype(cd) if use_proj else None
        dxps, ds, dt, dw, dwp = _bwd_call(
            dz, z, dzsum, dzssq, dres, xps, wd, wpt, scale, shift, bits,
            thresh=thresh, oh=oh, ow=ow, use_proj=use_proj,
            quant_bwd=quant_bwd, interpret=interpret, wscale_in=ws_in)
        dx = parity_interleave(dxps, h, w_img)
        out = [dx, dw.astype(w1.dtype)]
        if use_proj:
            # kernel accumulates dres @ raw0^T = [Cout, Cin]; the API's
            # wp is [Cin, Cout]
            out.append(jnp.transpose(dwp).astype(wp.dtype))
        out += [ds.astype(scale.dtype), dt.astype(shift.dtype)]
        if use_bits:
            out.append(None)
        return tuple(out)

    op.defvjp(fwd, bwd)
    return op


def transition_half_int8(x_cs: jax.Array, w1_hwio: jax.Array,
                         wp: Optional[jax.Array], scale: jax.Array,
                         shift: jax.Array, bits: Optional[jax.Array] = None,
                         *, dropout_rate: float = 0.0, h: int, w_img: int,
                         quant_bwd: bool = False, interpret: bool = False
                         ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                    jax.Array]:
    """Differentiable fused stage-transition half with an INT8 stride-2
    conv core, lane-in -> lane-out.

    Computes, at the output geometry (h/2, w/2):
        d   = dropout(relu(x * scale + shift))      (prologue, in-kernel)
        z   = conv3x3_stride2_pad1(d) @ int8 MXU    (per-tile act scales)
        res = proj_1x1(x[::2, ::2])                 (wp given; bf16 core)
              | zero-pad-channels(x[::2, ::2])      (wp None: option A)
        zsum, zssq = per-channel sums of z          (norm2's batch stats)

    Args:
      x_cs: [Cin, B*h*w] lane layout (whole images, image-major).
      w1_hwio: [3, 3, Cin, Cout] stride-2 conv weights.
      wp: [Cin, Cout] projection weights (1x1 HWIO squeezed), or None for
        the option-A zero-pad shortcut (requires Cout >= Cin).
      scale, shift: [Cin] f32 folded norm1 (fused_block.fold_bn).
      bits: [4*Cin, B*(h/2)*(w/2)] uint8 dropout bits over the PARITY-
        PACKED layout (plane-major sublanes, parity_pack order — a
        different, still uniform, still per-layer-keyed bit stream than
        the NHWC draw; the same sanctioned divergence as the lane layout
        itself). In-kernel seed mode is not supported here (the feature
        is default-off and measured negative at these widths; pass
        materialized bits).
      quant_bwd: run dgrad/wgrad on the int8 MXU mode too (FQT) instead
        of straight-through backward at the unquantized point.

    Returns (z_cs [Cout, N/4], zsum [Cout] f32, zssq [Cout] f32,
    res_cs [Cout, N/4]).
    """
    thresh = dropout_thresh(dropout_rate)
    if thresh >= 256:
        bits = None
    elif thresh <= 0:
        raise ValueError("dropout_rate >= 1 zeroes the activations; the "
                         "transition kernel does not support it.")
    elif bits is None:
        raise ValueError(f"dropout_rate={dropout_rate} needs a bits array.")
    if bits is not None and getattr(bits, "ndim", 2) == 0:
        raise ValueError("transition_half_int8 takes materialized bits "
                         "only (no in-kernel seed mode).")
    if h % 2 or w_img % 2:
        raise ValueError(f"stride-2 transition needs even H, W; got "
                         f"{(h, w_img)}")
    use_bits = bits is not None
    use_proj = wp is not None
    if not use_proj and w1_hwio.shape[3] < x_cs.shape[0]:
        raise ValueError("option-A shortcut cannot shrink channels")
    op = _make_op(thresh if use_bits else None, use_bits, use_proj,
                  quant_bwd, h, w_img, interpret)
    args = [x_cs, w1_hwio]
    if use_proj:
        args.append(wp)
    args += [scale, shift]
    if use_bits:
        args.append(bits)
    return op(*args)
