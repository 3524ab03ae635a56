"""Pallas TPU kernel: lane-layout 1x1 conv (pointwise matmul) with fused
requantization epilogues — the bottleneck-family analog of
ops/pallas/conv.py's 3x3 kernels.

Why: the bottleneck residual block (reference residual_block.py:102-215;
models/blocks.py BottleneckResidualBlock) spends most of its FLOPs in its
two 1x1 convs (Cin->width and width->Cout — ~55% of ResNet-50's model
FLOPs), and XLA's conv lowering never engages the v5e MXU's 2x int8 mode
(measured, tools/bench_int8_mxu.py). A 1x1 conv in the lane layout
([C, B*H*W]) is a single matmul

    out[Cout, S] = W[Cout, Cin] @ x[Cin, S]

with no spatial taps at all: the contraction K = Cin is a 128-lane
multiple at every ImageNet bottleneck width (256..2048), the output lane
dim S is batch*spatial, and the whole requantization interlude
(dequant scale, following-BN affine, relu, optional residual, next-conv
quantization) rides the epilogue in VMEM — the same
everything-in-the-epilogue design that made the 3x3 int8 serving path
win 1.41x (BASELINE.md "Int8 serving"): an s32 accumulator that
round-trips HBM through XLA elementwise chains was measured to cancel
the entire MXU win.

Unlike the 3x3 kernels, tiles need no whole-image alignment (no rolls,
no halo): any 128-multiple lane tile that divides N works, so the only
geometry requirement is N % 128 == 0 (plus channels % 32 for the int8
sublane tile, enforced by the callers' eligibility gates).

Scope: serving (models/quantize.py bottleneck path) and the int8
training kernels' 1x1 halves. Reference parity target: semantics of
jax.lax.conv_general_dilated 1x1 NHWC (the nn.Conv2d k=1 calls in
residual_block.py:121-160); equality asserted in tests/test_conv1x1.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_tile_dense(n: int, c: int, max_tile: int = 2048) -> int:
    """Lane-tile size for tap-free kernels: a multiple of 128 dividing N.
    The target shrinks with the channel count (VMEM holds x/out tiles
    proportional to c*tile); no whole-image constraint — 1x1 convs have
    no spatial neighborhood."""
    if n % 128 != 0:
        raise ValueError(f"N={n} is not a multiple of the 128-lane tile")
    target = max(128, min(max_tile, (512 * 2048) // max(c, 1)))
    t = 128
    while t * 2 <= target and n % (t * 2) == 0:
        t *= 2
    return t


def _epilogue(acc, scale_ref, shift_ref, res_ref, sb_ref, tb_ref,
              out_ref, out2_ref, *, relu, inv_out_scale):
    """Shared requant epilogue (see conv.py _requant_kernel):
        y = acc * scale[Cout] + shift[Cout] (+ res)
        if relu: y = max(y, 0)
        out = s8(clip(round(y * inv_out_scale)))  or  out.dtype(y)
        out2 = s8(clip(round(max(y*sb + tb, 0))))   (dual mode)
    """
    y = acc.astype(jnp.float32) * scale_ref[:] + shift_ref[:]
    if res_ref is not None:
        y = y + res_ref[:].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    if inv_out_scale is not None:
        q = jnp.clip(jnp.round(y * inv_out_scale), -127.0, 127.0)
        out_ref[:] = q.astype(jnp.int8)
    else:
        out_ref[:] = y.astype(out_ref.dtype)
    if out2_ref is not None:
        g = jnp.maximum(y * sb_ref[:] + tb_ref[:], 0.0)
        out2_ref[:] = jnp.clip(jnp.round(g), -127.0, 127.0).astype(jnp.int8)


def _mm_requant_kernel(x_ref, w_ref, scale_ref, shift_ref, *rest, relu,
                       inv_out_scale, has_res, has_dual):
    rest = list(rest)
    res_ref = rest.pop(0) if has_res else None
    sb_ref = rest.pop(0) if has_dual else None
    tb_ref = rest.pop(0) if has_dual else None
    out_ref = rest.pop(0)
    out2_ref = rest.pop(0) if has_dual else None
    acc_t = jnp.int32 if x_ref.dtype == jnp.int8 else jnp.float32
    acc = jax.lax.dot_general(
        w_ref[:], x_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_t)
    _epilogue(acc, scale_ref, shift_ref, res_ref, sb_ref, tb_ref,
              out_ref, out2_ref, relu=relu, inv_out_scale=inv_out_scale)


@functools.partial(jax.jit, static_argnames=(
    "relu", "inv_out_scale", "interpret"))
def conv1x1_lanes_requant(x_q: jax.Array, w_q: jax.Array, scale: jax.Array,
                          shift: jax.Array, res=None, dual=None, *,
                          relu: bool = False, inv_out_scale=None,
                          interpret: bool = False):
    """Int8 1x1 conv (lane-layout matmul) with the requantization epilogue
    fused into the kernel.

    x_q: [Cin, N] int8; w_q: [Cout, Cin] int8 (per-output-channel
    quantized, HWIO [1,1,Cin,Cout] squeezed + transposed).
    scale/shift: [Cout] f32 — dequant scale (activation_scale *
    per-channel weight scale, any following BN eval affine folded in)
    and additive shift. res: optional [Cout, N] bf16 residual added
    before the relu. inv_out_scale: static float — when given, output is
    the NEXT conv's quantized input (int8); when None, bf16.
    dual: optional (sb, tb) [Cout] f32 pair — bf16-carrier mode only;
    additionally emits s8(clip(round(max(y*sb + tb, 0)))), the next
    block's quantized entry (see conv.py conv3x3_lanes_requant).
    """
    cin, n = x_q.shape
    cout, wcin = w_q.shape
    if wcin != cin:
        raise ValueError(f"weights {w_q.shape} vs Cin {cin}")
    if dual is not None and inv_out_scale is not None:
        raise ValueError("dual output requires the bf16-carrier mode")
    tile = pick_tile_dense(n, max(cin, cout))
    out_dtype = jnp.int8 if inv_out_scale is not None else jnp.bfloat16
    inv = float(inv_out_scale) if inv_out_scale is not None else None
    kernel = functools.partial(
        _mm_requant_kernel, relu=relu, inv_out_scale=inv,
        has_res=res is not None, has_dual=dual is not None)

    def vec():
        return pl.BlockSpec((cout, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((cin, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((cout, cin), lambda i: (0, 0),
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
        cost_estimate=pl.CostEstimate(
            flops=2 * cout * cin * n,
            bytes_accessed=(cin * n
                            + cout * n * (1 if inv is not None else 2)
                            + (cout * n * 2 if res is not None else 0)
                            + (cout * n if dual is not None else 0)
                            + cout * cin),
            transcendentals=0),
        interpret=interpret,
    )(*args)


def pack_weights_1x1(w_hwio: jax.Array) -> jax.Array:
    """[1, 1, Cin, Cout] (lax.conv HWIO) -> [Cout, Cin], the kernel's
    matmul layout."""
    kh, kw, cin, cout = w_hwio.shape
    if (kh, kw) != (1, 1):
        raise ValueError("pack_weights_1x1 expects a 1x1 kernel.")
    return jnp.transpose(w_hwio.reshape(cin, cout), (1, 0))
