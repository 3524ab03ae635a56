"""Pallas TPU kernel: the stem conv (3x3/s1 SAME, tiny Cin) emitting the
lane-packed layout directly.

Why: with the residual trunk running in the lane layout ([C, B*H*W],
ops/pallas/fused_block.py), the stage-1 entry pays a full-activation
NHWC->lane relayout in the forward AND its mirror in the backward
(measured 0.73 ms each at [160, 256*32*32] bf16 on v5e — XLA's
transposing copy runs ~3.5x off the HBM bound; trace: layers.py
Sequential lane-entry transpose). The stem conv's own FLOPs are trivial
(Cin=3), so it can emit lane layout for free: this kernel consumes the
input as [8, N] lanes (Cin zero-padded to the 8-sublane tile — dead rows
carry zero weights), runs the 9-tap conv as ONE [Cout, 72] x [72, tile]
MXU dot per tile, and applies the bias with the XLA path's exact
rounding order (f32 MXU accumulate -> cast to compute dtype -> + bias in
compute dtype; layers.py Conv.apply).

Backward: the stem input is the augmented data batch — no trainable
parameter lies upstream, so dx is never consumed (the train step
differentiates w.r.t. params only) and the custom VJP returns a zeros
placeholder that XLA DCEs. dW and db come from a wgrad kernel consuming
the lane-layout cotangent directly — patches of x contracted against dy
over lanes into a grid-resident [Cout, 72] f32 accumulator, plus the
per-channel dy sum for the bias — which is what kills the backward's
mirror relayout.

Reference parity target: the stem `nn.Conv2d(3, C, 3, 1, 1, bias=True)`
the reference spec string emits (resnet.py:117-123); semantics equal to
layers.py Conv.apply's lax.conv + bias, asserted in
tests/test_lane_stem.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_ddp_resnet_tpu.ops.pallas.conv import (
    _pick_tile,
    _tap_groups,
    pack_weights,
)
from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
    _build_patches,
    _lane_coords,
)

__all__ = ["stem_conv_lane", "stem_lane_tile"]

_CIN_PAD = 8  # sublane tile: real input channels zero-padded up to this


def stem_lane_tile(h: int, w_img: int, n: int, cout: int) -> int:
    """Lane-tile pick (raises ValueError for infeasible geometries —
    callers treat that as 'not eligible', like the fused blocks do)."""
    return _pick_tile(h * w_img, n, cout // 2, max_tile=4096)


def _fwd_kernel(x_ref, w_ref, b_ref, y_ref, patch_ref, *, cout, h, w_img,
                tile, taps):
    hh, ww = _lane_coords(h * w_img, w_img, tile)
    _build_patches(x_ref[:], patch_ref, taps, _CIN_PAD, h, w_img, tile,
                   hh, ww)
    acc = jax.lax.dot_general(
        w_ref[:], patch_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # XLA-path rounding order: conv output cast to compute dtype FIRST,
    # bias added in compute dtype (layers.py Conv.apply)
    y_ref[:] = acc.astype(y_ref.dtype) + b_ref[:].astype(y_ref.dtype)


def _wgrad_kernel(dy_ref, x_ref, dw_ref, db_ref, patch_ref, *, cout, h,
                  w_img, tile, taps):
    hh, ww = _lane_coords(h * w_img, w_img, tile)
    _build_patches(x_ref[:], patch_ref, taps, _CIN_PAD, h, w_img, tile,
                   hh, ww)
    gf = dy_ref[:].astype(jnp.float32)
    part_dw = jax.lax.dot_general(
        gf, patch_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),  # contract lanes
        preferred_element_type=jnp.float32)
    part_db = jnp.sum(gf, axis=1, keepdims=True)

    s = pl.program_id(0)

    @pl.when(s == 0)
    def _init():
        dw_ref[:] = part_dw
        db_ref[:] = part_db

    @pl.when(s > 0)
    def _acc():
        dw_ref[:] = dw_ref[:] + part_dw
        db_ref[:] = db_ref[:] + part_db


def _pad_cin(x_cs):
    cin = x_cs.shape[0]
    if cin == _CIN_PAD:
        return x_cs
    return jnp.pad(x_cs, ((0, _CIN_PAD - cin), (0, 0)))


def _fwd_call(x_cs, w_hwio, b, *, h, w_img, interpret):
    cin, n = x_cs.shape
    cout = w_hwio.shape[-1]
    cd = x_cs.dtype
    tile = stem_lane_tile(h, w_img, n, cout)
    taps = [t for g in _tap_groups(_CIN_PAD) for t in g]
    x8 = _pad_cin(x_cs)
    w8 = pack_weights(jnp.pad(
        w_hwio.astype(cd), ((0, 0), (0, 0), (0, _CIN_PAD - cin), (0, 0))))
    kernel = functools.partial(_fwd_kernel, cout=cout, h=h, w_img=w_img,
                               tile=tile, taps=taps)
    return pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((_CIN_PAD, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 9 * _CIN_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cout, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, n), cd),
        scratch_shapes=[pltpu.VMEM((9 * _CIN_PAD, tile), cd)],
        cost_estimate=pl.CostEstimate(
            flops=2 * cout * 9 * _CIN_PAD * n,
            bytes_accessed=(_CIN_PAD * n + cout * n) * cd.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x8, w8, b.reshape(cout, 1).astype(jnp.float32))


def _wgrad_call(dy, x_cs, *, h, w_img, interpret):
    cout, n = dy.shape
    tile = stem_lane_tile(h, w_img, n, cout)
    taps = [t for g in _tap_groups(_CIN_PAD) for t in g]
    x8 = _pad_cin(x_cs)
    kernel = functools.partial(_wgrad_kernel, cout=cout, h=h, w_img=w_img,
                               tile=tile, taps=taps)
    dw, db = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((cout, tile), lambda s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CIN_PAD, tile), lambda s: (0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((cout, 9 * _CIN_PAD), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cout, 9 * _CIN_PAD), jnp.float32),
            jax.ShapeDtypeStruct((cout, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((9 * _CIN_PAD, tile), x_cs.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * cout * 9 * _CIN_PAD * n,
            bytes_accessed=(_CIN_PAD * n + cout * n) * dy.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(dy, x8)
    return dw, db[:, 0]


@functools.lru_cache(maxsize=None)
def _make_op(h: int, w_img: int, cin: int, w_dtype: str, b_dtype: str,
             interpret: bool):
    @jax.custom_vjp
    def op(x_cs, w_hwio, b):
        return _fwd_call(x_cs, w_hwio, b, h=h, w_img=w_img,
                         interpret=interpret)

    def fwd(x_cs, w_hwio, b):
        y = _fwd_call(x_cs, w_hwio, b, h=h, w_img=w_img,
                      interpret=interpret)
        return y, x_cs

    def bwd(resid, dy):
        x_cs = resid
        dw8, db = _wgrad_call(dy, x_cs, h=h, w_img=w_img,
                              interpret=interpret)
        # [Cout, dh*dw*Cin8] -> HWIO, dead pad rows sliced away
        cout = dw8.shape[0]
        dw = jnp.transpose(dw8.reshape(cout, 3, 3, _CIN_PAD),
                           (1, 2, 3, 0))[:, :, :cin, :]
        # dx is never consumed (no parameter upstream of the data batch);
        # zeros keep the VJP well-formed and are DCE'd
        return (jnp.zeros_like(x_cs), dw.astype(w_dtype),
                db.astype(b_dtype))

    op.defvjp(fwd, bwd)
    return op


def stem_conv_lane(x_cs: jax.Array, w_hwio: jax.Array, b: jax.Array, *,
                   h: int, w_img: int, interpret: bool = False) -> jax.Array:
    """Differentiable lane-layout stem conv: [Cin, N] -> [Cout, N] with
    Cin <= 8 (zero-padded to the sublane tile), 3x3 stride-1 SAME, bias.

    Gradients flow to (w, b) only; the input cotangent is a DCE'd zeros
    placeholder (see module docstring).
    """
    if x_cs.shape[0] > _CIN_PAD:
        raise ValueError(f"stem kernel expects Cin <= {_CIN_PAD}, got "
                         f"{x_cs.shape[0]}")
    return _make_op(h, w_img, x_cs.shape[0], jnp.dtype(w_hwio.dtype).name,
                    jnp.dtype(b.dtype).name, interpret)(x_cs, w_hwio, b)
