"""NV-layout int8 TRAINING kernels for the post-act bottleneck trunk.

The serving kernels (ops/pallas/bneck_nv.py) proved the batch-in-
sublanes carrier ([h, wp, N, C] — XLA:TPU's own conv activation layout)
eliminates the custom-call boundary tax that sank every NHWC pallas
substrate (wrn-50-2 serving 1.18x vs float, BASELINE.md round 4). This
module is the training half (VERDICT r4 next-round #1): differentiable
per-conv "half" ops with int8 MXU cores, mirroring the CIFAR trunk's
proven FQT architecture (ops/pallas/fused_block.py, 1.37x training) in
the NV carrier:

    half(x, w[, s, t][, res]) -> (y, zsum, zssq[, x_res])

- **prologue fusion**: the previous BatchNorm's folded (scale, shift)
  affine + ReLU (+ the residual add at a block entry) run in VMEM on
  the RAW conv accumulator of the previous half — BatchNorm application
  never touches HBM. Three modes:
    * "identity" — a = x (a stage's first conv1: its input is a
      materialized post-relu activation; no affine, and crucially no
      relu so the gradient passes through x == 0 exactly);
    * "affine"   — a = relu(s * x + t) (conv2, conv3);
    * "entry"    — a = relu(s * x + t + res) (a mid-stage block's
      conv1: the previous block's BN3-affine + residual add + relu
      fold into this prologue, and the result is ALSO emitted as the
      block's materialized residual carrier x_res — the block-output
      elementwise pass over the trunk's widest arrays disappears).
- **int8 conv core**: activations quantize per-GRID-CHUNK with the
  chunk's own masked absmax (stateless dynamic scales — the fused_block
  per-tile scheme, tile = row chunk here); weights per-output-channel
  (per-input-channel for dgrad) as XLA ops once per step. s8 x s8 ->
  s32 on the MXU's 2x mode. 3x3 taps are tile-aligned row shifts; the
  halo rides the serving kernels' clamped-sliver BlockSpec views.
- **epilogue stats**: each half emits the W-column-masked per-channel
  sum / sum-of-squares of its raw output, so the next BatchNorm's batch
  statistics need no pass over y; the XLA side is per-channel vector
  math (mean/var/affine + EMA), and autodiff through it delivers the
  stats cotangents which the backward kernels fold in as
  dy_total = dy + d(zsum) + 2 y d(zssq) (fused_block.py's scheme).
- **backward**: custom VJP with dgrad and wgrad kernels per conv shape.
  quant_bwd=True (FQT) quantizes the folded cotangent per chunk against
  per-input-channel int8 weights (dgrad) / both operands (wgrad);
  quant_bwd=False is straight-through QAT — the backward convs run
  bf16 at the unquantized point.

W-border discipline: every kernel masks its conv operand's border
columns to zero BEFORE the absmax (a garbage border would poison the
dynamic scale), so borders carry only bounded garbage between ops and
the masked stats/sums are exact.

Scope: stride-1 convs with identity shortcuts — the 12-of-16
mid-stage blocks of ResNet-50 / WRN-50-2 (~75% of trunk FLOPs). The
stage-entry transition blocks (stride-2 conv2 + projection) stay on the
XLA bf16 path; see models/blocks.py BottleneckResidualBlock.

Reference parity target: the train-mode composite of Conv/BatchNorm/
ReLU + residual in the post-act bottleneck block
(models/blocks.py:889-908; reference residual_block.py:102-215),
asserted value- and gradient-level against an independent mirror in
tests/test_nv_train.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_ddp_resnet_tpu.ops.pallas.nv_common import (
    check_nv,
    nv_geometry,
    shift_rows,
    to_nv,
    from_nv,
    wcol_mask,
)

__all__ = [
    "nv_half_1x1",
    "nv_half_3x3",
    "nv_geometry",
    "to_nv",
    "from_nv",
]

_MODES = ("identity", "affine", "entry")


# --- weight quantization (XLA ops, once per step) -----------------------------


def _quant_w(wf, axis):
    absmax = jnp.max(jnp.abs(wf), axis=axis)
    ws = jnp.maximum(absmax, 1e-12) / 127.0
    return ws


def quantize_w_1x1(w):
    """[Cin, Cout] -> (w_q s8, ws [Cout] f32), per-output-channel."""
    wf = w.astype(jnp.float32)
    ws = _quant_w(wf, axis=0)
    wq = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)
    return wq, ws


def quantize_w_1x1_dgrad(w):
    """[Cin, Cout] -> (w_q [Cout, Cin] s8, ws [Cin] f32): the transposed
    contraction runs over Cout, so the dequant scale must live on Cin."""
    wf = w.astype(jnp.float32)
    ws = _quant_w(wf, axis=1)
    wq = jnp.clip(jnp.round(wf / ws[:, None]),
                  -127, 127).astype(jnp.int8).T
    return wq, ws


def quantize_w_3x3(w_hwio):
    """[3, 3, Cin, Cout] -> (w_q [9, Cin, Cout] s8, ws [Cout] f32)."""
    wf = w_hwio.astype(jnp.float32)
    ws = _quant_w(wf, axis=(0, 1, 2))
    wq = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)
    return wq.reshape(9, *w_hwio.shape[2:]), ws


def quantize_w_3x3_dgrad(w_hwio):
    """[3, 3, Cin, Cout] -> (w_q [9, Cout, Cin] s8, ws [Cin] f32):
    w_q[3*dy+dx] = w[dy, dx]^T int8-quantized per input channel (the
    dgrad tap shift formula indexes FORWARD tap coordinates; no rot180
    of the weight array itself is needed — see _dgrad3x3_kernel)."""
    wf = w_hwio.astype(jnp.float32)
    ws = _quant_w(wf, axis=(0, 1, 3))
    wq = jnp.clip(jnp.round(wf / ws[None, None, :, None]),
                  -127, 127).astype(jnp.int8)
    cin, cout = w_hwio.shape[2:]
    return jnp.transpose(wq.reshape(9, cin, cout), (0, 2, 1)), ws


# --- VMEM chunk model ---------------------------------------------------------


def _pick_rch(h: int, row_bytes: int, fixed: int,
              budget: int = 100 * 1024 * 1024) -> int:
    """Largest row chunk R dividing h whose estimated VMEM footprint
    (R * row_bytes + fixed) fits the budget.

    Calibrated against the real backend's vmem report for the r50
    stage-1 b128 fwd3x3 (h=56, wp=64, N=128, C=64), which OOM'd at
    r=8: "Used 146.45M of 128.00M" = 74.45M register-spill slots (the
    kernel body's f32 slab + s32 accumulator live chain) + 2-level
    windows at TWICE their naive bytes (the C=64 lane dim pads to 128).
    The _rows_* models below count both effects: every channel count is
    lane-padded via _lanes(), and each quantize chain contributes its
    f32 live value. For that geometry the model predicts 161M at r=8
    (reject) and 90M at r=4 (accept; extrapolating the measured
    per-row cost gives ~83M real, inside the 128M ceiling)."""
    best = None
    for r in range(1, h + 1):
        if h % r:
            continue
        if r * row_bytes + fixed <= budget:
            best = r
    if best is None:
        raise ValueError(
            f"NV train geometry does not fit the VMEM budget even at "
            f"1-row chunks: est {(row_bytes + fixed) / 2**20:.1f} MB vs "
            f"{budget / 2**20:.0f} MB — shrink the batch or image plane")
    return best


def _lanes(c: int) -> int:
    """Lane-padded channel count: the last (lane) dim of every VMEM
    buffer rounds up to 128, so a 64-channel trunk costs the same VMEM
    per element as a 128-channel one (measured: the r50 stage-1 fwd3x3
    OOM report's 32M windows are exactly 2x the bf16[8,64,128,64]
    block's naive bytes)."""
    return -(-c // 128) * 128


def _w_fixed(taps, cin, cout):
    """Resident weight operand (bf16 worst case covers the int8 case)."""
    return taps * cin * _lanes(cout) * 2


def _sliver_fixed(wp, n, c):
    """3x3 halo cost that does not scale with the row chunk: two 1-row
    sliver windows (bf16, 2-level) plus the slab's two extra sliver
    rows living f32+int8 in the kernel body."""
    return wp * n * _lanes(c) * (2 * 4 + 2 * 5)


def _rows_fwd1x1(wp, n, cin, cout, entry):
    pos = wp * n
    ci, co = _lanes(cin), _lanes(cout)
    return pos * (4 * ci            # x window (bf16, 2-level)
                  + 4 * ci          # f32 prologue/quantize live value
                  + ci              # a int8
                  + 4 * co          # s32 acc (spilled)
                  + 4 * co          # y window
                  + (12 * ci if entry else 0))  # res + x_res windows + f32


def _rows_fwd3x3(wp, n, cin, cout):
    pos = wp * n
    ci, co = _lanes(cin), _lanes(cout)
    return pos * (4 * ci            # main window (slivers in fixed)
                  + 4 * ci          # f32 slab (spilled)
                  + ci              # int8 slab
                  + 4 * co          # s32 acc (spilled)
                  + 4 * co)         # y window


def _rows_dgrad1x1(wp, n, cin, cout, entry):
    pos = wp * n
    ci, co = _lanes(cin), _lanes(cout)
    return pos * (4 * co * 2        # dy + y windows
                  + 4 * co          # f32 folded cotangent live value
                  + co              # gq int8
                  + 4 * ci          # x window
                  + 4 * ci          # s32 acc (spilled)
                  + 4 * ci          # f32 dx epilogue
                  + 4 * ci          # dx window
                  + (8 * ci if entry else 0))  # res + dres windows


def _rows_dgrad3x3(wp, n, cin, cout):
    pos = wp * n
    ci, co = _lanes(cin), _lanes(cout)
    return pos * (4 * co * 2 + 4 * co + co  # dy+y windows, f32 g slab, int8
                  + 4 * ci                  # x window
                  + 4 * ci                  # s32 acc (spilled)
                  + 4 * ci                  # f32 dx epilogue
                  + 4 * ci)                 # dx window


def _rows_wgrad1x1(wp, n, cin, cout, entry):
    pos = wp * n
    ci, co = _lanes(cin), _lanes(cout)
    return pos * (4 * co * 2 + 4 * co + co  # dy+y windows, f32 g, int8 g
                  + 4 * ci + 4 * ci + ci    # x window, f32 a, int8 a
                  + (4 * ci if entry else 0))  # res window


def _rows_wgrad3x3(wp, n, cin, cout):
    pos = wp * n
    ci, co = _lanes(cin), _lanes(cout)
    return pos * (4 * co * 2 + 4 * co + co
                  + 4 * ci + 4 * ci + ci)


def _rch_fwd(h, wp, n, cin, cout, conv, entry):
    if conv == "1x1":
        return _pick_rch(h, _rows_fwd1x1(wp, n, cin, cout, entry),
                         _w_fixed(1, cin, cout))
    return _pick_rch(h, _rows_fwd3x3(wp, n, cin, cout),
                     _w_fixed(9, cin, cout) + _sliver_fixed(wp, n, cin))


def _rch_dgrad(h, wp, n, cin, cout, conv, entry):
    if conv == "1x1":
        return _pick_rch(h, _rows_dgrad1x1(wp, n, cin, cout, entry),
                         _w_fixed(1, cout, cin))
    # dy AND y ride sliver views; the g slab carries their sliver rows
    return _pick_rch(h, _rows_dgrad3x3(wp, n, cin, cout),
                     _w_fixed(9, cout, cin)
                     + 2 * _sliver_fixed(wp, n, cout))


def _rch_wgrad(h, wp, n, cin, cout, conv, entry):
    # the dW accumulator is a full VMEM-resident f32 output (x2 level)
    if conv == "1x1":
        return _pick_rch(h, _rows_wgrad1x1(wp, n, cin, cout, entry),
                         cin * _lanes(cout) * 4 * 2)
    return _pick_rch(h, _rows_wgrad3x3(wp, n, cin, cout),
                     9 * cin * _lanes(cout) * 4 * 2
                     + _sliver_fixed(wp, n, cin))


@functools.lru_cache(maxsize=None)
def nv_train_fits(h: int, w_img: int, n: int, cin: int, cb: int,
                  cout: int) -> bool:
    """True when every half kernel of an identity bottleneck block at
    this geometry fits the VMEM budget (all fwd/dgrad/wgrad row-chunk
    picks succeed). models/blocks.py consults this from lane_eligible,
    so oversized geometries (e.g. a 2048-channel entry dgrad whose
    single-row footprint exceeds VMEM) fall back to the XLA path
    instead of failing at compile time."""
    wp = nv_geometry(h, w_img)
    try:
        for ci, co, conv, entry in ((cin, cb, "1x1", True),
                                    (cb, cb, "3x3", False),
                                    (cb, cout, "1x1", False)):
            _rch_fwd(h, wp, n, ci, co, conv, entry)
            _rch_dgrad(h, wp, n, ci, co, conv, entry)
            _rch_wgrad(h, wp, n, ci, co, conv, entry)
    except ValueError:
        return False
    return True


# --- kernel prologue / shared pieces -----------------------------------------


def _prologue_f32(v, s_ref, t_ref, res, mode):
    """f32 prologue: affine + relu per mode. v: [rows, C] f32."""
    if mode == "identity":
        return v
    u = v * s_ref[:] + t_ref[:]
    if mode == "entry":
        u = u + res
    return jnp.maximum(u, 0.0)


def _mask(a, *, wp, n, w):
    m = wcol_mask(a.shape[0], a.shape[1], wp=wp, n=n, w=w)
    return jnp.where(m, a, jnp.zeros_like(a))


def _pin_f32(v, interpret):
    """Pin the f32 rounding of a dequant product under interpret mode:
    XLA's --xla_allow_excess_precision otherwise folds the multiply into
    the downstream bf16 convert with ONE rounding, while real Mosaic (and
    the test mirror) round twice — the fused_block.py interpret-rounding
    class. Mosaic cannot lower the barrier, hence interpret-only."""
    return jax.lax.optimization_barrier(v) if interpret else v


def _quantize_chunk(a):
    """Symmetric int8 with this chunk's own absmax (a must be masked).
    Returns (a_q s8, scale f32 scalar)."""
    amax = jnp.max(jnp.abs(a))
    inv = 127.0 / jnp.maximum(amax, 1e-30)
    return (jnp.clip(jnp.round(a * inv), -127.0, 127.0).astype(jnp.int8),
            amax * (1.0 / 127.0))


def _stats_accum(y, zsum_ref, zssq_ref, *, wp, n, w, masked):
    yf = y.astype(jnp.float32)
    if masked:
        yf = _mask(yf, wp=wp, n=n, w=w)
    part_sum = jnp.sum(yf, axis=0, keepdims=True)
    part_ssq = jnp.sum(jnp.square(yf), axis=0, keepdims=True)
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        zsum_ref[:] = part_sum
        zssq_ref[:] = part_ssq

    @pl.when(k > 0)
    def _acc():
        zsum_ref[:] = zsum_ref[:] + part_sum
        zssq_ref[:] = zssq_ref[:] + part_ssq


def _fold_stats_ct(dy, y, dzsum_ref, dzssq_ref, *, wp, n, w):
    """dy_total = dy + d(zsum) + 2 y d(zssq), masked (the stats were
    masked sums, and border dy columns are garbage)."""
    gf = (dy.astype(jnp.float32) + dzsum_ref[:]
          + 2.0 * y.astype(jnp.float32) * dzssq_ref[:])
    return _mask(gf, wp=wp, n=n, w=w)


# --- forward kernels ----------------------------------------------------------


def _fwd1x1_kernel(*refs, rch, wp, n, w, cin, cout, mode, quant,
                   interpret):
    it = iter(refs)
    x_ref = next(it)
    res_ref = next(it) if mode == "entry" else None
    w_ref = next(it)
    ws_ref = next(it) if quant else None
    s_ref = next(it) if mode != "identity" else None
    t_ref = next(it) if mode != "identity" else None
    y_ref = next(it)
    zsum_ref = next(it)
    zssq_ref = next(it)
    xres_ref = next(it) if mode == "entry" else None

    rows = rch * wp * n
    v = x_ref[...].reshape(rows, cin).astype(jnp.float32)
    res = (res_ref[...].reshape(rows, cin).astype(jnp.float32)
           if mode == "entry" else None)
    a = _mask(_prologue_f32(v, s_ref, t_ref, res, mode), wp=wp, n=n, w=w)
    if mode == "entry":
        xres_ref[...] = a.astype(xres_ref.dtype).reshape(xres_ref.shape)
    if quant:
        aq, a_scale = _quantize_chunk(a)
        acc = jax.lax.dot_general(aq, w_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        yf = acc.astype(jnp.float32) * _pin_f32(
            ws_ref[:] * a_scale, interpret)
    else:
        yf = jax.lax.dot_general(a.astype(jnp.bfloat16), w_ref[:],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    y = _pin_f32(yf, interpret).astype(y_ref.dtype)
    y_ref[...] = y.reshape(y_ref.shape)
    # 1x1 of a masked operand has exactly-zero borders: unmasked stats
    _stats_accum(y, zsum_ref, zssq_ref, wp=wp, n=n, w=w, masked=False)


def _fwd3x3_kernel(*refs, rch, wp, n, w, cin, cout, mode, quant, nsteps,
                   interpret):
    it = iter(refs)
    head_ref, main_ref, tail_ref = next(it), next(it), next(it)
    w_ref = next(it)
    ws_ref = next(it) if quant else None
    s_ref = next(it) if mode != "identity" else None
    t_ref = next(it) if mode != "identity" else None
    y_ref = next(it)
    zsum_ref = next(it)
    zssq_ref = next(it)

    k = pl.program_id(0)

    def pro(piece, zero_when):
        v = piece[...].reshape(-1, cin).astype(jnp.float32)
        a = _prologue_f32(v, s_ref, t_ref, None, mode)
        if zero_when is not None:
            a = jnp.where(zero_when, jnp.zeros_like(a), a)
        return a

    slab = jnp.concatenate(
        [pro(head_ref, k == 0), pro(main_ref, None),
         pro(tail_ref, k == nsteps - 1)], axis=0)
    slab = _mask(slab, wp=wp, n=n, w=w)

    m_out = rch * wp * n
    if quant:
        sq, a_scale = _quantize_chunk(slab)
        acc = jnp.zeros((m_out, cout), jnp.int32)
        for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                     for dx in range(3)):
            lhs = shift_rows(sq, (dy * wp + dx - 1) * n)[:m_out]
            acc = acc + jax.lax.dot_general(
                lhs, w_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        yf = acc.astype(jnp.float32) * _pin_f32(
            ws_ref[:] * a_scale, interpret)
    else:
        sb = slab.astype(jnp.bfloat16)
        yf = jnp.zeros((m_out, cout), jnp.float32)
        for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                     for dx in range(3)):
            lhs = shift_rows(sb, (dy * wp + dx - 1) * n)[:m_out]
            yf = yf + jax.lax.dot_general(
                lhs, w_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    y = _pin_f32(yf, interpret).astype(y_ref.dtype)
    y_ref[...] = y.reshape(y_ref.shape)
    # 3x3 border outputs see shifted image columns: mask the stats
    _stats_accum(y, zsum_ref, zssq_ref, wp=wp, n=n, w=w, masked=True)


# --- backward kernels ---------------------------------------------------------


def _dgrad1x1_kernel(*refs, rch, wp, n, w, cin, cout, mode, quant,
                     interpret):
    it = iter(refs)
    dy_ref = next(it)
    y_ref = next(it)
    dzsum_ref = next(it)
    dzssq_ref = next(it)
    x_ref = next(it)
    res_ref = next(it) if mode == "entry" else None
    dxout_ref = next(it) if mode == "entry" else None
    w_ref = next(it)          # [Cout, Cin] (dgrad-packed)
    ws_ref = next(it) if quant else None  # [1, Cin]
    s_ref = next(it) if mode != "identity" else None
    t_ref = next(it) if mode != "identity" else None
    dx_ref = next(it)
    ds_ref = next(it) if mode != "identity" else None
    dt_ref = next(it) if mode != "identity" else None
    dres_ref = next(it) if mode == "entry" else None

    rows = rch * wp * n
    gf = _fold_stats_ct(dy_ref[...].reshape(rows, cout),
                        y_ref[...].reshape(rows, cout),
                        dzsum_ref, dzssq_ref, wp=wp, n=n, w=w)
    if quant:
        gq, g_scale = _quantize_chunk(gf)
        acc = jax.lax.dot_general(gq, w_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        da = acc.astype(jnp.float32) * _pin_f32(
            ws_ref[:] * g_scale, interpret)
    else:
        da = jax.lax.dot_general(gf.astype(jnp.bfloat16), w_ref[:],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    da = _pin_f32(da, interpret)

    if mode == "identity":
        dx_ref[...] = da.astype(dx_ref.dtype).reshape(dx_ref.shape)
        return

    v = x_ref[...].reshape(rows, cin).astype(jnp.float32)
    u = v * s_ref[:] + t_ref[:]
    if mode == "entry":
        u = u + res_ref[...].reshape(rows, cin).astype(jnp.float32)
        da = da + dxout_ref[...].reshape(rows, cin).astype(jnp.float32)
    du = _mask(jnp.where(u > 0, da, 0.0), wp=wp, n=n, w=w)
    dx_ref[...] = (du * s_ref[:]).astype(dx_ref.dtype).reshape(dx_ref.shape)
    if mode == "entry":
        dres_ref[...] = du.astype(dres_ref.dtype).reshape(dres_ref.shape)

    part_ds = jnp.sum(du * v, axis=0, keepdims=True)
    part_dt = jnp.sum(du, axis=0, keepdims=True)
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        ds_ref[:] = part_ds
        dt_ref[:] = part_dt

    @pl.when(k > 0)
    def _acc():
        ds_ref[:] = ds_ref[:] + part_ds
        dt_ref[:] = dt_ref[:] + part_dt


def _dgrad3x3_kernel(*refs, rch, wp, n, w, cin, cout, mode, quant, nsteps,
                     interpret):
    it = iter(refs)
    dyh_ref, dym_ref, dyt_ref = next(it), next(it), next(it)
    yh_ref, ym_ref, yt_ref = next(it), next(it), next(it)
    dzsum_ref = next(it)
    dzssq_ref = next(it)
    x_ref = next(it)
    w_ref = next(it)          # [9, Cout, Cin]: w_q[3*dy+dx] = w[dy,dx]^T
    ws_ref = next(it) if quant else None
    s_ref = next(it) if mode != "identity" else None
    t_ref = next(it) if mode != "identity" else None
    dx_ref = next(it)
    ds_ref = next(it) if mode != "identity" else None
    dt_ref = next(it) if mode != "identity" else None

    k = pl.program_id(0)

    def gpiece(dy_r, y_r, zero_when):
        g = _fold_stats_ct(dy_r[...].reshape(-1, cout),
                           y_r[...].reshape(-1, cout),
                           dzsum_ref, dzssq_ref, wp=wp, n=n, w=w)
        if zero_when is not None:
            g = jnp.where(zero_when, jnp.zeros_like(g), g)
        return g

    gslab = jnp.concatenate(
        [gpiece(dyh_ref, yh_ref, k == 0), gpiece(dym_ref, ym_ref, None),
         gpiece(dyt_ref, yt_ref, k == nsteps - 1)], axis=0)

    m_out = rch * wp * n
    # da(r, c) = sum_{dy,dx} gf(r - dy + 1, c - dx + 1) . w[dy,dx]^T
    # gslab starts one row early => offset ((2 - dy) * wp + 1 - dx) * N
    if quant:
        gq, g_scale = _quantize_chunk(gslab)
        acc = jnp.zeros((m_out, cin), jnp.int32)
        for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                     for dx in range(3)):
            lhs = shift_rows(gq, ((2 - dy) * wp + 1 - dx) * n)[:m_out]
            acc = acc + jax.lax.dot_general(
                lhs, w_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        da = acc.astype(jnp.float32) * _pin_f32(
            ws_ref[:] * g_scale, interpret)
    else:
        gb = gslab.astype(jnp.bfloat16)
        da = jnp.zeros((m_out, cin), jnp.float32)
        for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                     for dx in range(3)):
            lhs = shift_rows(gb, ((2 - dy) * wp + 1 - dx) * n)[:m_out]
            da = da + jax.lax.dot_general(
                lhs, w_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    da = _pin_f32(da, interpret)

    if mode == "identity":
        dx_ref[...] = da.astype(dx_ref.dtype).reshape(dx_ref.shape)
        return

    v = x_ref[...].reshape(m_out, cin).astype(jnp.float32)
    u = v * s_ref[:] + t_ref[:]
    du = _mask(jnp.where(u > 0, da, 0.0), wp=wp, n=n, w=w)
    dx_ref[...] = (du * s_ref[:]).astype(dx_ref.dtype).reshape(dx_ref.shape)

    part_ds = jnp.sum(du * v, axis=0, keepdims=True)
    part_dt = jnp.sum(du, axis=0, keepdims=True)

    @pl.when(k == 0)
    def _init():
        ds_ref[:] = part_ds
        dt_ref[:] = part_dt

    @pl.when(k > 0)
    def _acc():
        ds_ref[:] = ds_ref[:] + part_ds
        dt_ref[:] = dt_ref[:] + part_dt


def _wgrad1x1_kernel(*refs, rch, wp, n, w, cin, cout, mode, quant):
    it = iter(refs)
    dy_ref = next(it)
    y_ref = next(it)
    dzsum_ref = next(it)
    dzssq_ref = next(it)
    x_ref = next(it)
    res_ref = next(it) if mode == "entry" else None
    s_ref = next(it) if mode != "identity" else None
    t_ref = next(it) if mode != "identity" else None
    dw_ref = next(it)

    rows = rch * wp * n
    gf = _fold_stats_ct(dy_ref[...].reshape(rows, cout),
                        y_ref[...].reshape(rows, cout),
                        dzsum_ref, dzssq_ref, wp=wp, n=n, w=w)
    v = x_ref[...].reshape(rows, cin).astype(jnp.float32)
    res = (res_ref[...].reshape(rows, cin).astype(jnp.float32)
           if mode == "entry" else None)
    a = _mask(_prologue_f32(v, s_ref, t_ref, res, mode), wp=wp, n=n, w=w)

    if quant:
        aq, a_scale = _quantize_chunk(a)
        gq, g_scale = _quantize_chunk(gf)
        contrib = jax.lax.dot_general(
            aq, gq, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32
        ).astype(jnp.float32) * (a_scale * g_scale)
    else:
        contrib = jax.lax.dot_general(
            a.astype(jnp.bfloat16), gf.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        dw_ref[...] = contrib

    @pl.when(k > 0)
    def _acc():
        dw_ref[...] = dw_ref[...] + contrib


def _wgrad3x3_kernel(*refs, rch, wp, n, w, cin, cout, mode, quant, nsteps):
    it = iter(refs)
    xh_ref, xm_ref, xt_ref = next(it), next(it), next(it)
    dy_ref = next(it)
    y_ref = next(it)
    dzsum_ref = next(it)
    dzssq_ref = next(it)
    s_ref = next(it) if mode != "identity" else None
    t_ref = next(it) if mode != "identity" else None
    dw_ref = next(it)  # [9*Cin, Cout]

    k = pl.program_id(0)

    def pro(piece, zero_when):
        v = piece[...].reshape(-1, cin).astype(jnp.float32)
        a = _prologue_f32(v, s_ref, t_ref, None, mode)
        if zero_when is not None:
            a = jnp.where(zero_when, jnp.zeros_like(a), a)
        return a

    slab = _mask(jnp.concatenate(
        [pro(xh_ref, k == 0), pro(xm_ref, None),
         pro(xt_ref, k == nsteps - 1)], axis=0), wp=wp, n=n, w=w)

    m_out = rch * wp * n
    gf = _fold_stats_ct(dy_ref[...].reshape(m_out, cout),
                        y_ref[...].reshape(m_out, cout),
                        dzsum_ref, dzssq_ref, wp=wp, n=n, w=w)

    if quant:
        sq, a_scale = _quantize_chunk(slab)
        gq, g_scale = _quantize_chunk(gf)
        parts = []
        for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                     for dx in range(3)):
            lhs = shift_rows(sq, (dy * wp + dx - 1) * n)[:m_out]
            parts.append(jax.lax.dot_general(
                lhs, gq, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32))
        contrib = jnp.concatenate(parts, axis=0).astype(jnp.float32) * (
            a_scale * g_scale)
    else:
        sb = slab.astype(jnp.bfloat16)
        gb = gf.astype(jnp.bfloat16)
        parts = []
        for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                     for dx in range(3)):
            lhs = shift_rows(sb, (dy * wp + dx - 1) * n)[:m_out]
            parts.append(jax.lax.dot_general(
                lhs, gb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        contrib = jnp.concatenate(parts, axis=0)

    @pl.when(k == 0)
    def _init():
        dw_ref[...] = contrib

    @pl.when(k > 0)
    def _acc():
        dw_ref[...] = dw_ref[...] + contrib


# --- pallas_call plumbing ------------------------------------------------------


def _vec(c):
    return pl.BlockSpec((1, c), lambda k: (0, 0), memory_space=pltpu.VMEM)


def _full(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda k, _n=nd: (0,) * _n,
                        memory_space=pltpu.VMEM)


def _main(rch, wp, n, c):
    return pl.BlockSpec((rch, wp, n, c), lambda k: (k, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _sliver_specs(rch, wp, n, c, h):
    """(head, main, tail) clamped-sliver views of an [h, wp, n, c] array
    (clamping EXPLICIT: real Mosaic faults on out-of-range indices)."""
    return [
        pl.BlockSpec((1, wp, n, c),
                     lambda k: (jax.lax.max(k * rch - 1, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        _main(rch, wp, n, c),
        pl.BlockSpec((1, wp, n, c),
                     lambda k: (jax.lax.min(k * rch + rch, h - 1), 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _compiler_params(interpret):
    return None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)


def _fvec(v, c):
    return jnp.asarray(v, jnp.float32).reshape(1, c)


def _fwd_call(x, w_arg, ws, s, t, res, *, conv, mode, quant, w_img,
              chunk_rows, interpret):
    h, wp, n, cin = x.shape
    cout = w_arg.shape[-1]
    entry = mode == "entry"
    rch = chunk_rows or _rch_fwd(h, wp, n, cin, cout, conv, entry)
    nsteps = h // rch

    inputs, in_specs = [x], []
    if conv == "1x1":
        in_specs.append(_main(rch, wp, n, cin))
        if entry:
            inputs.append(res)
            in_specs.append(_main(rch, wp, n, cin))
        inputs.append(w_arg)
        in_specs.append(_full(tuple(w_arg.shape)))
    else:
        in_specs.extend(_sliver_specs(rch, wp, n, cin, h))
        inputs = [x, x, x, w_arg]
        in_specs.append(_full(tuple(w_arg.shape)))
    if quant:
        inputs.append(_fvec(ws, cout))
        in_specs.append(_vec(cout))
    if mode != "identity":
        inputs += [_fvec(s, cin), _fvec(t, cin)]
        in_specs += [_vec(cin), _vec(cin)]

    out_specs = [_main(rch, wp, n, cout), _vec(cout), _vec(cout)]
    out_shape = [jax.ShapeDtypeStruct((h, wp, n, cout), jnp.bfloat16),
                 jax.ShapeDtypeStruct((1, cout), jnp.float32),
                 jax.ShapeDtypeStruct((1, cout), jnp.float32)]
    if entry:
        out_specs.append(_main(rch, wp, n, cin))
        out_shape.append(jax.ShapeDtypeStruct((h, wp, n, cin),
                                              jnp.bfloat16))

    if conv == "1x1":
        kernel = functools.partial(
            _fwd1x1_kernel, rch=rch, wp=wp, n=n, w=w_img, cin=cin,
            cout=cout, mode=mode, quant=quant, interpret=interpret)
        taps = 1
    else:
        kernel = functools.partial(
            _fwd3x3_kernel, rch=rch, wp=wp, n=n, w=w_img, cin=cin,
            cout=cout, mode=mode, quant=quant, nsteps=nsteps,
            interpret=interpret)
        taps = 9
    outs = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * taps * h * wp * n * cin * cout,
            bytes_accessed=h * wp * n * (2 * cin + 2 * cout)
            + taps * cin * cout,
            transcendentals=0),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(*inputs)
    y, zsum, zssq = outs[0], outs[1][0], outs[2][0]
    return (y, zsum, zssq, outs[3]) if entry else (y, zsum, zssq, None)


def _dgrad_call(dy, y, dzsum, dzssq, x, res, dxout, w_dg, ws_in, s, t, *,
                conv, mode, quant, w_img, chunk_rows, interpret):
    h, wp, n, cin = x.shape
    cout = dy.shape[-1]
    entry = mode == "entry"
    rch = chunk_rows or _rch_dgrad(h, wp, n, cin, cout, conv, entry)
    nsteps = h // rch

    inputs, in_specs = [], []
    if conv == "1x1":
        inputs += [dy, y]
        in_specs += [_main(rch, wp, n, cout), _main(rch, wp, n, cout)]
    else:
        inputs += [dy, dy, dy, y, y, y]
        in_specs += _sliver_specs(rch, wp, n, cout, h)
        in_specs += _sliver_specs(rch, wp, n, cout, h)
    inputs += [_fvec(dzsum, cout), _fvec(dzssq, cout), x]
    in_specs += [_vec(cout), _vec(cout), _main(rch, wp, n, cin)]
    if entry:
        inputs += [res, dxout]
        in_specs += [_main(rch, wp, n, cin), _main(rch, wp, n, cin)]
    inputs.append(w_dg)
    in_specs.append(_full(tuple(w_dg.shape)))
    if quant:
        inputs.append(_fvec(ws_in, cin))
        in_specs.append(_vec(cin))
    if mode != "identity":
        inputs += [_fvec(s, cin), _fvec(t, cin)]
        in_specs += [_vec(cin), _vec(cin)]

    out_specs = [_main(rch, wp, n, cin)]
    out_shape = [jax.ShapeDtypeStruct((h, wp, n, cin), jnp.bfloat16)]
    if mode != "identity":
        out_specs += [_vec(cin), _vec(cin)]
        out_shape += [jax.ShapeDtypeStruct((1, cin), jnp.float32)] * 2
    if entry:
        out_specs.append(_main(rch, wp, n, cin))
        out_shape.append(jax.ShapeDtypeStruct((h, wp, n, cin),
                                              jnp.bfloat16))

    if conv == "1x1":
        kernel = functools.partial(
            _dgrad1x1_kernel, rch=rch, wp=wp, n=n, w=w_img, cin=cin,
            cout=cout, mode=mode, quant=quant, interpret=interpret)
        taps = 1
    else:
        kernel = functools.partial(
            _dgrad3x3_kernel, rch=rch, wp=wp, n=n, w=w_img, cin=cin,
            cout=cout, mode=mode, quant=quant, nsteps=nsteps,
            interpret=interpret)
        taps = 9
    outs = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * taps * h * wp * n * cin * cout,
            bytes_accessed=h * wp * n * (2 * cin + 4 * cout)
            + taps * cin * cout,
            transcendentals=0),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(*inputs)
    dx = outs[0]
    ds = outs[1][0] if mode != "identity" else None
    dt = outs[2][0] if mode != "identity" else None
    dres = outs[3] if entry else None
    return dx, ds, dt, dres


def _wgrad_call(dy, y, dzsum, dzssq, x, res, s, t, *, conv, mode, quant,
                w_img, chunk_rows, interpret):
    h, wp, n, cin = x.shape
    cout = dy.shape[-1]
    entry = mode == "entry"
    rch = chunk_rows or _rch_wgrad(h, wp, n, cin, cout, conv, entry)
    nsteps = h // rch

    inputs, in_specs = [], []
    if conv == "3x3":
        inputs += [x, x, x]
        in_specs += _sliver_specs(rch, wp, n, cin, h)
        inputs += [dy, y]
        in_specs += [_main(rch, wp, n, cout), _main(rch, wp, n, cout)]
    else:
        inputs += [dy, y]
        in_specs += [_main(rch, wp, n, cout), _main(rch, wp, n, cout)]
    inputs += [_fvec(dzsum, cout), _fvec(dzssq, cout)]
    in_specs += [_vec(cout), _vec(cout)]
    if conv == "1x1":
        inputs.append(x)
        in_specs.append(_main(rch, wp, n, cin))
        if entry:
            inputs.append(res)
            in_specs.append(_main(rch, wp, n, cin))
    if mode != "identity":
        inputs += [_fvec(s, cin), _fvec(t, cin)]
        in_specs += [_vec(cin), _vec(cin)]

    if conv == "1x1":
        kernel = functools.partial(
            _wgrad1x1_kernel, rch=rch, wp=wp, n=n, w=w_img, cin=cin,
            cout=cout, mode=mode, quant=quant)
        dw_shape = (cin, cout)
        taps = 1
    else:
        kernel = functools.partial(
            _wgrad3x3_kernel, rch=rch, wp=wp, n=n, w=w_img, cin=cin,
            cout=cout, mode=mode, quant=quant, nsteps=nsteps)
        dw_shape = (9 * cin, cout)
        taps = 9
    dw = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(dw_shape, lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(dw_shape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * taps * h * wp * n * cin * cout,
            bytes_accessed=h * wp * n * (2 * cin + 4 * cout)
            + taps * cin * cout * 4,
            transcendentals=0),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(*inputs)
    if conv == "3x3":
        return dw.reshape(3, 3, cin, cout)
    return dw


# --- custom-VJP half op --------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_half(conv: str, mode: str, quant: bool, quant_bwd: bool,
               w_img: int, chunk_rows: Optional[int], interpret: bool):
    """Build (and cache) the differentiable NV half op for one static
    config. Positional signature: (x[, res], w[, s, t]); returns
    (y, zsum, zssq) — plus x_res in entry mode."""
    entry = mode == "entry"
    affine = mode != "identity"

    def unpack(args):
        it = iter(args)
        x = next(it)
        res = next(it) if entry else None
        w = next(it)
        s = next(it) if affine else None
        t = next(it) if affine else None
        return x, res, w, s, t

    def quant_fwd_w(w):
        if not quant:
            return (w.reshape(9, *w.shape[2:]).astype(jnp.bfloat16)
                    if conv == "3x3" else w.astype(jnp.bfloat16)), None
        if conv == "3x3":
            return quantize_w_3x3(w)
        return quantize_w_1x1(w)

    def quant_dgrad_w(w):
        if not quant_bwd:
            if conv == "3x3":
                cin, cout = w.shape[2:]
                wt = jnp.transpose(w.reshape(9, cin, cout).astype(
                    jnp.bfloat16), (0, 2, 1))
                return wt, None
            return w.astype(jnp.bfloat16).T, None
        if conv == "3x3":
            return quantize_w_3x3_dgrad(w)
        return quantize_w_1x1_dgrad(w)

    def run_fwd(x, res, w, s, t):
        w_arg, ws = quant_fwd_w(w)
        return _fwd_call(x, w_arg, ws, s, t, res, conv=conv, mode=mode,
                         quant=quant, w_img=w_img, chunk_rows=chunk_rows,
                         interpret=interpret)

    @jax.custom_vjp
    def op(*args):
        y, zsum, zssq, xres = run_fwd(*unpack(args))
        return (y, zsum, zssq, xres) if entry else (y, zsum, zssq)

    def fwd(*args):
        x, res, w, s, t = unpack(args)
        y, zsum, zssq, xres = run_fwd(x, res, w, s, t)
        out = (y, zsum, zssq, xres) if entry else (y, zsum, zssq)
        return out, (x, res, w, s, t, y)

    def bwd(resid, cts):
        x, res, w, s, t, y = resid
        if entry:
            dy, dzsum, dzssq, dxout = cts
        else:
            dy, dzsum, dzssq = cts
            dxout = None
        w_dg, ws_in = quant_dgrad_w(w)
        dx, ds, dt, dres = _dgrad_call(
            dy, y, dzsum, dzssq, x, res, dxout, w_dg, ws_in, s, t,
            conv=conv, mode=mode, quant=quant_bwd, w_img=w_img,
            chunk_rows=chunk_rows, interpret=interpret)
        dw = _wgrad_call(
            dy, y, dzsum, dzssq, x, res, s, t, conv=conv, mode=mode,
            quant=quant_bwd, w_img=w_img, chunk_rows=chunk_rows,
            interpret=interpret)
        out = [dx]
        if entry:
            out.append(dres)
        out.append(dw.astype(w.dtype))
        if affine:
            out += [ds.astype(s.dtype), dt.astype(t.dtype)]
        return tuple(out)

    op.defvjp(fwd, bwd)
    return op


def _common_checks(x, w_img):
    h, wp, n, cin = x.shape
    check_nv(wp, w_img)
    if n % 32 or n & (n - 1):
        raise ValueError(f"N={n} must be a pow2 multiple of the 32-row "
                         f"int8 sublane tile")
    return h, wp, n, cin


def nv_half_1x1(x, w, s=None, t=None, res=None, *, mode: str = "affine",
                w_img: int, quant: bool = True, quant_bwd: bool = True,
                chunk_rows: Optional[int] = None, interpret: bool = False):
    """Differentiable 1x1-conv half in the NV carrier.

    x: [h, wp, N, Cin] bf16 (the previous half's RAW accumulator, or a
    materialized activation in "identity"/"entry" modes). w: [Cin, Cout].
    s, t: [Cin] f32 folded BatchNorm affine ("affine"/"entry" modes).
    res: [h, wp, N, Cin] bf16 residual carrier ("entry" mode).

    Returns (y [h, wp, N, Cout] bf16 raw conv accumulator,
    zsum [Cout] f32, zssq [Cout] f32) — the masked per-channel sum /
    sum-of-squares of y (the next BatchNorm's statistics). In "entry"
    mode additionally returns x_res = relu(s*x + t + res) bf16, the
    block's materialized residual carrier.
    """
    if mode not in _MODES:
        raise ValueError(f"mode={mode!r} not in {_MODES}")
    _common_checks(x, w_img)
    op = _make_half("1x1", mode, quant, quant_bwd, w_img, chunk_rows,
                    interpret)
    args = [x]
    if mode == "entry":
        if res is None:
            raise ValueError("entry mode needs a residual carrier")
        args.append(res)
    args.append(w)
    if mode != "identity":
        args += [jnp.asarray(s, jnp.float32), jnp.asarray(t, jnp.float32)]
    return op(*args)


def nv_half_3x3(x, w, s=None, t=None, *, mode: str = "affine",
                w_img: int, quant: bool = True, quant_bwd: bool = True,
                chunk_rows: Optional[int] = None, interpret: bool = False):
    """Differentiable stride-1 SAME 3x3-conv half in the NV carrier
    (conv2 of an identity bottleneck block). Same contract as
    nv_half_1x1 (no entry mode: conv2 never sits at a block boundary).

    w: [3, 3, Cin, Cout] HWIO.
    """
    if mode not in ("identity", "affine"):
        raise ValueError(f"3x3 half supports identity/affine, got {mode!r}")
    _common_checks(x, w_img)
    op = _make_half("3x3", mode, quant, quant_bwd, w_img, chunk_rows,
                    interpret)
    args = [x, w]
    if mode != "identity":
        args += [jnp.asarray(s, jnp.float32), jnp.asarray(t, jnp.float32)]
    return op(*args)
