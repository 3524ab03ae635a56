"""Post-training int8 quantization for serving (w8a8, per-channel weights).

Why this exists: the v5e MXU has a 2x-throughput int8 mode that XLA's conv
lowering never engages (measured round 2/3, tools/bench_int8_mxu.py: bf16
matmul 184 T/s ~ near peak, int8 XLA dot_general 423 T/s, int8 Mosaic
~737 T/s on 4096^3). The lane-packed Pallas conv (ops/pallas/conv.py)
accepts int8 operands with s32 accumulation and beats the bf16 XLA conv at
every WRN-28-10 stage shape (0.59/0.41/0.41 ms vs 0.82/0.74/0.43, requant
included). This module turns that kernel-level win into an end-to-end
serving path.

Scheme (standard w8a8 PTQ):
- **Weights**: per-output-channel symmetric int8, scale = absmax/127, done
  once at load time (no data needed).
- **Activations**: per-tensor symmetric int8, scale calibrated as the
  absmax of each conv's input over a handful of batches run in the float
  path (the observers ride the same program, so calibration and serving
  cannot disagree about where a conv's input is measured).
- **Compute**: eligible 3x3 stride-1 SAME convs run int8 x int8 -> s32 on
  the MXU's double-rate mode via conv3x3_lanes; everything around them
  (BatchNorm eval affines, ReLU, dequant/requant) stays in f32/bf16
  elementwise chains that XLA fuses. Non-eligible shapes (the input conv,
  stride-2 transitions, 1x1 projections, the FC head) stay bf16.
- **Layout**: consecutive eligible residual blocks execute in the kernels'
  lane layout ([C, B*H*W]), converting once per run — the same transpose
  hoisting the fused-block train path uses (models/layers.py Sequential) —
  so per-block NHWC<->lane HBM round trips don't eat the MXU win.

Eligibility: basic AND bottleneck residual blocks (either ordering:
preact v2 or post-act v1). Identity-shortcut basic blocks quantize both
3x3s on the lane kernels; shortcut-transforming basic transition blocks
quantize conv2 (3x3/s1 at the output geometry — the block's FLOP bulk)
with the transformed shortcut riding its requant epilogue, while the
strided/channel-changing conv1 and the 1x1 projection stay bf16. For
the basic family, channel counts must divide 32 (the int8 sublane
tile) and B*H*W must divide 128 (the lane tile); for the shipped
configs this covers 22 of the WRN-28-10 trunk's 24 convs (~97% of the
FLOPs); v1 CIFAR nets (16/32/64 channels) fall back to bf16 wholesale.

Bottleneck blocks take a different substrate, chosen by measurement
(BASELINE.md "Int8 serving, bottleneck family"): identity-shortcut
blocks stay in NHWC and run their two 1x1s as XLA int8 ``dot_general``
(which DOES engage the v5e 2x int8 MXU mode — unlike XLA's conv
lowering), with the quant/dequant/BN/relu interludes left to XLA's
elementwise fusion; the mid 3x3 stays bf16 XLA. The pallas lane-matmul
1x1 (ops/pallas/conv1x1.py) wins 2.2-2.9x at kernel level but LOSES
end-to-end (0.50x measured on ResNet-50 @224): its custom-call layout
constraints force full-tensor layout copies against XLA's preferred
conv layouts at every block — the same custom-call-boundary lesson as
the bf16 fused block-half, now on the serving axis. The 3x3 lane
kernel cannot serve ImageNet geometries at all: HW with a 49 factor
forces 6272-lane whole-image tiles, overflowing the 16MB scoped VMEM
at width >= 128 (compile-time OOM, now guarded in _pick_tile) and
measured slower than bf16 XLA at width 64. Bottleneck eligibility is
a measured crossover, N = B*H*W >= 32 * in_channels: the int8 dots
win 1.29-1.35x per block at ResNet-50 stages 1-2, are neutral at
stage 3, and lose 0.44x at stage 4 where the quantize chains dwarf the
tiny dots. Bottleneck transitions stay float wholesale.

Reference parity: none — the reference (lucaslingle/pytorch_ddp_resnet)
has no serving or quantization story; this is a beyond-reference
capability on the serving surface (algos/predict.py), validated against
the trained hard-task checkpoints in ACCURACY.md.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_ddp_resnet_tpu.models.blocks import (
    BottleneckResidualBlock,
    ResidualBlock,
    _subsample,
)
from pytorch_ddp_resnet_tpu.models.layers import Sequential
from pytorch_ddp_resnet_tpu.ops.pallas.bneck_nv import (
    bneck_block_nv,
    bneck_transition_nv,
    fold_transition_scales,
    from_nv,
    quantize_to_nv,
)
from pytorch_ddp_resnet_tpu.ops.pallas.nv_common import (
    fold_block_scales,
    pack_w2,
)
from pytorch_ddp_resnet_tpu.ops.pallas.conv import (
    _pick_tile,
    conv3x3_lanes,
    conv3x3_lanes_requant,
    pack_weights,
)


def quantize_conv_weights(w_hwio: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: returns (w_q [HWIO int8],
    scale [Cout] f32) with w ~= w_q * scale (max elementwise error
    scale/2)."""
    wf = jnp.asarray(w_hwio, jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def _quantize_act(a_f32: jax.Array, scale) -> jax.Array:
    """Per-tensor symmetric int8 activation quantization."""
    return jnp.clip(jnp.round(a_f32 / scale), -127, 127).astype(jnp.int8)


def _bn_eval_affine(bn_layer, p: Dict, s: Dict):
    """Eval-mode BatchNorm as a per-channel (inv, shift) affine:
    BN(x) = x * inv + shift — the same formula BatchNorm.apply evaluates
    (models/layers.py:195-198)."""
    inv = jax.lax.rsqrt(s["var"] + bn_layer.eps) * p["scale"]
    return inv, p["bias"] - s["mean"] * inv


def _conv_eligible(conv, hw: int, n: int) -> bool:
    if not (conv.kernel_size == 3 and conv.stride == 1 and conv.padding == 1
            and not conv.use_bias
            and conv.in_channels % 32 == 0 and conv.out_channels % 32 == 0):
        return False
    try:
        _pick_tile(hw, n, max(conv.in_channels, conv.out_channels))
    except ValueError:
        return False
    return True


def _conv1x1_ok(conv) -> bool:
    """Structural gate for a 1x1 run as an XLA int8 dot_general: no
    alignment constraints (XLA owns the layouts), just the shape family
    the dot path implements."""
    return conv.kernel_size == 1 and conv.stride == 1 and not conv.use_bias


def _block_eligible(block, shape) -> bool:
    """Static gate for the LANE-kernel path: identity-shortcut basic
    residual block with both 3x3s int8-lane-eligible at this activation
    geometry. (Bottleneck blocks take the NHWC XLA-dot path instead —
    _bneck_eligible.)"""
    b, h, w, c = shape
    n = b * h * w
    if not isinstance(block, ResidualBlock) or block.transforms_shortcut:
        return False
    sub = {name: layer for name, layer, _ in block._sublayers()}
    return (_conv_eligible(sub["conv1"], h * w, n)
            and _conv_eligible(sub["conv2"], h * w, n))


def _bneck_eligible(block, shape) -> bool:
    """Static gate for the NHWC int8-dot bottleneck path: identity
    shortcut, structural 1x1s, and the measured crossover N >= 32*Cin
    (per-block A/B at the ResNet-50 stage shapes, BASELINE.md: the int8
    dots win 1.29-1.35x where activations dwarf the quantize chains,
    lose 0.44x at the 7x7 stage where they don't)."""
    if not isinstance(block, BottleneckResidualBlock):
        return False
    if getattr(block, "transforms_shortcut", True):
        return False
    b, h, w, c = shape
    sub = {name: layer for name, layer, _ in block._sublayers()}
    return (_conv1x1_ok(sub["conv1"]) and _conv1x1_ok(sub["conv3"])
            and sub["conv2"].stride == 1
            and b * h * w >= 32 * block.in_channels)


def _nv_id_eligible(block, shape) -> bool:
    """Static gate for the NV-trunk identity blocks (ops/pallas/
    bneck_nv.py): post-act identity-shortcut bottleneck, 32-aligned
    channels, pow2 batch (the kernels' W-coordinate masks use bit ops).
    Unlike the XLA-dot path there is NO N >= 32*Cin crossover: the NV
    carrier amortizes entry/exit over the whole trunk, so the 7x7 stage
    rides along."""
    if not isinstance(block, BottleneckResidualBlock) or block.preact:
        return False
    if getattr(block, "transforms_shortcut", True):
        return False
    if len(shape) != 4 or shape[3] != block.in_channels:
        return False
    b = shape[0]
    sub = {name: layer for name, layer, _ in block._sublayers()}
    c2 = sub["conv2"]
    return (c2.kernel_size == 3 and c2.padding == 1 and c2.stride == 1
            and block.in_channels % 32 == 0
            and block.bottleneck_channels % 32 == 0
            and b % 32 == 0 and b & (b - 1) == 0)


def _nv_trans_eligible(block, shape) -> bool:
    """Static gate for NV-trunk transition blocks: post-act projection
    (use_proj) bottleneck at stride 1 or 2 (stride 2 needs even h, w —
    the parity-select subsampling), all three channel counts 32-aligned,
    pow2 batch."""
    if not isinstance(block, BottleneckResidualBlock) or block.preact:
        return False
    if not getattr(block, "transforms_shortcut", False) or not block.use_proj:
        return False
    if len(shape) != 4 or shape[3] != block.in_channels:
        return False
    b, h, w, _ = shape
    st = block.stride
    if st not in (1, 2) or (st == 2 and (h % 2 or w % 2)):
        return False
    return (block.in_channels % 32 == 0
            and block.bottleneck_channels % 32 == 0
            and block.out_channels % 32 == 0
            and b % 32 == 0 and b & (b - 1) == 0)


def _transition_out_shape(block, shape):
    b, h, w, _ = shape
    st = block.stride
    return (b, (h - 1) // st + 1, (w - 1) // st + 1, block.out_channels)


def _transition_eligible(block, shape) -> bool:
    """Static gate for shortcut-transforming basic blocks: conv2 (3x3/s1 at
    the output geometry) is lane-int8-eligible. conv1 (strided or
    channel-changing) and the projection shortcut stay bf16 on XLA."""
    if not isinstance(block, ResidualBlock) or not block.transforms_shortcut:
        return False
    if shape[3] != block.in_channels:
        return False
    b, oh, ow, _ = _transition_out_shape(block, shape)
    sub = {name: layer for name, layer, _ in block._sublayers()}
    return _conv_eligible(sub["conv2"], oh * ow, b * oh * ow)


class Int8Inference:
    """Quantized eval-mode forward for a spec-built ResNet.

    Two modes share one program structure (so the calibration observers sit
    at exactly the conv inputs the int8 path quantizes):

    - ``calibrate_fn()`` -> jittable ``f(x) -> (logits, stats)`` running the
      float path with per-conv-input absmax observers; feed a few batches,
      max-reduce the stats, divide by 127 -> ``act_scales``.
    - ``serve_fn(act_scales)`` -> jittable ``f(x) -> logits`` running the
      int8 path (quantized weights are baked in as jit constants).

    Non-eligible layers/blocks delegate to the model's own ``apply`` with
    ``train=False``, so everything outside the quantized trunk is
    bit-identical to the float Predictor.
    """

    def __init__(self, model, params, state, fused_bneck=False,
                 nv_grid="auto", nv_conv2_impl=None):
        # fused_bneck: False -> XLA int8 dots for bottleneck blocks;
        # "nv" (or True) -> batch-in-sublanes NV trunk
        # (ops/pallas/bneck_nv.py: identity AND transition blocks
        # fused, int8 carriers end-to-end — the measured-best substrate,
        # wrn-50-2 serving 1.18x vs float). The round-4 padded-flat
        # kernel (0.79-0.93x e2e) was displaced by the NV family in
        # round 5; its numbers live in BASELINE.md "Fused bottleneck
        # kernel, round 4".
        # nv_grid: "auto" -> joint (row-chunk, batch-tile) pick
        # (_pick_grid, round 5); "legacy" -> the pre-round-5
        # single-batch-tile grid (A/B hook, tools/bench_bneck.py e2e).
        # nv_conv2_impl: None -> per-kernel defaults (identity dots9,
        # transition grouped3); "dots9"/"grouped3" -> force both. The
        # two impls are bit-equal (tests/test_bneck_nv.py parametrizes
        # both against the same mirror) — this is a perf-only knob.
        self.model = model
        self.params = params
        self.state = state
        self.fused_bneck = "nv" if fused_bneck is True else fused_bneck
        if nv_grid not in ("auto", "legacy"):
            raise ValueError(f"nv_grid={nv_grid!r} not in ('auto', 'legacy')")
        self.nv_grid = nv_grid
        if nv_conv2_impl not in (None, "dots9", "grouped3"):
            raise ValueError(f"nv_conv2_impl={nv_conv2_impl!r} not in "
                             f"(None, 'dots9', 'grouped3')")
        self.nv_conv2_impl = nv_conv2_impl
        self.interpret = jax.default_backend() != "tpu"
        # static per-(stack, block) conv weight quantization, packed for the
        # lane kernel: key -> (w_q_packed [Cout, 9*Cin] int8, scale [Cout])
        self._wq: Dict[str, Tuple[jax.Array, jax.Array]] = {}
        self._wq_ready = False

    # --- weight prep -----------------------------------------------------

    def _packed_qweights(self, key: str, w_hwio) -> Tuple[jax.Array, jax.Array]:
        if key not in self._wq:
            # eager even under an active jit trace: the cache outlives the
            # trace (serve_fn may be jitted more than once per instance),
            # so cached values must be concrete, not leaked tracers
            with jax.ensure_compile_time_eval():
                w_q, scale = quantize_conv_weights(w_hwio)
                self._wq[key] = (pack_weights(w_q), scale)
        return self._wq[key]

    def _qweights_nhwc(self, key: str, w_hwio) -> Tuple[jax.Array, jax.Array]:
        """1x1 weights for the NHWC int8-dot bottleneck path: [Cin, Cout]
        int8 + per-output-channel scale [Cout]."""
        if key not in self._wq:
            with jax.ensure_compile_time_eval():
                w_q, scale = quantize_conv_weights(w_hwio)
                kh, kw, cin, cout = w_q.shape
                self._wq[key] = (w_q.reshape(cin, cout), scale)
        return self._wq[key]

    # --- the shared walk ---------------------------------------------------

    def _forward(self, x, act_scales: Optional[Dict[str, Any]], stats=None,
                 params=None, state=None):
        """One eval forward. ``act_scales=None`` -> float mode (optionally
        recording absmax observers into ``stats``); dict -> int8 mode.
        ``params``/``state`` default to the instance pytrees (closure
        constants when jitted); pass them explicitly to keep big models'
        weights out of the compiled program text (see serve_args_fn)."""
        model = self.model
        params = self.params if params is None else params
        state = self.state if state is None else state
        cd = model.compute_dtype

        # flatten the spine (stacks expand to their blocks) so the int8
        # path can look one item ahead: a dual conv2 epilogue emits the
        # NEXT eligible block's quantized input alongside the carrier
        items = []
        for name, layer in model.spine.layers:
            if isinstance(layer, Sequential):  # residual stack
                for bname, block in layer.layers:
                    items.append((f"{name}/{bname}", block,
                                  params[name][bname],
                                  state.get(name, {}).get(bname, {})))
            else:
                items.append((name, layer, params.get(name, {}),
                              state.get(name, {})))

        def is_block(obj):
            return isinstance(obj, ResidualBlock)

        def eligible(idx, shape) -> bool:
            key, obj, _, _ = items[idx]
            if not is_block(obj) or len(shape) != 4:
                return False
            if not _block_eligible(obj, shape):
                return False
            return act_scales is None or f"{key}/conv1" in act_scales

        def bneck_ok(idx, shape) -> bool:
            key, obj, _, _ = items[idx]
            if len(shape) != 4:
                return False
            if _bneck_eligible(obj, shape):
                return act_scales is None or f"{key}/conv1" in act_scales
            # float-mode observer coverage for NV-trunk identity blocks
            # the XLA-dot crossover rejects (e.g. the 7x7 stage): the
            # float body computes any identity bottleneck correctly
            return (act_scales is None and self.fused_bneck == "nv"
                    and _nv_id_eligible(obj, shape))

        def nv_ok(idx, shape) -> bool:
            """Int8-mode gate for the NV trunk (identity AND transition
            blocks; float-mode observers ride bneck_ok/nv_trans_float)."""
            key, obj, _, _ = items[idx]
            if (self.fused_bneck != "nv" or act_scales is None
                    or len(shape) != 4):
                return False
            if not (_nv_id_eligible(obj, shape)
                    or _nv_trans_eligible(obj, shape)):
                return False
            return all(f"{key}/conv{i}" in act_scales for i in (1, 2, 3))

        def nv_trans_float_ok(idx, shape) -> bool:
            key, obj, _, _ = items[idx]
            return (act_scales is None and self.fused_bneck == "nv"
                    and len(shape) == 4 and _nv_trans_eligible(obj, shape))

        def trans_ok(idx, shape) -> bool:
            key, obj, _, _ = items[idx]
            if not is_block(obj) or len(shape) != 4:
                return False
            if not _transition_eligible(obj, shape):
                return False
            return act_scales is None or f"{key}/conv2" in act_scales

        def delane(lane):
            x_cs, (b, h, w, c) = lane
            return jnp.transpose(x_cs.reshape(c, b, h, w), (1, 2, 3, 0))

        lane = None     # (x_cs, (b, h, w, c)) while inside an eligible run
        pending_q = None  # s8 conv1 input from the previous dual epilogue
        nvst = None     # (q [h, wp, N, C] int8, (b, h, w, c)) NV-trunk run
        for idx, (key, obj, p, s) in enumerate(items):
            if nvst is not None:
                shape = nvst[1]
            elif lane is not None:
                shape = lane[1]
            else:
                shape = getattr(x, "shape", ())
            if nv_ok(idx, shape):
                # NV trunk: batch-in-sublanes int8 carriers through
                # identity AND transition blocks — float boundaries only
                # at the run's entry (quantize_to_nv) and exit (from_nv)
                pending_q = None
                if lane is not None:
                    x, lane = delane(lane), None
                s_in = act_scales[f"{key}/conv1"]
                if nvst is None:
                    x_nv = quantize_to_nv(x.astype(jnp.float32), s_in)
                else:
                    x_nv = nvst[0]
                out_shape = (_transition_out_shape(obj, shape)
                             if obj.transforms_shortcut else shape)
                s_out = None
                if idx + 1 < len(items) and nv_ok(idx + 1, out_shape):
                    s_out = act_scales[f"{items[idx + 1][0]}/conv1"]
                out = self._bneck_nv(obj, p, s, x_nv, key, act_scales,
                                     s_in, s_out, shape=shape)
                if s_out is None:
                    x = from_nv(out, out_shape[2]).astype(cd)
                    nvst = None
                else:
                    nvst = (out, out_shape)
            elif nv_trans_float_ok(idx, shape):
                # calibration observers for transition blocks (the float
                # walk otherwise delegates them to block.apply)
                pending_q = None
                if lane is not None:
                    x, lane = delane(lane), None
                x = self._bneck_trans_float(obj, p, s, x, key, stats)
            elif eligible(idx, shape):
                if lane is None:
                    b, h, w, c = shape
                    x_cs = jnp.transpose(
                        x.astype(cd), (3, 0, 1, 2)).reshape(c, b * h * w)
                    lane = (x_cs, shape)
                nxt = None
                if (act_scales is not None and idx + 1 < len(items)
                        and eligible(idx + 1, shape)
                        and items[idx + 1][1].preact == obj.preact):
                    nxt = items[idx + 1]
                x_cs, pending_q = self._block_lane(
                    obj, p, s, lane[0], lane[1], key, act_scales, stats,
                    q_in=pending_q, nxt=nxt)
                lane = (x_cs, lane[1])
            elif bneck_ok(idx, shape):
                # bottleneck: NHWC, int8 XLA dots, no lane carrier
                pending_q = None
                if lane is not None:
                    x, lane = delane(lane), None
                x = self._bneck_nhwc(obj, p, s, x, key, act_scales, stats)
            elif trans_ok(idx, shape):
                # stage transition: conv1/shortcut in NHWC bf16, conv2 int8
                # in lane layout; the run continues at the new geometry
                if lane is not None:
                    x, lane = delane(lane), None
                out_shape = _transition_out_shape(obj, shape)
                nxt = None
                if (act_scales is not None and idx + 1 < len(items)
                        and eligible(idx + 1, out_shape)
                        and items[idx + 1][1].preact == obj.preact):
                    nxt = items[idx + 1]
                x_cs, pending_q = self._transition_lane(
                    obj, p, s, x, key, act_scales, stats, nxt=nxt)
                lane = (x_cs, out_shape)
            else:
                pending_q = None
                if lane is not None:
                    x, lane = delane(lane), None
                x, _ = obj.apply(p, s, x, train=False)
        if lane is not None:
            x = delane(lane)
        return x

    def _block_lane(self, block, p, s, x_cs, shape, key, act_scales, stats,
                    q_in=None, nxt=None):
        """One eligible basic block in lane layout [C, B*H*W]. Returns
        (new_carrier, next_block_q_or_None)."""
        b, h, w, c = shape
        sub = {n: layer for n, layer, _ in block._sublayers()}
        i1, t1 = _bn_eval_affine(sub["norm1"], p["norm1"], s["norm1"])
        i2, t2 = _bn_eval_affine(sub["norm2"], p["norm2"], s["norm2"])
        cd = block.compute_dtype

        if act_scales is not None:
            return self._block_lane_int8(
                block, p, x_cs, h, w, key, act_scales, i1, t1, i2, t2,
                q_in=q_in, nxt=nxt)

        # float path (calibration): f32 elementwise, observers at exactly
        # the conv inputs the int8 path quantizes
        xf = x_cs.astype(jnp.float32)

        def conv(a_f32, cname, bn_inv):
            """a_f32 [Cin, N] -> conv output [Cout, N] f32, with the
            *following* BN's inv folded in when given."""
            ckey = f"{key}/{cname}"
            if stats is not None:
                stats[ckey] = jnp.max(jnp.abs(a_f32))
            y = conv3x3_lanes(a_f32.astype(cd),
                              pack_weights(p[cname]["w"].astype(cd)),
                              h=h, w_img=w, interpret=self.interpret)
            yf = y.astype(jnp.float32)
            return yf * bn_inv[:, None] if bn_inv is not None else yf

        if block.preact:
            # norm1 -> relu -> conv1 -> norm2 -> relu -> conv2, identity add
            a1 = jnp.maximum(xf * i1[:, None] + t1[:, None], 0.0)
            z = conv(a1, "conv1", i2) + t2[:, None]
            a2 = jnp.maximum(z, 0.0)
            y = conv(a2, "conv2", None)
            return (xf + y).astype(cd), None
        # post-act v1: conv1 -> norm1 -> relu -> conv2 -> norm2, add, relu
        z = conv(xf, "conv1", i1) + t1[:, None]
        a = jnp.maximum(z, 0.0)
        y = conv(a, "conv2", i2) + t2[:, None]
        return jnp.maximum(xf + y, 0.0).astype(cd), None

    def _bneck_nhwc(self, block, p, s, x, key, act_scales, stats):
        """Identity-shortcut bottleneck block in NHWC: the two 1x1s run
        as XLA int8 ``dot_general`` over the channel dim (the v5e 2x int8
        MXU mode engages for dots — tools/bench_int8_mxu.py), the mid 3x3
        stays bf16 XLA, and every quant/dequant/BN/relu interlude is left
        to XLA's elementwise fusion. No custom calls: the pallas lane
        1x1 wins at kernel level but its pinned layouts force full-tensor
        copies against XLA's conv layouts (measured 0.50x end-to-end on
        ResNet-50 — BASELINE.md). Block semantics: reference
        residual_block.py:102-215."""
        sub = {n: layer for n, layer, _ in block._sublayers()}
        i1, t1 = _bn_eval_affine(sub["norm1"], p["norm1"], s["norm1"])
        i2, t2 = _bn_eval_affine(sub["norm2"], p["norm2"], s["norm2"])
        i3, t3 = _bn_eval_affine(sub["norm3"], p["norm3"], s["norm3"])
        cd = block.compute_dtype
        xf = x.astype(jnp.float32)

        def conv3(a_f32, inv, sh):
            """Mid 3x3 (bf16 XLA NHWC) + following BN affine + relu. The
            XLA-dot int8 path keeps this conv bf16, but the fused block
            kernel quantizes it too, so calibration records its input
            observer alongside the 1x1s."""
            if stats is not None:
                stats[f"{key}/conv2"] = jnp.max(jnp.abs(a_f32))
            z = jax.lax.conv_general_dilated(
                a_f32.astype(cd), p["conv2"]["w"].astype(cd), (1, 1),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(z.astype(jnp.float32) * inv + sh, 0.0)

        if act_scales is None:  # float / calibration mode
            def conv1x1(a_f32, cname):
                if stats is not None:
                    stats[f"{key}/{cname}"] = jnp.max(jnp.abs(a_f32))
                kh, kw, cin, cout = p[cname]["w"].shape
                wt = p[cname]["w"].reshape(cin, cout).astype(cd)
                return jnp.dot(a_f32.astype(cd), wt).astype(jnp.float32)

            if block.preact:
                a1 = jnp.maximum(xf * i1 + t1, 0.0)
                a2 = jnp.maximum(conv1x1(a1, "conv1") * i2 + t2, 0.0)
                a3 = conv3(a2, i3, t3)
                return (xf + conv1x1(a3, "conv3")).astype(cd)
            a1 = jnp.maximum(conv1x1(xf, "conv1") * i1 + t1, 0.0)
            a2 = conv3(a1, i2, t2)
            z3 = conv1x1(a2, "conv3") * i3 + t3
            return jnp.maximum(xf + z3, 0.0).astype(cd)

        # int8 mode: per-tensor act scales (static), per-out-channel
        # weight scales; dequant folded into the dot's output fusion
        s1 = act_scales[f"{key}/conv1"]
        s3 = act_scales[f"{key}/conv3"]

        def dot_int8(a_f32, cname, a_scale):
            w_q, w_s = self._qweights_nhwc(f"{key}/{cname}",
                                           p[cname]["w"])
            q = _quantize_act(a_f32, a_scale)
            acc = jax.lax.dot_general(
                q, w_q, (((a_f32.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * (a_scale * w_s)

        if block.preact:
            a1 = jnp.maximum(xf * i1 + t1, 0.0)
            a2 = jnp.maximum(dot_int8(a1, "conv1", s1) * i2 + t2, 0.0)
            a3 = conv3(a2, i3, t3)
            return (xf + dot_int8(a3, "conv3", s3)).astype(cd)
        a1 = jnp.maximum(dot_int8(xf, "conv1", s1) * i1 + t1, 0.0)
        a2 = conv3(a1, i2, t2)
        z3 = dot_int8(a2, "conv3", s3) * i3 + t3
        return jnp.maximum(xf + z3, 0.0).astype(cd)

    def _bneck_nv(self, block, p, s, x_nv, key, act_scales, s_in, s_out,
                  *, shape):
        """One post-act bottleneck block (identity OR transition) on the
        NV-layout kernels (ops/pallas/bneck_nv.py). x_nv: the int8
        [h, wp, N, C] carrier. ``s_out``: the next block's conv1 scale
        (int8 carrier out) or None (bf16 NV out; from_nv recovers NHWC)."""
        sub = {n: layer for n, layer, _ in block._sublayers()}
        i1, t1 = _bn_eval_affine(sub["norm1"], p["norm1"], s["norm1"])
        i2, t2 = _bn_eval_affine(sub["norm2"], p["norm2"], s["norm2"])
        i3, t3 = _bn_eval_affine(sub["norm3"], p["norm3"], s["norm3"])
        s2 = act_scales[f"{key}/conv2"]
        s3 = act_scales[f"{key}/conv3"]
        _, h, w, _ = shape
        cin = block.in_channels
        wdt = block.bottleneck_channels
        cout = block.out_channels

        def qw(cname, packer):
            ckey = f"{key}/{cname}:flat"
            if ckey not in self._wq:
                with jax.ensure_compile_time_eval():
                    w_q, scale = quantize_conv_weights(p[cname]["w"])
                    self._wq[ckey] = (packer(w_q), scale)
            return self._wq[ckey]

        w1q, w1s = qw("conv1", lambda wq: wq.reshape(cin, wdt))
        w2q, w2s = qw("conv2", pack_w2)
        w3q, w3s = qw("conv3", lambda wq: wq.reshape(wdt, cout))
        if block.transforms_shortcut:
            wpq, wps = qw("proj", lambda wq: wq.reshape(cin, cout))
            folded = fold_transition_scales(
                s_in, s2, s3, 1.0 if s_out is None else s_out,
                w1s, i1, t1, w2s, i2, t2, w3s, i3, t3, wps)
            return bneck_transition_nv(
                x_nv, w1q, w2q, w3q, wpq, *folded, w=w,
                stride=block.stride, out_int8=s_out is not None,
                conv2_impl=self.nv_conv2_impl or "grouped3",
                batch_tile=(x_nv.shape[2] if self.nv_grid == "legacy"
                            else None),
                interpret=self.interpret)
        folded = fold_block_scales(
            s_in, s2, s3, 1.0 if s_out is None else s_out,
            w1s, i1, t1, w2s, i2, t2, w3s, i3, t3)
        return bneck_block_nv(
            x_nv, w1q, w2q, w3q, *folded, w=w,
            out_int8=s_out is not None,
            # identity default grouped3 since round-5 session 5: e2e
            # same-process A/B 8.02 vs 8.18 ms/batch on R50 b128 @224
            # (BASELINE.md "NV grid batch-tiling"); bit-equal impls
            conv2_impl=self.nv_conv2_impl or "grouped3",
            batch_tile=(x_nv.shape[2] if self.nv_grid == "legacy"
                        else None),
            interpret=self.interpret)

    def _bneck_trans_float(self, block, p, s, x, key, stats):
        """Float transition bottleneck with calibration observers at the
        three conv inputs (mirrors BottleneckResidualBlock.apply
        post-act eval semantics, models/blocks.py:889-908)."""
        sub = {n: layer for n, layer, _ in block._sublayers()}
        i1, t1 = _bn_eval_affine(sub["norm1"], p["norm1"], s["norm1"])
        i2, t2 = _bn_eval_affine(sub["norm2"], p["norm2"], s["norm2"])
        i3, t3 = _bn_eval_affine(sub["norm3"], p["norm3"], s["norm3"])
        cd = block.compute_dtype
        st = block.stride
        xf = x.astype(jnp.float32)

        def obs(name, a):
            if stats is not None:
                stats[f"{key}/{name}"] = jnp.max(jnp.abs(a))

        def conv(a_f32, cname, stride):
            # explicit symmetric padding: "SAME" pads (0,1) at stride 2,
            # the reference's padding=1 is (1,1) (models/layers.py Conv)
            pad = 1 if cname == "conv2" else 0
            z = jax.lax.conv_general_dilated(
                a_f32.astype(cd), p[cname]["w"].astype(cd),
                (stride, stride), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return z.astype(jnp.float32)

        obs("conv1", xf)
        a1 = jnp.maximum(conv(xf, "conv1", 1) * i1 + t1, 0.0)
        obs("conv2", a1)
        a2 = jnp.maximum(conv(a1, "conv2", st) * i2 + t2, 0.0)
        obs("conv3", a2)
        z3 = conv(a2, "conv3", 1) * i3 + t3
        sc = conv(_subsample(xf, st), "proj", 1)
        return jnp.maximum(sc + z3, 0.0).astype(cd)

    def _transition_lane(self, block, p, s, x, key, act_scales, stats,
                         nxt=None):
        """Shortcut-transforming basic block with conv2 on the int8 lane
        kernel. conv1 (strided / channel-changing) and the shortcut
        (subsample + 1x1 projection or zero-pad) run bf16 NHWC on XLA;
        conv2 — 3x3/s1 at the output geometry, the block's FLOP bulk —
        runs int8 with the transformed shortcut riding its requant
        epilogue (and the next block's entry quantization in dual mode).

        Returns (carrier_cs [Cout, B*OH*OW], next_block_q_or_None)."""
        from pytorch_ddp_resnet_tpu.models.blocks import (
            _subsample, _zero_pad_channels)

        sub = {n: layer for n, layer, _ in block._sublayers()}
        cd = block.compute_dtype
        b, oh, ow, cout = _transition_out_shape(block, x.shape)
        n_out = b * oh * ow
        i1, t1 = _bn_eval_affine(sub["norm1"], p["norm1"], s["norm1"])
        i2, t2 = _bn_eval_affine(sub["norm2"], p["norm2"], s["norm2"])

        if block.preact:
            a1 = jnp.maximum(x.astype(jnp.float32) * i1 + t1, 0.0)
            z1, _ = sub["conv1"].apply(p["conv1"], {}, a1.astype(cd),
                                       train=False)
        else:
            z1, _ = sub["conv1"].apply(p["conv1"], {}, x.astype(cd),
                                       train=False)
        # shortcut transforms the RAW block input (blocks.py _forward)
        short = _subsample(x, block.stride)
        if block.use_proj:
            short, _ = sub["proj"].apply(p["proj"], {}, short.astype(cd),
                                         train=False)
        else:
            short = _zero_pad_channels(short, cout - block.in_channels)
        i_cs = jnp.transpose(short.astype(jnp.bfloat16),
                             (3, 0, 1, 2)).reshape(cout, n_out)
        z_cs = jnp.transpose(z1, (3, 0, 1, 2)).reshape(
            cout, n_out).astype(jnp.float32)
        # conv2's input: relu(norm2(z1)) for preact, relu(norm1(z1)) post-act
        inv, sh = (i2, t2) if block.preact else (i1, t1)
        a2 = jnp.maximum(z_cs * inv[:, None] + sh[:, None], 0.0)
        ckey = f"{key}/conv2"

        if act_scales is None:  # float / calibration mode
            if stats is not None:
                stats[ckey] = jnp.max(jnp.abs(a2))
            y = conv3x3_lanes(a2.astype(cd),
                              pack_weights(p["conv2"]["w"].astype(cd)),
                              h=oh, w_img=ow,
                              interpret=self.interpret).astype(jnp.float32)
            res = i_cs.astype(jnp.float32)
            if block.preact:
                out = res + y
            else:  # norm2 on conv2's output, add shortcut, post-relu
                out = jnp.maximum(res + y * i2[:, None] + t2[:, None], 0.0)
            return out.astype(cd), None

        s2 = act_scales[ckey]
        w2q, w2s = self._packed_qweights(ckey, p["conv2"]["w"])
        q2 = _quantize_act(a2, s2)
        dual = (self._next_entry_affine(nxt, act_scales)
                if nxt is not None else None)
        if block.preact:
            out = conv3x3_lanes_requant(
                q2, w2q, s2 * w2s, jnp.zeros_like(w2s), i_cs, dual,
                h=oh, w_img=ow, relu=False, inv_out_scale=None,
                interpret=self.interpret)
        else:
            out = conv3x3_lanes_requant(
                q2, w2q, s2 * w2s * i2, t2, i_cs, dual,
                h=oh, w_img=ow, relu=True, inv_out_scale=None,
                interpret=self.interpret)
        return out if dual is not None else (out, None)

    def _next_entry_affine(self, nxt, act_scales):
        """Fold the next block's norm1 eval affine and conv1 input scale
        into the dual epilogue's (sb, tb): next_q = s8(clip(round(
        max(carrier*sb + tb, 0)))). Post-act blocks feed conv1 the raw
        (already-relu'd) carrier, so their affine is identity/scale."""
        nkey, nblk, np_, ns_ = nxt
        s1n = act_scales[f"{nkey}/conv1"]
        if nblk.preact:
            sub = {n: layer for n, layer, _ in nblk._sublayers()}
            i1n, t1n = _bn_eval_affine(sub["norm1"], np_["norm1"],
                                       ns_["norm1"])
            return i1n / s1n, t1n / s1n
        ones = jnp.ones((nblk.out_channels,), jnp.float32)
        return ones / s1n, ones * 0.0

    def _block_lane_int8(self, block, p, x_cs, h, w, key, act_scales,
                         i1, t1, i2, t2, q_in=None, nxt=None):
        """Int8 basic block, lane layout, fused requant epilogues.

        The s32 accumulator never leaves VMEM: each conv's dequant scale,
        BN affine, relu, the NEXT conv's quantization (conv1), and the
        next BLOCK's entry quantization (conv2, dual mode) all run inside
        the kernel epilogues (conv3x3_lanes_requant). Mid-run there is NO
        XLA elementwise work at all: q_in arrives from the previous
        block's dual epilogue; only the first block of a run pays one
        entry-quantize chain (2 B read, 1 B write per element) — vs the
        unfused version's 4 B s32 round trip per conv, which was measured
        to cancel the whole int8 MXU win (trace_serving.py).

        Returns (carrier_bf16, next_block_q_or_None)."""
        s1 = act_scales[f"{key}/conv1"]
        s2 = act_scales[f"{key}/conv2"]
        w1q, w1s = self._packed_qweights(f"{key}/conv1", p["conv1"]["w"])
        w2q, w2s = self._packed_qweights(f"{key}/conv2", p["conv2"]["w"])
        x = x_cs.astype(jnp.bfloat16)  # residual carrier
        dual = (self._next_entry_affine(nxt, act_scales)
                if nxt is not None else None)
        zeros = jnp.zeros_like(w2s)
        if block.preact:
            if q_in is None:
                # run entry: a1 = relu(norm1(x)), quantized for conv1
                a1 = jnp.maximum(
                    x.astype(jnp.float32) * i1[:, None] + t1[:, None], 0.0)
                q_in = _quantize_act(a1, s1)
            # conv1 epilogue = dequant * norm2-inv + norm2-shift, relu,
            # quantize with conv2's input scale -> q2 directly
            q2 = conv3x3_lanes_requant(
                q_in, w1q, s1 * w1s * i2, t2, None, h=h, w_img=w,
                relu=True, inv_out_scale=1.0 / s2,
                interpret=self.interpret)
            # conv2 epilogue = dequant + residual -> new bf16 carrier
            # (+ the next block's quantized input in dual mode)
            out = conv3x3_lanes_requant(
                q2, w2q, s2 * w2s, zeros, x, dual, h=h, w_img=w,
                relu=False, inv_out_scale=None, interpret=self.interpret)
            return out if dual is not None else (out, None)
        # post-act v1: conv1 -> norm1 -> relu -> conv2 -> norm2, add, relu.
        # x is post-relu (>= 0); conv1's input is x itself.
        if q_in is None:
            q_in = _quantize_act(x.astype(jnp.float32), s1)
        q2 = conv3x3_lanes_requant(
            q_in, w1q, s1 * w1s * i1, t1, None, h=h, w_img=w,
            relu=True, inv_out_scale=1.0 / s2, interpret=self.interpret)
        out = conv3x3_lanes_requant(
            q2, w2q, s2 * w2s * i2, t2, x, dual, h=h, w_img=w,
            relu=True, inv_out_scale=None, interpret=self.interpret)
        return out if dual is not None else (out, None)

    # --- public entry points ---------------------------------------------

    def calibrate_fn(self):
        """Jittable float forward with observers:
        ``f(x_nhwc) -> (logits, {conv_key: absmax})``."""

        def f(x, params=None, state=None):
            stats: Dict[str, Any] = {}
            logits = self._forward(x, None, stats, params=params,
                                   state=state)
            return logits, stats

        return f

    def serve_fn(self, act_scales: Dict[str, Any]):
        """Jittable int8 forward ``f(x_nhwc) -> logits``. ``act_scales``
        maps conv keys to per-tensor input scales (absmax/127). Scales are
        kept as Python floats: conv1's output scale is a *static* kernel
        constant (the fused epilogue quantizes for the next conv).

        Weights ride the returned closure, so jitting it bakes them into
        the program text as constants — fine for CIFAR-scale models, but
        ImageNet-scale programs exceed the tunnel's compile-request limit
        (measured: HTTP 413 at ResNet-50 @224). Use serve_args_fn there.
        """
        scales = {k: float(v) for k, v in act_scales.items()}
        return lambda x: self._forward(x, scales)

    def serve_args_fn(self, act_scales: Dict[str, Any]):
        """Like serve_fn, but self-jitting with params/state/quantized
        weights passed as ARGUMENTS (device buffers), not closure
        constants: the compiled program text stays small. Returns
        ``f(x_nhwc) -> logits``; do NOT wrap it in jax.jit (it already
        is; re-jitting would re-capture the weights as constants)."""
        scales = {k: float(v) for k, v in act_scales.items()}

        jitted = jax.jit(lambda params, state, wq, x: self._forward_wq(
            x, scales, params, state, wq))

        def f(x):
            if not self._wq_ready:
                # one abstract trace with the instance pytrees (concrete)
                # populates the eager per-conv quantized-weight cache;
                # nothing is compiled or executed
                jax.eval_shape(
                    lambda xx: self._forward(xx, scales),
                    jax.ShapeDtypeStruct(x.shape, jnp.float32))
                self._wq_ready = True
            return jitted(self.params, self.state, dict(self._wq), x)

        return f

    def _forward_wq(self, x, scales, params, state, wq):
        """_forward against an explicit (traced) quantized-weight cache."""
        saved = self._wq
        self._wq = wq
        try:
            return self._forward(x, scales, params=params, state=state)
        finally:
            self._wq = saved


def calibrate(inference: Int8Inference, batches) -> Dict[str, float]:
    """Run calibration batches through the float path; return per-conv
    activation scales (absmax/127). ``batches``: iterable of preprocessed
    NHWC arrays (all the same shape — one compile)."""
    f = jax.jit(inference.calibrate_fn())
    maxes: Dict[str, float] = {}
    n = 0
    for xb in batches:
        # params/state as jit ARGUMENTS: big models' weights must not be
        # baked into the program text (tunnel compile-request limit)
        _, stats = f(xb, inference.params, inference.state)
        for k, v in stats.items():
            v = float(v)
            maxes[k] = max(maxes.get(k, 0.0), v)
        n += 1
    if n == 0:
        raise ValueError("calibrate() needs at least one batch.")
    return {k: max(v, 1e-12) / 127.0 for k, v in maxes.items()}


def quantized_forward(model, params, state, calib_batches):
    """One-call convenience: calibrate then return the jittable int8
    forward ``f(x_nhwc_preprocessed) -> logits`` plus the scales used."""
    inf = Int8Inference(model, params, state)
    scales = calibrate(inf, calib_batches)
    return inf.serve_fn(scales), scales
