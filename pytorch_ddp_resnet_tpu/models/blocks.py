"""Residual blocks: basic (3x3+3x3) and bottleneck (1x1/3x3/1x1).

Capability parity with reference resnet/architectures/residual_block.py:

- ``preact=True`` gives ResNet-v2 ordering (norm -> act -> dropout -> conv,
  identity add, no post-activation); ``preact=False`` gives v1 ordering
  (dropout -> conv -> norm -> act, post-activation after the add).
- ``downsample=True`` halves the spatial extent (stride-2 on the 3x3 conv)
  and doubles the channel count.
- Shortcut on downsample: ``use_proj=True`` -> 1x1 projection conv after a
  stride-2 subsample; ``use_proj=False`` -> He et al. option A: stride-2
  subsample (AvgPool k=1 s=2 == x[:, ::2, ::2, :]) + zero-padding the channel
  dim by ``in_channels`` (residual_block.py:89-94, 205-210).
- Bottleneck width: ``channels//4``, or ``channels//2`` when downsampling
  (residual_block.py:121-123) so the WRN bottleneck widening falls out.
- Per-conv dropout (WRN-style) with probability ``dropout_prob``.

Extension beyond the reference (documented divergence): optional explicit
``out_channels_override`` / ``width_override`` / ``stride_override`` fields
generalize the fixed "downsample doubles channels, width = channels//4|2"
rules so ImageNet-family stage plans (ResNet-50/101/152, WRN-50-2: first
stage quadruples channels at stride 1; inner width decoupled from channel
count) are expressible. The reference *claims* WRN-50-2 in its README
(README.md:76-77) but its parser cannot build it; the extended spec tokens
in resnet.py close that gap. Legacy constructions (overrides None) are
bit-identical to before.

Block convs keep torch's *default* initializer — the reference's
kaiming_normal pass touches only top-level convs (resnet.py:160-163).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from pytorch_ddp_resnet_tpu.models.layers import (
    BatchNorm,
    Conv,
    Dropout,
    Layer,
    Shape,
)


def _subsample(x, stride: int):
    """AvgPool2d(kernel=1, stride=s): every s-th pixel, no averaging
    (identity when stride == 1).

    Written as reshape+slice rather than a strided slice: the strided
    slice's reverse-mode transpose is a scatter-add (measured ~2.5ms/step on
    WRN-28-10 b256 across the two stage transitions), while the sliced
    reshape transposes to a cheap zero-pad."""
    if stride == 1:
        return x
    n, h, w, c = x.shape
    if h % stride or w % stride:  # odd extents: keep ceil semantics
        return x[:, ::stride, ::stride, :]
    x = x.reshape(n, h // stride, stride, w // stride, stride, c)
    return x[:, :, 0, :, 0, :]


def _zero_pad_channels(x, extra: int):
    """Option-A shortcut channel padding: zeros appended on the channel dim
    (reference pads (0,..,0,in_channels) on NCHW dim 1; NHWC pads dim 3)."""
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, extra)))


def _fold_bn_batch_and_ema(bn, p, st, mean, var, n):
    """Shared by both fused paths: fold batch stats into (scale, shift)
    and produce the EMA-updated BatchNorm state, mirroring
    BatchNorm.apply exactly (biased normalize, unbiased running var,
    count increment). Any change to BatchNorm's train-mode semantics in
    layers.py must land here too — tests/test_fused_block.py and
    tests/test_int8_train.py assert the parity."""
    from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import fold_bn

    scale, shift = fold_bn(p["scale"], p["bias"], mean, var, bn.eps)
    m = bn.momentum
    new_st = {
        "mean": (1 - m) * st["mean"] + m * mean,
        "var": (1 - m) * st["var"] + m * var * (n / max(n - 1, 1)),
        "count": st["count"] + 1,
    }
    return scale, shift, new_st


class NVLane(NamedTuple):
    """Open NV-trunk run state (Sequential's lane protocol payload for
    int8 bottleneck TRAINING, ops/pallas/bneck_nv_train.py).

    ``x``: the current block input — the materialized residual carrier,
    [h, wp, N, C] bf16 with masked borders. ``acc3``/``s3``/``t3``: the
    PREVIOUS block's raw conv3 accumulator and folded BN3 affine, whose
    epilogue (affine + residual add + relu) has not been applied yet —
    the next block's entry-mode conv1 prologue consumes it in VMEM, or
    ``materialize`` applies it in XLA when the run closes. None at a run
    start. NamedTuple so jax.checkpoint/pytree plumbing is free.
    """

    x: Any
    acc3: Any = None
    s3: Any = None
    t3: Any = None

    def materialize(self, w_img: int):
        """Close the run: apply the pending epilogue, return NHWC."""
        from pytorch_ddp_resnet_tpu.ops.pallas.nv_common import from_nv

        if self.acc3 is None:
            return from_nv(self.x, w_img)
        y = self.acc3.astype(jnp.float32) * self.s3 + self.t3
        out = jnp.maximum(y + self.x.astype(jnp.float32), 0.0)
        return from_nv(out.astype(self.x.dtype), w_img)


class _BlockBase(Layer):
    """Shared apply scaffolding for both block types.

    Subclasses define ``_sublayers() -> [(name, layer, role)]`` (role is
    informational), explicit per-sublayer input shapes in ``init``, and the
    wiring in ``_forward(run, x, train)`` where ``run(name, x)`` applies the
    named sublayer with its own folded rng and threads its state.
    """

    def _sublayers(self):
        raise NotImplementedError

    def _forward(self, run, x, train):
        raise NotImplementedError

    def _data_shards(self) -> int:
        mesh = getattr(self, "shard_mesh", None)
        return 1 if mesh is None else int(mesh.shape.get("data", 1))

    def apply(self, params, state, x, *, train, rng=None):
        if getattr(self, "remat", False):
            # Rematerialize the whole block in the backward pass: ~1/3 more
            # FLOPs for a large cut in saved-activation HBM traffic. Wins at
            # large batch (measured v5e, WRN-28-10: b1024 458ms -> 350ms);
            # loses at small batch (b256 72ms -> 85ms) — hence opt-in.
            def f(p, s, xx):
                return self._apply_impl(p, s, xx, train=train, rng=rng)

            return jax.checkpoint(f)(params, state, x)
        return self._apply_impl(params, state, x, train=train, rng=rng)

    def _apply_impl(self, params, state, x, *, train, rng=None):
        sub = {name: (layer, i) for i, (name, layer, _) in enumerate(self._sublayers())}
        new_state = dict(state)

        def run(name, x):
            layer, i = sub[name]
            sub_rng = jax.random.fold_in(rng, i) if rng is not None else None
            y, s = layer.apply(
                params.get(name, {}), state.get(name, {}), x,
                train=train, rng=sub_rng)
            if s:
                new_state[name] = s
            return y

        y = self._forward(run, x, train)
        return y, new_state


@dataclass(frozen=True)
class ResidualBlock(_BlockBase):
    """Basic two-conv residual block (residual_block.py:8-99)."""

    channels: int
    downsample: bool
    preact: bool
    use_proj: bool
    dropout_prob: float
    compute_dtype: Any = jnp.bfloat16
    remat: bool = False
    out_channels_override: Optional[int] = None
    stride_override: Optional[int] = None
    pallas_conv: bool = False
    # Opt-in fused block-half kernels (ops/pallas/fused_block.py): the whole
    # preact chain norm->relu->dropout->conv (+residual, +next-BN stats)
    # runs as one Pallas call per conv. Config flag `use_fused_block`;
    # applies to train-mode preact non-transforming blocks above the
    # h*w >= 2*c crossover, other geometries fall back to the layer path.
    # Measured verdict (BASELINE.md "Fused block-half kernels"): wins its
    # stage-1 microbench 1.10x but loses ~2.6% END-TO-END on WRN-28-10 —
    # XLA already fuses the targeted epilogue traffic into its in-model
    # conv kernels — so this stays default-OFF infrastructure.
    fused_block: bool = False
    # Opt-in int8 quantization-aware training (config flag `use_int8_train`):
    # the fused lane path with an s8 x s8 -> s32 conv core on the MXU's
    # measured 2x int8 mode — per-channel weight scales quantized per step,
    # per-TILE dynamic activation scales computed inside the kernel (exact,
    # stateless), straight-through gradients (backward kernels at the
    # unquantized point). Applies to the same train-mode preact
    # identity-shortcut geometry as fused_block but WITHOUT the h*w >= 2*c
    # crossover (the int8 core win is per-conv, not epilogue-bytes-bound).
    int8_train: bool = False
    # Opt-in fully-quantized training (config flag `use_int8_train_bwd`,
    # implies int8_train): the dgrad and wgrad convs ALSO run on the int8
    # MXU mode with per-tile dynamic gradient scales — the gradient
    # becomes an int8-grain estimate (Banner et al. 2018-style FQT), so
    # this carries its own accuracy gate, separate from the
    # straight-through fwd-only mode above.
    int8_train_bwd: bool = False
    # Opt-in in-kernel dropout bits for the fused lane paths (config flag
    # `use_inkernel_dropout`): instead of materializing [C, N] uint8
    # jax.random.bits in HBM (written once, re-read by up to three
    # backward kernels), each kernel reconstructs the mask on the VPU
    # from a murmur-hash of the element's global index and a per-layer-
    # per-step seed (ops/pallas/fused_block.py _seed_bits). Same keep
    # probability and per-layer/step/shard keying; a DIFFERENT (still
    # uniform) bit stream than jax.random.bits — the same sanctioned
    # divergence class as the lane layout's bit-stream note below.
    inkernel_dropout: bool = False
    # Opt-in strided-lane stage transitions (config flag
    # `use_lane_transition`, ops/pallas/transition.py): the int8 trunk's
    # transitions run LANE-in -> LANE-out through a parity-packed
    # stride-2 kernel instead of the lane-entry path (XLA conv1 +
    # boundary transposes). MEASURED NEGATIVE end-to-end on v5e b512
    # (5,261 and 5,030 vs 5,439 img/s for two parity-relayout
    # formulations): the kernels save ~2.6 ms of conv time but the
    # stride-2<->stride-1 lane remapping is inexpressible as Mosaic
    # rolls (no lane gather) and XLA lowers it to 10.8-13.6 ms of copy
    # chains vs the ~6 ms of plain transposes it replaces — BASELINE.md
    # "Strided-lane transitions". Default OFF.
    lane_transition: bool = False
    # Mesh for pod runs of the fused/int8 lane paths. The XLA SPMD
    # partitioner treats Mosaic custom calls as opaque and would gather
    # batch-sharded operands around them; with a mesh here each fused
    # half instead runs under jax.shard_map — local kernels on each
    # device's batch shard, sync-BN statistic sums jax.lax.psum'd over
    # the 'data' axis (equivalence on the 8-device CPU mesh:
    # tests/test_parallel.py). None (default) = single-chip dispatch.
    shard_mesh: Any = None

    @property
    def in_channels(self) -> int:
        return self.channels

    @property
    def out_channels(self) -> int:
        if self.out_channels_override is not None:
            return self.out_channels_override
        return self.channels * 2 if self.downsample else self.channels

    @property
    def stride(self) -> int:
        if self.stride_override is not None:
            return self.stride_override
        return 2 if self.downsample else 1

    @property
    def transforms_shortcut(self) -> bool:
        return self.stride != 1 or self.out_channels != self.in_channels

    def _sublayers(self):
        cin, cout, cd = self.in_channels, self.out_channels, self.compute_dtype
        layers = [
            ("conv1", Conv(cin, cout, 3, stride=self.stride,
                           padding=1, use_bias=False, compute_dtype=cd,
                           pallas=self.pallas_conv), "main"),
            ("conv2", Conv(cout, cout, 3, stride=1, padding=1,
                           use_bias=False, compute_dtype=cd,
                           pallas=self.pallas_conv), "main"),
            ("norm1", BatchNorm(cin if self.preact else cout, compute_dtype=cd),
             "main" if self.preact else "post1"),
            ("norm2", BatchNorm(cout, compute_dtype=cd), "post2"),
            ("drop1", Dropout(self.dropout_prob), "main"),
            ("drop2", Dropout(self.dropout_prob), "main"),
        ]
        if self.transforms_shortcut and self.use_proj:
            layers.append(
                ("proj", Conv(cin, cout, 1, stride=1, padding=0,
                              use_bias=False, compute_dtype=cd), "shortcut"))
        return layers

    def init(self, rng, in_shape: Shape):
        if (self.transforms_shortcut and not self.use_proj
                and self.out_channels < self.in_channels):
            raise ValueError(
                f"Residual block maps {self.in_channels} -> "
                f"{self.out_channels} channels with use_proj=False: the "
                f"option-A zero-pad shortcut cannot SHRINK channels. Use "
                f"use_proj=True for channel-reducing stack tokens.")
        # Explicit wiring: sublayer roles don't form a simple chain here.
        params, state = {}, {}
        h, w, cin = in_shape
        cout, s = self.out_channels, self.stride
        oh, ow = (h - 1) // s + 1, (w - 1) // s + 1
        shapes = {
            "conv1": in_shape, "conv2": (oh, ow, cout),
            "norm1": in_shape if self.preact else (oh, ow, cout),
            "norm2": (oh, ow, cout),
            "drop1": in_shape, "drop2": in_shape,
            "proj": (oh, ow, cin),
        }
        for i, (name, layer, _) in enumerate(self._sublayers()):
            p, st, _ = layer.init(jax.random.fold_in(rng, i), shapes[name])
            if p:
                params[name] = p
            if st:
                state[name] = st
        return params, state, (oh, ow, cout)

    def _forward(self, run, x, train):
        i = x
        if self.preact:
            x = run("conv1", run("drop1", jnp.maximum(run("norm1", x), 0)))
            x = run("conv2", run("drop2", jnp.maximum(run("norm2", x), 0)))
        else:
            x = jnp.maximum(run("norm1", run("conv1", run("drop1", x))), 0)
            x = run("norm2", run("conv2", run("drop2", x)))
        if self.transforms_shortcut:
            i = _subsample(i, self.stride)
            if self.use_proj:
                i = run("proj", i)
            else:
                i = _zero_pad_channels(i, self.out_channels - self.in_channels)
        h = i.astype(x.dtype) + x
        if not self.preact:
            h = jnp.maximum(h, 0)
        return h

    def _fused_eligible(self, x_shape, train: bool) -> bool:
        """Static gate for the fused block-half path: train-mode preact
        identity-shortcut geometry whose shapes satisfy the kernel's lane
        tiling (whole images per 128-multiple tile; uint8 dropout bits need
        channels % 32 on the sublane dim, bf16 alone needs % 16)."""
        if not ((self.fused_block or self.int8_train) and self.preact
                and train and not self.transforms_shortcut):
            return False
        from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
            dropout_thresh)

        thresh = dropout_thresh(self.dropout_prob)
        if thresh <= 0:  # rate ~1 zeroes activations; fused path skips it
            return False
        b, h, w, c = x_shape
        if c % (32 if (thresh < 256 or self.int8_train) else 16) != 0:
            return False  # 32 = uint8-bits / int8 sublane tile
        # Measured crossover (BASELINE.md "Fused block-half kernels",
        # v5e b256): the fused halves win where elementwise epilogue HBM
        # traffic dominates the conv — 32x32x160 trains 1.10x faster
        # (fwd 1.30x) — but tie at 16x16x320 (0.98x) and lose at 8x8x640
        # (0.77x: the VMEM-resident wgrad accumulator forces halved
        # tiles). Fuse only above the spatial-to-channel crossover.
        # The int8 path skips the crossover: its conv-core win is
        # per-conv (2x MXU mode), not epilogue-bytes-bound.
        if not self.int8_train and h * w < 2 * c:
            return False
        from pytorch_ddp_resnet_tpu.ops.pallas.conv import _pick_tile

        # Pod runs (shard_mesh set): each device's kernel sees only its
        # batch shard, so the tiling constraint applies to the LOCAL n.
        d = self._data_shards()
        if b % d != 0:
            return False
        try:
            _pick_tile(h * w, (b // d) * h * w, c)
        except ValueError:
            return False
        return True

    def _apply_impl(self, params, state, x, *, train, rng=None):
        if self._fused_eligible(x.shape, train):
            return self._forward_fused(params, state, x, rng=rng)
        if self.lane_entry_eligible(x.shape, train):
            y_cs, (b, oh, ow, c), ns = self._transition_lane(
                params, state, x, train=train, rng=rng)
            return jnp.transpose(
                y_cs.reshape(c, b, oh, ow), (1, 2, 3, 0)), ns
        return super()._apply_impl(params, state, x, train=train, rng=rng)

    def lane_eligible(self, x_shape, train: bool) -> bool:
        """Sequential's transpose-hoisting protocol (layers.py): True when
        this block would take the fused lane-layout path for ``x_shape``."""
        return self._fused_eligible(x_shape, train)

    def apply_lane(self, params, state, x_cs, x_shape, *, train, rng=None):
        """Apply the fused path to an activation ALREADY in lane layout
        ([C, B*H*W]); used by Sequential to run consecutive fused blocks
        without per-block NHWC<->lane transposes (each is a full activation
        HBM round trip — measured to cancel the fused win end-to-end)."""
        if self.remat:
            def f(p, s, xx):
                return self._forward_lane(p, s, xx, x_shape, rng=rng)

            return jax.checkpoint(f)(params, state, x_cs)
        return self._forward_lane(params, state, x_cs, x_shape, rng=rng)

    def lane_through_eligible(self, x_shape, train: bool) -> bool:
        """True when this STAGE-TRANSITION block should run LANE-in ->
        LANE-out (ops/pallas/transition.py): the previous stage's lane
        run feeds the strided conv1 directly through the parity-packed
        stride-2 kernel (prologue + int8 conv + proj/option-A shortcut +
        norm2 stats fused), and conv2 rides fused_half_int8 as in the
        lane-entry path — the stage-boundary NHWC<->lane transposes
        (the largest non-conv line in the b512 step attribution,
        BASELINE.md) disappear entirely."""
        if not (self.lane_transition and self.int8_train and self.preact
                and train and self.transforms_shortcut
                and self.stride == 2):
            return False
        from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
            dropout_thresh)

        if dropout_thresh(self.dropout_prob) <= 0:
            return False
        if len(x_shape) != 4:
            return False
        b, h, w, cin = x_shape
        if h % 2 or w % 2 or cin != self.in_channels:
            return False
        cout = self.out_channels
        if cout % 32 != 0 or (4 * cin) % 32 != 0:
            return False
        if not self.use_proj and cout < cin:
            return False
        d = self._data_shards()
        if b % d != 0:
            return False
        oh, ow = h // 2, w // 2
        n_local = (b // d) * oh * ow
        from pytorch_ddp_resnet_tpu.ops.pallas.conv import _pick_tile
        from pytorch_ddp_resnet_tpu.ops.pallas.transition import (
            transition_tile)

        try:
            transition_tile(oh, ow, n_local, cin, cout)
            _pick_tile(oh * ow, n_local, cout)  # conv2's tiling
        except ValueError:
            return False
        return True

    def apply_lane_through(self, params, state, x_cs, x_shape, *, train,
                           rng=None):
        """Transition block consuming AND emitting lane layout; see
        lane_through_eligible. Returns (y_cs, out_shape, new_state)."""
        if self.remat:
            def f(p, s, xx):
                return self._lane_through_impl(p, s, xx, x_shape, rng=rng)

            return jax.checkpoint(f)(params, state, x_cs)
        return self._lane_through_impl(params, state, x_cs, x_shape,
                                       rng=rng)

    def _lane_through_impl(self, params, state, x_cs, x_shape, *, rng):
        from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
            dropout_thresh,
            fused_half_int8,
        )

        interpret = jax.default_backend() != "tpu"
        b, h, w, cin = x_shape
        oh, ow = h // 2, w // 2
        cout = self.out_channels
        n_in, n_out = b * h * w, b * oh * ow
        sub = {name: (layer, i)
               for i, (name, layer, _) in enumerate(self._sublayers())}
        new_state = dict(state)

        # norm1 batch stats from the lane input (biased var, EMA exactly
        # as BatchNorm.apply — same discipline as _forward_lane)
        xf = x_cs.astype(jnp.float32)
        mean1 = jnp.sum(xf, axis=1) / n_in
        var1 = jnp.sum(jnp.square(xf), axis=1) / n_in - jnp.square(mean1)
        s1, t1, new_state["norm1"] = _fold_bn_batch_and_ema(
            sub["norm1"][0], params["norm1"], state["norm1"], mean1, var1,
            n_in)

        thresh = dropout_thresh(self.dropout_prob)
        key1 = (jax.random.fold_in(rng, sub["drop1"][1])
                if thresh < 256 else None)
        wp = (params["proj"]["w"].reshape(cin, cout)
              if self.use_proj else None)
        z_cs, zsum, zssq, res_cs = self._run_transition(
            x_cs, params["conv1"]["w"], wp, s1, t1, key1, h, w, cin, cout,
            interpret)

        # norm2 from the kernel's epilogue statistics
        mean2 = zsum / n_out
        var2 = zssq / n_out - jnp.square(mean2)
        s2, t2, new_state["norm2"] = _fold_bn_batch_and_ema(
            sub["norm2"][0], params["norm2"], state["norm2"], mean2, var2,
            n_out)

        key2 = (jax.random.fold_in(rng, sub["drop2"][1])
                if thresh < 256 else None)
        half = functools.partial(fused_half_int8,
                                 quant_bwd=self.int8_train_bwd)
        y_cs, _, _ = self._run_half(
            half, z_cs, params["conv2"]["w"], s2, t2, key2, res_cs,
            False, oh, ow, cout, interpret)
        return y_cs, (b, oh, ow, cout), new_state

    def _run_transition(self, x_cs, w1, wp, s1, t1, key, h, w, cin, cout,
                        interpret):
        """Dispatch the strided transition kernel: directly on a single
        chip, or under shard_map on a pod mesh (same pattern as
        _run_half: batch-sharded lanes, replicated weights, psum'd
        norm2 statistic sums, per-shard dropout bits)."""
        from pytorch_ddp_resnet_tpu.ops.pallas.transition import (
            transition_half_int8)

        quant_bwd = self.int8_train_bwd

        def bits_for(key_l, n_local):
            return jax.random.bits(key_l, (4 * cin, n_local // 4),
                                   dtype=jnp.uint8)

        d = self._data_shards()
        if d == 1:
            bits = bits_for(key, x_cs.shape[1]) if key is not None else None
            return transition_half_int8(
                x_cs, w1, wp, s1, t1, bits,
                dropout_rate=self.dropout_prob, h=h, w_img=w,
                quant_bwd=quant_bwd, interpret=interpret)
        from jax.sharding import PartitionSpec as P

        def local(x_l, w_l, *rest):
            rest = list(rest)
            wp_l = rest.pop(0) if wp is not None else None
            s_l, t_l = rest.pop(0), rest.pop(0)
            key_l = rest.pop(0) if key is not None else None
            bits_l = None
            if key_l is not None:
                bits_l = bits_for(
                    jax.random.fold_in(key_l, jax.lax.axis_index("data")),
                    x_l.shape[1])
            z, zsum, zssq, res = transition_half_int8(
                x_l, w_l, wp_l, s_l, t_l, bits_l,
                dropout_rate=self.dropout_prob, h=h, w_img=w,
                quant_bwd=quant_bwd, interpret=interpret)
            return (z, jax.lax.psum(zsum, "data"),
                    jax.lax.psum(zssq, "data"), res)

        in_specs = [P(None, "data"), P()]
        args = [x_cs, w1]
        if wp is not None:
            in_specs.append(P())
            args.append(wp)
        in_specs += [P(), P()]
        args += [s1, t1]
        if key is not None:
            in_specs.append(P())
            args.append(key)
        return jax.shard_map(
            local, mesh=self.shard_mesh, in_specs=tuple(in_specs),
            out_specs=(P(None, "data"), P(), P(), P(None, "data")),
            check_vma=False)(*args)

    def lane_entry_eligible(self, x_shape, train: bool) -> bool:
        """True when this STAGE-TRANSITION block should run its conv2 on
        the int8 path (the training analog of the serving path's v4
        transition quantization, models/quantize.py): conv1 is strided
        and stays bf16, but conv2 — the block's FLOP bulk, stride-1 3x3
        at the OUTPUT geometry — is fused_half_int8 with the projection
        shortcut riding its epilogue, and the block EMITS lane layout,
        seeding the next stage's lane run (so the entry transpose
        replaces, not adds to, the run's)."""
        if not (self.int8_train and self.preact and train
                and self.transforms_shortcut):
            return False
        from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
            dropout_thresh)

        if dropout_thresh(self.dropout_prob) <= 0:
            return False
        if len(x_shape) != 4:
            return False
        b, h, w, _ = x_shape
        s, cout = self.stride, self.out_channels
        oh, ow = (h - 1) // s + 1, (w - 1) // s + 1
        if cout % 32 != 0:
            return False
        d = self._data_shards()
        if b % d != 0:
            return False
        from pytorch_ddp_resnet_tpu.ops.pallas.conv import _pick_tile

        try:
            _pick_tile(oh * ow, (b // d) * oh * ow, cout)
        except ValueError:
            return False
        return True

    def apply_to_lane(self, params, state, x, *, train, rng=None):
        """Transition block with an int8 conv2: NHWC in, LANE out.

        norm1/drop1/conv1/proj run the standard XLA layers (bitwise
        identical to _forward — conv1 is strided, ineligible for the
        lane kernels); norm2+relu+drop2+conv2+residual ride one
        fused_half_int8 call at the output geometry, with norm2's batch
        statistics computed from conv1's output and its EMA updated
        exactly like BatchNorm.apply. Returns (y_cs, out_shape,
        new_state)."""
        if self.remat:
            def f(p, s, xx):
                return self._transition_lane(p, s, xx, train=train, rng=rng)

            return jax.checkpoint(f)(params, state, x)
        return self._transition_lane(params, state, x, train=train, rng=rng)

    def _transition_lane(self, params, state, x, *, train, rng):
        from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
            dropout_thresh,
            fused_half_int8,
        )

        interpret = jax.default_backend() != "tpu"
        sub = {name: (layer, i)
               for i, (name, layer, _) in enumerate(self._sublayers())}
        new_state = dict(state)

        def run(name, v):
            layer, i = sub[name]
            sub_rng = jax.random.fold_in(rng, i) if rng is not None else None
            y, s = layer.apply(params.get(name, {}), state.get(name, {}), v,
                               train=train, rng=sub_rng)
            if s:
                new_state[name] = s
            return y

        i_in = x
        z = run("conv1", run("drop1", jnp.maximum(run("norm1", x), 0)))
        b, oh, ow, cout = z.shape
        n = b * oh * ow

        # norm2 batch stats from conv1's output
        zf = z.astype(jnp.float32)
        mean = jnp.mean(zf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(zf), axis=(0, 1, 2)) - jnp.square(mean)
        s2, t2, new_state["norm2"] = _fold_bn_batch_and_ema(
            sub["norm2"][0], params["norm2"], state["norm2"], mean, var, n)

        # shortcut from the RAW block input (same as _forward)
        i_in = _subsample(i_in, self.stride)
        if self.use_proj:
            i_in = run("proj", i_in)
        else:
            i_in = _zero_pad_channels(
                i_in, self.out_channels - self.in_channels)

        cd = self.compute_dtype
        z_cs = jnp.transpose(z.astype(cd), (3, 0, 1, 2)).reshape(cout, n)
        res_cs = jnp.transpose(i_in.astype(cd),
                               (3, 0, 1, 2)).reshape(cout, n)

        thresh = dropout_thresh(self.dropout_prob)
        key = (jax.random.fold_in(rng, sub["drop2"][1])
               if thresh < 256 else None)
        half = functools.partial(fused_half_int8,
                                 quant_bwd=self.int8_train_bwd)
        y_cs, _, _ = self._run_half(
            half, z_cs, params["conv2"]["w"], s2, t2, key, res_cs,
            False, oh, ow, cout, interpret)
        return y_cs, (b, oh, ow, cout), new_state

    def _forward_fused(self, params, state, x, *, rng):
        b, h, w, c = x.shape
        x_cs = jnp.transpose(x.astype(self.compute_dtype),
                             (3, 0, 1, 2)).reshape(c, b * h * w)
        y_cs, new_state = self._forward_lane(params, state, x_cs, x.shape,
                                             rng=rng)
        y = jnp.transpose(y_cs.reshape(c, b, h, w), (1, 2, 3, 0))
        return y, new_state

    def _forward_lane(self, params, state, x_cs, x_shape, *, rng):
        """The preact chain with both halves as fused Pallas calls.

        Matches _forward's preact branch op-for-op (same normalize/relu/
        quantized-dropout arithmetic, same bf16 rounding points, same
        BatchNorm EMA updates — asserted in tests/test_fused_block.py); the
        only sanctioned divergence is the dropout bit stream, drawn over the
        lane layout's (C, B*H*W) shape instead of NHWC, so masks differ
        sample-for-sample while the distribution and the per-layer
        fold_in(rng, i) discipline stay identical.

        Savings come from never materializing the normalized/dropped
        activations in HBM and from reading the next BatchNorm's statistics
        off the conv epilogue ([C] vectors) instead of re-reducing the
        activation; conv1's epilogue feeds norm2 directly, and the residual
        add rides conv2's epilogue.
        """
        from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
            dropout_thresh,
            fused_half,
            fused_half_int8,
        )

        interpret = jax.default_backend() != "tpu"
        b, h, w, c = x_shape
        n = b * h * w
        sub = self._sublayers()
        idx = {name: i for i, (name, layer, _) in enumerate(sub)}
        layers = {name: layer for name, layer, _ in sub}
        new_state = dict(state)

        def fold_and_ema(name, ssum, sssq):
            # batch mean/var from the per-channel sums
            mean = ssum / n
            var = sssq / n - jnp.square(mean)
            scale, shift, new_state[name] = _fold_bn_batch_and_ema(
                layers[name], params[name], state[name], mean, var, n)
            return scale, shift

        thresh = dropout_thresh(self.dropout_prob)

        x_cs = x_cs.astype(self.compute_dtype)  # no-op from the fused chain
        xf = x_cs.astype(jnp.float32)
        s1, t1 = fold_and_ema("norm1", jnp.sum(xf, axis=1),
                              jnp.sum(jnp.square(xf), axis=1))
        # int8_train swaps in the s8 x s8 -> s32 conv cores (per-tile
        # dynamic activation scales inside the kernel, per-channel weight
        # scales per step, straight-through gradients); the wiring is
        # otherwise identical to the bf16 fused path. int8_train_bwd
        # additionally quantizes the dgrad/wgrad convs (FQT).
        if self.int8_train:
            half = functools.partial(fused_half_int8,
                                     quant_bwd=self.int8_train_bwd)
        else:
            half = fused_half

        def run_half(x_in, w_conv, s, t, name, res, want_stats):
            key = (jax.random.fold_in(rng, idx[name])
                   if thresh < 256 else None)
            return self._run_half(half, x_in, w_conv, s, t, key, res,
                                  want_stats, h, w, c, interpret)

        z_cs, zsum, zssq = run_half(
            x_cs, params["conv1"]["w"], s1, t1, "drop1", None, True)
        s2, t2 = fold_and_ema("norm2", zsum, zssq)
        y_cs, _, _ = run_half(
            z_cs, params["conv2"]["w"], s2, t2, "drop2", x_cs, False)
        return y_cs, new_state

    def _dropout_bits(self, key, c, n):
        """Dropout bits for one fused half: a [c, n] uint8 stream, or —
        with `inkernel_dropout` (and the i32 index headroom it needs) — a
        scalar int32 seed that the kernels expand on the VPU
        (ops/pallas/fused_block.py _seed_bits), eliminating the HBM bits
        tensor entirely."""
        # c <= 320: the same DMA-bound/VPU-bound boundary as the fused
        # backward kernel (fused_block.py _make_op) — at 640 channels the
        # kernels hide their reads behind VPU work, so the hash's ~8 int32
        # vector ops/elem only add cost (measured end-to-end on v5e b512:
        # all-widths seed mode 5,208 img/s vs 5,396 materialized).
        if self.inkernel_dropout and c <= 320 and c * n < 2 ** 31:
            return jax.lax.bitcast_convert_type(
                jax.random.bits(key, (), dtype=jnp.uint32), jnp.int32)
        return jax.random.bits(key, (c, n), dtype=jnp.uint8)

    def _run_half(self, half, x_in, w_conv, s, t, key, res, want_stats,
                  h, w, c, interpret):
        """Dispatch one fused half: directly on a single chip, or — on a
        pod mesh — under shard_map: the SPMD partitioner can't see into
        the Mosaic custom call, so each device runs the kernel on its
        local batch shard (lane dim N is batch-major, so P(None, 'data')
        IS batch sharding), weights/affines replicated, and the epilogue
        statistic sums psum'd to keep exact sync-BN semantics. Dropout
        bits are drawn from `key` over the (local) lane shape —
        per-shard, decorrelated via axis_index — the same sanctioned
        bit-stream divergence as the lane layout itself. check_vma=False:
        Pallas calls don't carry a replication rule."""
        d = self._data_shards()
        if d == 1:
            bits = (self._dropout_bits(key, c, x_in.shape[1])
                    if key is not None else None)
            return half(
                x_in, w_conv, s, t, bits, res,
                dropout_rate=self.dropout_prob, h=h, w_img=w,
                want_stats=want_stats, interpret=interpret)
        from jax.sharding import PartitionSpec as P

        def local(x_l, w_l, s_l, t_l, *rest):
            rest = list(rest)
            key_l = rest.pop(0) if key is not None else None
            res_l = rest.pop(0) if res is not None else None
            bits_l = None
            if key_l is not None:
                bits_l = self._dropout_bits(
                    jax.random.fold_in(
                        key_l, jax.lax.axis_index("data")),
                    c, x_l.shape[1])
            y_l, zs, zq = half(
                x_l, w_l, s_l, t_l, bits_l, res_l,
                dropout_rate=self.dropout_prob, h=h, w_img=w,
                want_stats=want_stats, interpret=interpret)
            if not want_stats:
                return y_l
            return (y_l, jax.lax.psum(zs, "data"),
                    jax.lax.psum(zq, "data"))

        in_specs = [P(None, "data"), P(), P(), P()]
        args = [x_in, w_conv, s, t]
        if key is not None:
            in_specs.append(P())
            args.append(key)
        if res is not None:
            in_specs.append(P(None, "data"))
            args.append(res)
        out_specs = ((P(None, "data"), P(), P()) if want_stats
                     else P(None, "data"))
        out = jax.shard_map(
            local, mesh=self.shard_mesh, in_specs=tuple(in_specs),
            out_specs=out_specs, check_vma=False)(*args)
        return out if want_stats else (out, None, None)


@dataclass(frozen=True)
class BottleneckResidualBlock(_BlockBase):
    """Bottleneck residual block (residual_block.py:102-215)."""

    channels: int
    downsample: bool
    preact: bool
    use_proj: bool
    dropout_prob: float
    compute_dtype: Any = jnp.bfloat16
    remat: bool = False
    out_channels_override: Optional[int] = None
    width_override: Optional[int] = None
    stride_override: Optional[int] = None
    pallas_conv: bool = False
    # fused_block / inkernel_dropout / lane_transition are basic-trunk
    # features, accepted for spec-builder uniformity. int8_train /
    # int8_train_bwd ARE implemented for this block type since round 5:
    # post-act identity-shortcut blocks at stride 1 run the NV-carrier
    # int8 training path (ops/pallas/bneck_nv_train.py) through
    # Sequential's lane protocol; transition blocks and all preact /
    # dropout geometries take the layer-by-layer XLA path.
    fused_block: bool = False
    int8_train: bool = False
    int8_train_bwd: bool = False
    inkernel_dropout: bool = False
    lane_transition: bool = False
    shard_mesh: Any = None

    @property
    def in_channels(self) -> int:
        return self.channels

    @property
    def bottleneck_channels(self) -> int:
        if self.width_override is not None:
            return self.width_override
        return self.channels // 2 if self.downsample else self.channels // 4

    @property
    def out_channels(self) -> int:
        if self.out_channels_override is not None:
            return self.out_channels_override
        return self.channels * 2 if self.downsample else self.channels

    @property
    def stride(self) -> int:
        if self.stride_override is not None:
            return self.stride_override
        return 2 if self.downsample else 1

    @property
    def transforms_shortcut(self) -> bool:
        return self.stride != 1 or self.out_channels != self.in_channels

    def _sublayers(self):
        cin, cb, cout = self.in_channels, self.bottleneck_channels, self.out_channels
        cd = self.compute_dtype
        layers = [
            ("conv1", Conv(cin, cb, 1, use_bias=False, compute_dtype=cd), "main"),
            ("conv2", Conv(cb, cb, 3, stride=self.stride,
                           padding=1, use_bias=False, compute_dtype=cd,
                           pallas=self.pallas_conv), "main"),
            ("conv3", Conv(cb, cout, 1, use_bias=False, compute_dtype=cd), "main"),
            ("norm1", BatchNorm(cin if self.preact else cb, compute_dtype=cd), "m"),
            ("norm2", BatchNorm(cb, compute_dtype=cd), "m"),
            ("norm3", BatchNorm(cb if self.preact else cout, compute_dtype=cd), "m"),
            ("drop1", Dropout(self.dropout_prob), "m"),
            ("drop2", Dropout(self.dropout_prob), "m"),
            ("drop3", Dropout(self.dropout_prob), "m"),
        ]
        if self.transforms_shortcut and self.use_proj:
            layers.append(
                ("proj", Conv(cin, cout, 1, use_bias=False, compute_dtype=cd), "s"))
        return layers

    def init(self, rng, in_shape: Shape):
        if (self.transforms_shortcut and not self.use_proj
                and self.out_channels < self.in_channels):
            raise ValueError(
                f"Bottleneck block maps {self.in_channels} -> "
                f"{self.out_channels} channels with use_proj=False: the "
                f"option-A zero-pad shortcut cannot SHRINK channels. Use "
                f"use_proj=True for channel-reducing stack tokens.")
        h, w, cin = in_shape
        cb, cout, s = self.bottleneck_channels, self.out_channels, self.stride
        oh, ow = (h - 1) // s + 1, (w - 1) // s + 1
        shapes = {
            "conv1": in_shape,
            "conv2": (h, w, cb),
            "conv3": (oh, ow, cb),
            "norm1": in_shape if self.preact else (h, w, cb),
            "norm2": (h, w, cb) if self.preact else (oh, ow, cb),
            "norm3": (oh, ow, cb) if self.preact else (oh, ow, cout),
            "drop1": in_shape, "drop2": in_shape, "drop3": in_shape,
            "proj": (oh, ow, cin),
        }
        params, state = {}, {}
        for i, (name, layer, _) in enumerate(self._sublayers()):
            p, st, _ = layer.init(jax.random.fold_in(rng, i), shapes[name])
            if p:
                params[name] = p
            if st:
                state[name] = st
        return params, state, (oh, ow, cout)

    def _forward(self, run, x, train):
        i = x
        if self.preact:
            x = run("conv1", run("drop1", jnp.maximum(run("norm1", x), 0)))
            x = run("conv2", run("drop2", jnp.maximum(run("norm2", x), 0)))
            x = run("conv3", run("drop3", jnp.maximum(run("norm3", x), 0)))
        else:
            x = jnp.maximum(run("norm1", run("conv1", run("drop1", x))), 0)
            x = jnp.maximum(run("norm2", run("conv2", run("drop2", x))), 0)
            x = run("norm3", run("conv3", run("drop3", x)))
        if self.transforms_shortcut:
            i = _subsample(i, self.stride)
            if self.use_proj:
                i = run("proj", i)
            else:
                i = _zero_pad_channels(i, self.out_channels - self.in_channels)
        h = i.astype(x.dtype) + x
        if not self.preact:
            h = jnp.maximum(h, 0)
        return h

    # --- NV-carrier int8 training path (Sequential lane protocol) -------

    def lane_eligible(self, x_shape, train: bool) -> bool:
        """True when this block runs the NV int8 TRAINING path
        (ops/pallas/bneck_nv_train.py): post-act identity-shortcut
        stride-1 blocks under `use_int8_train`, no dropout. Transition
        blocks and eval mode stay on the XLA path; pod meshes fall back
        too (the NV halves have no shard_map dispatch yet — GSPMD would
        gather batch shards around the custom calls)."""
        if not (self.int8_train and train and not self.preact):
            return False
        if self.transforms_shortcut or self.stride != 1:
            return False
        if self.dropout_prob != 0.0:
            return False
        if self.compute_dtype != jnp.bfloat16:
            return False
        if len(x_shape) != 4:
            return False
        b, h, w, c = x_shape
        if c != self.in_channels:
            return False
        if self._data_shards() != 1:
            return False
        if b < 32 or b % 32 or b & (b - 1):
            return False  # int8 sublane tile / pow2 W-border masks
        if c % 8 or self.bottleneck_channels % 8:
            return False
        from pytorch_ddp_resnet_tpu.ops.pallas.bneck_nv_train import (
            nv_train_fits,
        )

        # geometry must fit the VMEM budget at every half kernel (e.g.
        # a wide entry dgrad can exceed VMEM even at 1-row chunks)
        return nv_train_fits(h, w, b, c, self.bottleneck_channels,
                             self.out_channels)

    def lane_from_nhwc(self, x):
        """Open an NV run from a materialized NHWC activation."""
        from pytorch_ddp_resnet_tpu.ops.pallas.nv_common import to_nv

        return NVLane(to_nv(x.astype(self.compute_dtype)))

    def apply_lane(self, params, state, nv, x_shape, *, train, rng=None):
        del rng  # no dropout on this path (gated in lane_eligible)
        if self.remat:
            def f(p, s, xx):
                return self._forward_nv(p, s, xx, x_shape)

            return jax.checkpoint(f)(params, state, nv)
        return self._forward_nv(params, state, nv, x_shape)

    def _forward_nv(self, params, state, nv, x_shape):
        """One identity bottleneck block in the NV carrier: three int8
        half ops + per-channel BatchNorm vector math. The previous
        block's BN3 epilogue + residual + relu fold into conv1's entry
        prologue; this block's own epilogue is LEFT PENDING in the
        returned NVLane (models/blocks.py:889-908 semantics at the FQT
        point; reference residual_block.py:102-215)."""
        from pytorch_ddp_resnet_tpu.ops.pallas.bneck_nv_train import (
            nv_half_1x1,
            nv_half_3x3,
        )

        b, h, w, cin = x_shape
        cb = self.bottleneck_channels
        cout = self.out_channels
        interpret = jax.default_backend() != "tpu"
        kw = dict(w_img=w, quant=True, quant_bwd=self.int8_train_bwd,
                  interpret=interpret)
        w1 = params["conv1"]["w"].reshape(cin, cb)
        w2 = params["conv2"]["w"]
        w3 = params["conv3"]["w"].reshape(cb, cout)
        cnt = b * h * w
        bns = {name: layer for name, layer, _ in self._sublayers()
               if name.startswith("norm")}
        new_state = dict(state)

        def bn_fold(name, zsum, zssq):
            mean = zsum / cnt
            var = zssq / cnt - jnp.square(mean)
            s, t, st = _fold_bn_batch_and_ema(
                bns[name], params[name], state[name], mean, var, cnt)
            new_state[name] = st
            return s, t

        if nv.acc3 is None:
            y1, z1s, z1q = nv_half_1x1(nv.x, w1, mode="identity", **kw)
            x_mat = nv.x
        else:
            y1, z1s, z1q, x_mat = nv_half_1x1(
                nv.acc3, w1, nv.s3, nv.t3, res=nv.x, mode="entry", **kw)
        s1, t1 = bn_fold("norm1", z1s, z1q)
        y2, z2s, z2q = nv_half_3x3(y1, w2, s1, t1, mode="affine", **kw)
        s2, t2 = bn_fold("norm2", z2s, z2q)
        y3, z3s, z3q = nv_half_1x1(y2, w3, s2, t2, mode="affine", **kw)
        s3, t3 = bn_fold("norm3", z3s, z3q)
        return NVLane(x_mat, y3, s3, t3), new_state
