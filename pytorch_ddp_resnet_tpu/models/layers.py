"""Functional layer primitives in NHWC layout.

Design: instead of translating torch ``nn.Module`` objects, each layer is a
small stateless Python object with two pure methods:

- ``init(rng, in_shape) -> (params, state, out_shape)`` where ``in_shape`` is
  the static per-sample shape ``(H, W, C)``, ``params`` is the trainable
  pytree and ``state`` the non-trainable pytree (BatchNorm EMA stats);
- ``apply(params, state, x, *, train, rng) -> (y, new_state)`` operating on a
  batched NHWC array.

Everything is a pytree of jnp arrays, so the whole model jits, shards, and
checkpoints with no wrapper machinery. NHWC + HWIO is the layout XLA:TPU
prefers for convolutions; the reference's NCHW tensors (torch convention) are
a CUDA/cuDNN artifact, not a capability.

Mixed precision: convolutions and matmuls run in ``compute_dtype`` (bf16 on
TPU) with fp32 MXU accumulation via ``preferred_element_type``; BatchNorm
statistics, parameters, and optimizer state stay fp32. This replaces the
reference's CUDA-only AMP autocast + GradScaler (script.py:63,
training.py:95-110); bf16 needs no loss scaling because it keeps the fp32
exponent range.

Layer semantics mirror the reference components (SURVEY.md §2.1 row 4):
Conv2d / BatchNorm2d / ReLU / MaxPool2d / AvgPool2d / Dropout /
Flatten+Linear, including torch's default initializers and BatchNorm's 0.1
EMA momentum and unbiased running-variance update.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from pytorch_ddp_resnet_tpu.ops import initializers as init_lib

Shape = Tuple[int, ...]  # per-sample (H, W, C)
Params = Dict[str, Any]
State = Dict[str, Any]


class Layer:
    """Base class; subclasses override init/apply. Layers hold only static
    hyperparameters — all tensors live in the (params, state) pytrees."""

    def init(self, rng, in_shape: Shape) -> Tuple[Params, State, Shape]:
        raise NotImplementedError

    def apply(self, params: Params, state: State, x, *, train: bool, rng):
        raise NotImplementedError


@dataclass(frozen=True)
class Conv(Layer):
    """2-D convolution, NHWC x HWIO -> NHWC (reference: torch Conv2d).

    ``kernel_init='kaiming_normal'`` reproduces the reference's
    ``_init_weights`` on top-level convs (resnet.py:160-163); the default
    reproduces torch's kaiming_uniform(a=sqrt(5)).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: str = "torch_default"  # or "kaiming_normal"
    compute_dtype: Any = jnp.bfloat16
    # Opt-in lane-packed Pallas kernel (ops/pallas/conv.py) for the
    # stride-1 3x3 SAME shapes; config flag `use_pallas_conv`. Non-eligible
    # shapes (stride-2 transitions, 1x1 projections) always use lax.conv.
    pallas: bool = False
    # Lane-emitting stem (ops/pallas/stem.py), set by the spec parser when
    # the residual trunk runs in the fused lane layout: the stem conv then
    # EMITS [C, B*H*W] directly, replacing the stage-1 entry relayout (and
    # its backward mirror) with a free layout choice on a trivial-FLOP op.
    lane_stem: bool = False
    shard_mesh: Any = None

    def init(self, rng, in_shape: Shape):
        h, w, c = in_shape
        if c != self.in_channels:
            raise ValueError(
                f"Conv expects {self.in_channels} input channels, got {c} "
                f"(in_shape={in_shape})."
            )
        k = self.kernel_size
        fan_in = k * k * self.in_channels
        w_rng, b_rng = jax.random.split(rng)
        w_shape = (k, k, self.in_channels, self.out_channels)
        if self.kernel_init == "kaiming_normal":
            kernel = init_lib.kaiming_normal(w_rng, w_shape, fan_in)
        else:
            kernel = init_lib.torch_default_uniform(w_rng, w_shape, fan_in)
        params = {"w": kernel}
        if self.use_bias:
            params["b"] = init_lib.torch_default_uniform(b_rng, (self.out_channels,), fan_in)
        s, p = self.stride, self.padding
        out_h = (h + 2 * p - k) // s + 1
        out_w = (w + 2 * p - k) // s + 1
        return params, {}, (out_h, out_w, self.out_channels)

    def apply(self, params, state, x, *, train, rng=None):
        cd = self.compute_dtype
        s, p = self.stride, self.padding
        # Inputs and kernel in compute dtype; XLA:TPU accumulates bf16 convs
        # in fp32 on the MXU natively. (preferred_element_type=f32 would be
        # equivalent forward but breaks the conv transpose rule's dtype
        # matching in the backward pass.)
        if self.pallas and self.kernel_size == 3 and s == 1 and p == 1:
            from pytorch_ddp_resnet_tpu.ops.pallas.conv import conv3x3_same

            # Mosaic targets TPU; elsewhere (CPU tests) run interpreted —
            # same convention as the fused augment kernel (algos/train.py).
            y = conv3x3_same(x.astype(cd), params["w"].astype(cd),
                             jax.default_backend() != "tpu")
        else:
            y = lax.conv_general_dilated(
                x.astype(cd),
                params["w"].astype(cd),
                window_strides=(s, s),
                padding=[(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            y = y + params["b"].astype(cd)
        return y, state

    def lane_entry_eligible(self, x_shape, train: bool) -> bool:
        """Sequential's lane protocol: True when this conv should emit the
        lane layout directly (the trunk behind it will consume it; if the
        run turns out ineligible at runtime shape, Sequential just
        converts back — same cost as the entry transpose this replaces)."""
        if not (self.lane_stem and train and len(x_shape) == 4
                and self.kernel_size == 3 and self.stride == 1
                and self.padding == 1 and self.use_bias
                and self.in_channels <= 8
                and self.out_channels % 16 == 0):
            return False
        b, h, w, _ = x_shape
        d = (1 if self.shard_mesh is None
             else int(self.shard_mesh.shape.get("data", 1)))
        if b % d != 0:
            return False
        from pytorch_ddp_resnet_tpu.ops.pallas.stem import stem_lane_tile

        try:
            stem_lane_tile(h, w, (b // d) * h * w, self.out_channels)
        except ValueError:
            return False
        return True

    def apply_to_lane(self, params, state, x, *, train, rng=None):
        """Stem conv consuming NHWC, emitting lane layout (see
        ops/pallas/stem.py). The input-side transpose is over Cin <= 8
        channels (~2% of the activation bytes the replaced [Cout, N]
        relayout moved); on a pod mesh the kernel dispatches per batch
        shard under shard_map, mirroring blocks.py _run_half."""
        from pytorch_ddp_resnet_tpu.ops.pallas.stem import stem_conv_lane

        interpret = jax.default_backend() != "tpu"
        cd = self.compute_dtype
        b, h, w, c = x.shape
        x_cs = jnp.transpose(x.astype(cd), (3, 0, 1, 2)).reshape(
            c, b * h * w)
        d = (1 if self.shard_mesh is None
             else int(self.shard_mesh.shape.get("data", 1)))
        if d == 1:
            y_cs = stem_conv_lane(x_cs, params["w"], params["b"], h=h,
                                  w_img=w, interpret=interpret)
            return y_cs, (b, h, w, self.out_channels), state
        from jax.sharding import PartitionSpec as P

        def local(x_l, w_l, b_l):
            return stem_conv_lane(x_l, w_l, b_l, h=h, w_img=w,
                                  interpret=interpret)

        y_cs = jax.shard_map(
            local, mesh=self.shard_mesh,
            in_specs=(P(None, "data"), P(), P()),
            out_specs=P(None, "data"), check_vma=False)(
                x_cs, params["w"], params["b"])
        return y_cs, (b, h, w, self.out_channels), state


@dataclass(frozen=True)
class BatchNorm(Layer):
    """BatchNorm2d over (N, H, W) with torch semantics:

    - normalization uses *biased* batch variance, eps=1e-5;
    - running stats EMA with momentum 0.1, running_var updated with the
      *unbiased* variance (factor n/(n-1));
    - eval mode normalizes with running stats.

    Statistics are computed in fp32 regardless of compute dtype. Under
    jit+GSPMD with a batch-sharded input, the reductions below are *global*,
    i.e. this is cross-replica (synced) BatchNorm — a deliberate improvement
    over the reference's per-process stats (SURVEY.md §7 "hard parts"); at
    the reference's world sizes the accuracy effect is nil-to-positive.
    """

    num_features: int
    momentum: float = 0.1
    eps: float = 1e-5
    compute_dtype: Any = jnp.bfloat16
    # Optional hand-written VJP (ops/batchnorm.py): same math, minimal
    # reduction set and bf16 residuals. Measured perf-neutral vs autodiff on
    # v5e (72.8 vs 71.8 ms/step, WRN-28-10 b256) — XLA's autodiff BN is
    # already efficient — so autodiff stays the default.
    fused_vjp: bool = False

    def init(self, rng, in_shape: Shape):
        del rng
        c = in_shape[-1]
        if c != self.num_features:
            raise ValueError(
                f"BatchNorm expects {self.num_features} channels, got {c}."
            )
        f = self.num_features
        params = {"scale": jnp.ones((f,), jnp.float32),
                  "bias": jnp.zeros((f,), jnp.float32)}
        state = {"mean": jnp.zeros((f,), jnp.float32),
                 "var": jnp.ones((f,), jnp.float32),
                 "count": jnp.zeros((), jnp.int64 if jax.config.read("jax_enable_x64") else jnp.int32)}
        return params, state, in_shape

    def apply(self, params, state, x, *, train, rng=None):
        if train:
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if self.fused_vjp:
                from pytorch_ddp_resnet_tpu.ops.batchnorm import (
                    batch_norm_train)

                y, mean, var = batch_norm_train(
                    x.astype(self.compute_dtype), params["scale"],
                    params["bias"], self.eps)
            else:
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axis=(0, 1, 2))
                var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
                inv = lax.rsqrt(var + self.eps) * params["scale"]
                y = ((xf - mean) * inv + params["bias"]).astype(
                    self.compute_dtype)
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            new_state = {
                "mean": (1 - m) * state["mean"] + m * mean,
                "var": (1 - m) * state["var"] + m * unbiased,
                "count": state["count"] + 1,
            }
            return y, new_state
        mean, var = state["mean"], state["var"]
        inv = lax.rsqrt(var + self.eps) * params["scale"]
        y = (x.astype(jnp.float32) - mean) * inv + params["bias"]
        return y.astype(self.compute_dtype), state


@dataclass(frozen=True)
class ReLU(Layer):
    def init(self, rng, in_shape: Shape):
        return {}, {}, in_shape

    def apply(self, params, state, x, *, train, rng=None):
        return jnp.maximum(x, 0), state


@dataclass(frozen=True)
class MaxPool(Layer):
    """MaxPool2d(K, S, P); padding contributes -inf (torch semantics)."""

    kernel_size: int
    stride: int
    padding: int = 0

    def init(self, rng, in_shape: Shape):
        h, w, c = in_shape
        k, s, p = self.kernel_size, self.stride, self.padding
        out_h = (h + 2 * p - k) // s + 1
        out_w = (w + 2 * p - k) // s + 1
        return {}, {}, (out_h, out_w, c)

    def apply(self, params, state, x, *, train, rng=None):
        k, s, p = self.kernel_size, self.stride, self.padding
        # init must be a Python scalar: a traced array defeats JAX's
        # max-monoid recognition and breaks reduce_window's reverse-mode AD
        if jnp.issubdtype(x.dtype, jnp.floating):
            neg_inf = -float("inf")
        else:
            neg_inf = jnp.iinfo(x.dtype).min
        y = lax.reduce_window(
            x, neg_inf, lax.max,
            window_dimensions=(1, k, k, 1),
            window_strides=(1, s, s, 1),
            padding=[(0, 0), (p, p), (p, p), (0, 0)],
        )
        return y, state


@dataclass(frozen=True)
class AvgPool(Layer):
    """AvgPool2d(K, S, P) with torch's default count_include_pad=True."""

    kernel_size: int
    stride: int
    padding: int = 0

    def init(self, rng, in_shape: Shape):
        h, w, c = in_shape
        k, s, p = self.kernel_size, self.stride, self.padding
        out_h = (h + 2 * p - k) // s + 1
        out_w = (w + 2 * p - k) // s + 1
        return {}, {}, (out_h, out_w, c)

    def apply(self, params, state, x, *, train, rng=None):
        k, s, p = self.kernel_size, self.stride, self.padding
        y = lax.reduce_window(
            x.astype(jnp.float32), 0.0, lax.add,
            window_dimensions=(1, k, k, 1),
            window_strides=(1, s, s, 1),
            padding=[(0, 0), (p, p), (p, p), (0, 0)],
        ) / float(k * k)
        return y.astype(x.dtype), state


@dataclass(frozen=True)
class Dropout(Layer):
    """Inverted dropout, active only in train mode (torch nn.Dropout).

    The keep decision uses 8 random bits per element instead of 32
    (``bits < round(keep*256)``), quartering the RNG bytes the TPU's
    rng-bit-generator must produce — measured ~4% of step time on WRN-28-10
    (see CLAUDE.md perf notes). The keep probability is quantized to 1/256
    (e.g. 0.7 -> 179/256 = 0.69922) and the inverse scaling uses the
    *quantized* value, so E[dropout(x)] == x holds exactly. The reference's
    torch dropout draws a full float per element; its masks are not
    bit-reproducible anyway, so only the distribution is parity-relevant.
    """

    rate: float

    def init(self, rng, in_shape: Shape):
        return {}, {}, in_shape

    def apply(self, params, state, x, *, train, rng=None):
        if not train or self.rate == 0.0:
            return x, state
        thresh = int(round((1.0 - self.rate) * 256.0))
        if thresh <= 0:
            return jnp.zeros_like(x), state
        if thresh >= 256:
            return x, state
        keep_q = thresh / 256.0
        bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
        mask = bits < jnp.uint8(thresh)
        return jnp.where(mask, x / keep_q, jnp.zeros_like(x)), state


@dataclass(frozen=True)
class Dense(Layer):
    """Flatten + Linear ('fI,O' spec component; reference resnet.py:117-120).

    Flatten order is NHWC-native (H, W, C); the reference flattens (C, H, W).
    All shipped specs apply this after global pooling (1x1 spatial), where the
    orders coincide. Divergence is only observable when porting weights for
    specs with >1x1 pre-flatten spatial extent, which this framework does not
    do.
    """

    in_features: int
    out_features: int
    compute_dtype: Any = jnp.bfloat16

    def init(self, rng, in_shape: Shape):
        flat = 1
        for d in in_shape:
            flat *= d
        if flat != self.in_features:
            raise ValueError(
                f"Dense expects {self.in_features} input features but the "
                f"incoming shape {in_shape} flattens to {flat}."
            )
        w_rng, b_rng = jax.random.split(rng)
        fan_in = self.in_features
        params = {
            "w": init_lib.torch_default_uniform(
                w_rng, (self.in_features, self.out_features), fan_in),
            "b": init_lib.torch_default_uniform(
                b_rng, (self.out_features,), fan_in),
        }
        return params, {}, (self.out_features,)

    def apply(self, params, state, x, *, train, rng=None):
        cd = self.compute_dtype
        xb = x.reshape(x.shape[0], -1).astype(cd)
        y = jnp.dot(xb, params["w"].astype(cd))
        y = y.astype(jnp.float32) + params["b"].astype(jnp.float32)
        return y, state  # logits in fp32 for the loss


def _delane(lane):
    """Close an open lane run back to NHWC. The payload is either the
    basic-block lane layout ([C, B*H*W]) or a carrier object exposing
    ``materialize(w_img)`` (the bottleneck NV run state, blocks.py
    NVLane — materializing applies the last block's pending epilogue)."""
    payload, (b, h, w, c) = lane
    if hasattr(payload, "materialize"):
        return payload.materialize(w)
    return jnp.transpose(payload.reshape(c, b, h, w), (1, 2, 3, 0))


@dataclass(frozen=True)
class Sequential(Layer):
    """Ordered composite; the model spine (reference nn.Sequential)."""

    layers: Tuple[Tuple[str, Layer], ...]  # (name, layer), names unique

    def init(self, rng, in_shape: Shape):
        params, state = {}, {}
        shape = in_shape
        for i, (name, layer) in enumerate(self.layers):
            p, s, shape = layer.init(jax.random.fold_in(rng, i), shape)
            if p:
                params[name] = p
            if s:
                state[name] = s
        return params, state, shape

    def apply(self, params, state, x, *, train, rng=None):
        x, new_state, lane = self._apply_loop(params, state, x, None,
                                              train=train, rng=rng)
        if lane is not None:
            x = _delane(lane)
        return x, new_state

    def _lane_accepts(self, x_shape, train: bool) -> bool:
        """True when this (nested) Sequential can start directly from the
        lane layout: its first layer is a lane-run block for x_shape."""
        if not self.layers:
            return False
        first = self.layers[0][1]
        if (hasattr(first, "apply_lane")
                and first.lane_eligible(x_shape, train)):
            return True
        # a stage whose first block is a lane-through transition also
        # consumes the open lane run (stride-2 parity-packed kernel)
        return (hasattr(first, "apply_lane_through")
                and first.lane_through_eligible(x_shape, train))

    def _apply_loop(self, params, state, x, lane, *, train, rng=None):
        # Transpose hoisting for the fused block-half path: a run of
        # consecutive layers exposing `apply_lane`/`lane_eligible` (the
        # fused preact ResidualBlocks, blocks.py) executes entirely in the
        # kernels' lane layout ([C, B*H*W]), converting once at entry and
        # once at exit instead of per block — each per-block conversion is
        # a full-activation HBM round trip that was measured to cancel the
        # fused kernels' win (BASELINE.md "Fused block-half kernels").
        # `lane` may arrive non-None from an enclosing Sequential (the
        # lane-emitting stem feeding a block stack) and is returned still
        # open when the run reaches the end, so lane state crosses nested
        # Sequential boundaries without an NHWC round trip.
        new_state = dict(state)

        for i, (name, layer) in enumerate(self.layers):
            layer_rng = jax.random.fold_in(rng, i) if rng is not None else None
            shape = lane[1] if lane is not None else getattr(x, "shape", None)
            if (hasattr(layer, "apply_lane") and shape is not None
                    and len(shape) == 4 and layer.lane_eligible(shape, train)):
                if lane is None:
                    if hasattr(layer, "lane_from_nhwc"):
                        # layer-directed entry (the NV bottleneck carrier)
                        lane = (layer.lane_from_nhwc(x), shape)
                    else:
                        b, h, w, c = shape
                        x_cs = jnp.transpose(
                            x.astype(layer.compute_dtype),
                            (3, 0, 1, 2)).reshape(c, b * h * w)
                        lane = (x_cs, shape)
                x_cs, s = layer.apply_lane(
                    params.get(name, {}), state.get(name, {}), lane[0],
                    lane[1], train=train, rng=layer_rng)
                lane = (x_cs, lane[1])
            elif (hasattr(layer, "apply_lane_through") and lane is not None
                  and len(shape) == 4
                  and layer.lane_through_eligible(shape, train)):
                # lane THROUGH op (a stage-transition block on the int8
                # path with an open lane run): the strided conv consumes
                # the lane layout directly (parity-packed stride-2
                # kernel, ops/pallas/transition.py) — no NHWC round trip
                # at the stage boundary at all
                x_cs, out_shape, s = layer.apply_lane_through(
                    params.get(name, {}), state.get(name, {}), lane[0],
                    lane[1], train=train, rng=layer_rng)
                lane = (x_cs, out_shape)
            elif (hasattr(layer, "apply_to_lane") and shape is not None
                  and len(shape) == 4
                  and layer.lane_entry_eligible(shape, train)):
                # lane ENTRY op (a stage-transition block or the stem conv
                # on the int8/fused path): consumes NHWC, EMITS lane — the
                # exit of the previous run and the entry of the next
                # collapse into this layer
                if lane is not None:
                    x, lane = _delane(lane), None
                x_cs, out_shape, s = layer.apply_to_lane(
                    params.get(name, {}), state.get(name, {}), x,
                    train=train, rng=layer_rng)
                lane = (x_cs, out_shape)
            elif (isinstance(layer, Sequential) and lane is not None
                  and layer._lane_accepts(lane[1], train)):
                # nested stack consuming the open lane run (e.g. the
                # lane-emitting stem feeding stage 1's block stack)
                x, s, lane = layer._apply_loop(
                    params.get(name, {}), state.get(name, {}), None, lane,
                    train=train, rng=layer_rng)
            else:
                if lane is not None:
                    x, lane = _delane(lane), None
                x, s = layer.apply(
                    params.get(name, {}), state.get(name, {}), x,
                    train=train, rng=layer_rng)
            if s:
                new_state[name] = s
        return x, new_state, lane


def named_sequential(*layers: Layer, names: Optional[Sequence[str]] = None) -> Sequential:
    """Build a Sequential with stable, checkpoint-friendly names like
    '00_conv', '01_bn'."""
    entries = []
    for i, layer in enumerate(layers):
        kind = type(layer).__name__.lower()
        name = names[i] if names else f"{i:02d}_{kind}"
        entries.append((name, layer))
    return Sequential(tuple(entries))
