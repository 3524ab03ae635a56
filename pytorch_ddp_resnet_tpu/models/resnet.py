"""Spec-string-driven residual networks.

Implements the reference's architecture mini-language
(reference: resnet/architectures/resnet.py:36-58, parser at 122-158):

    space-separated components from
      cI,O,K,S,P   convolution (I in-ch, O out-ch, K kernel, S stride, P pad)
      mpK,S,P      max pool
      apK,S,P      average pool
      rD           stack of D basic residual blocks
      bD           stack of D bottleneck residual blocks
      n            batch norm (over current channel count)
      a            ReLU
      fI,O         flatten + linear

Rules reproduced exactly:
  - the letter prefix is matched by ``[a-z]+`` so e.g. ``fc64,10`` (as shipped
    in the reference configs) parses the same as ``f64,10``;
  - a residual stack whose *previous token* is a stack of the same kind makes
    its first block downsample 2x and double the channel count
    (resnet.py:135-147);
  - top-level convs get kaiming-normal weight init (resnet.py:160-163); block
    convs keep the torch default.

Divergence (documented, deliberate): a spec *starting* with ``r``/``b``
indexes token[-1] in the reference (Python negative indexing) — here it
simply never downsamples; no shipped or sane spec starts with a stack.

Extension beyond the reference (documented divergence): multi-int stack
tokens express ImageNet-family stage plans the reference's parser cannot
(its README claims WRN-50-2, README.md:76-77, but the fixed
"downsample=2x channels, width=channels//4|2" rules cannot build it):

      rD,O,S       D basic blocks; first block: out-channels O, stride S
      bD,O,W,S     D bottleneck blocks; first block: out O, inner width W,
                   stride S; later blocks keep O and W at stride 1

  e.g. the real WRN-50-2 (torchvision ``wide_resnet50_2`` stage plan):
      c3,64,7,2,3 n a mp3,2,1 b3,256,128,1 b4,512,256,2 b6,1024,512,2
      b3,2048,1024,2 ap7,1,0 fc2048,1000
  and ResNet-50 is the same plan with widths 64,128,256,512. Single-int
  ``rD``/``bD`` tokens keep the reference's exact legacy semantics.

The model is a pure-function pair: ``init(rng, input_shape)`` builds the
(params, state) pytrees; ``apply`` is jit/shard/grad-friendly.
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp

from pytorch_ddp_resnet_tpu.models.blocks import (
    BottleneckResidualBlock,
    ResidualBlock,
)
from pytorch_ddp_resnet_tpu.models.layers import (
    AvgPool,
    BatchNorm,
    Conv,
    Dense,
    MaxPool,
    ReLU,
    Sequential,
    Shape,
)

_COMPONENT_RE = re.compile(r"([a-z]+)((?:[0-9]+)(?:,[0-9]+)*)?$")


def extract_ints(token: str, num: int):
    """Parse the integer payload of a spec token (reference resnet.py:16-22)."""
    m = _COMPONENT_RE.match(token)
    if m is None or m.group(2) is None:
        raise ValueError(f"Cannot parse spec component {token!r}.")
    ints = tuple(int(v) for v in m.group(2).split(","))
    if len(ints) != num:
        raise ValueError(
            f"Spec component {token!r} carries {len(ints)} ints, expected {num}."
        )
    return ints[0] if num == 1 else ints


def extract_int_list(token: str, allowed_counts) -> Tuple[int, ...]:
    """Variable-arity token payload (extended stack tokens)."""
    m = _COMPONENT_RE.match(token)
    if m is None or m.group(2) is None:
        raise ValueError(f"Cannot parse spec component {token!r}.")
    ints = tuple(int(v) for v in m.group(2).split(","))
    if len(ints) not in allowed_counts:
        raise ValueError(
            f"Spec component {token!r} carries {len(ints)} ints, expected one "
            f"of {sorted(allowed_counts)}.")
    return ints


def parse_spec(
    architecture_spec: str,
    preact: bool,
    use_proj: bool,
    dropout_prob: float,
    compute_dtype: Any = jnp.bfloat16,
    remat: bool = False,
    pallas_conv: bool = False,
    fused_block: bool = False,
    int8_train: bool = False,
    int8_train_bwd: bool = False,
    inkernel_dropout: bool = False,
    lane_transition: bool = False,
    shard_mesh: Any = None,
) -> Sequential:
    """Token list -> Sequential of layers, threading the channel count."""
    tokens = architecture_spec.split()
    entries: List[Tuple[str, Any]] = []
    channels: Optional[int] = None
    cd = compute_dtype

    def block_stack(kind: str, n: int, tok: str):
        nonlocal channels
        cls = ResidualBlock if kind == "r" else BottleneckResidualBlock
        ints = extract_int_list(tok, {1, 3} if kind == "r" else {1, 4})
        if len(ints) == 1:
            # legacy reference semantics: adjacency downsampling rule
            depth = ints[0]
            downsample = n > 0 and tokens[n - 1].startswith(kind[0])
            cin = channels
            cout = 2 * channels if downsample else channels
            overrides = {}
            first_overrides = {}
        else:
            # extended stage plan: explicit out-channels / width / stride
            if kind == "r":
                depth, cout, stride = ints
                width = None
            else:
                depth, cout, width, stride = ints
            cin = channels
            downsample = False  # overrides drive the geometry
            overrides = {"out_channels_override": cout,
                         "width_override": width,
                         "stride_override": 1}
            first_overrides = {**overrides, "stride_override": stride}
            if kind == "r":
                overrides.pop("width_override")
                first_overrides.pop("width_override")
        blocks = []
        for ell in range(depth):
            blocks.append((
                f"block{ell}",
                cls(channels=cin if ell == 0 else cout,
                    downsample=downsample if ell == 0 else False,
                    preact=preact, use_proj=use_proj,
                    dropout_prob=dropout_prob, compute_dtype=cd,
                    remat=remat, pallas_conv=pallas_conv,
                    fused_block=fused_block, int8_train=int8_train,
                    int8_train_bwd=int8_train_bwd,
                    inkernel_dropout=inkernel_dropout,
                    lane_transition=lane_transition,
                    shard_mesh=shard_mesh,
                    **(first_overrides if ell == 0 else overrides)),
            ))
        channels = cout
        return Sequential(tuple(blocks))

    for n, tok in enumerate(tokens):
        if tok.startswith("c"):
            i, o, k, s, p = extract_ints(tok, 5)
            # lane_stem: when the preact trunk runs in the fused lane
            # layout, let an eligible stem emit [C, B*H*W] directly
            # instead of paying the stage-1 entry relayout (stem.py)
            layer = Conv(i, o, k, stride=s, padding=p, use_bias=True,
                         kernel_init="kaiming_normal", compute_dtype=cd,
                         lane_stem=(preact and (int8_train or fused_block)
                                    and k == 3 and s == 1 and p == 1),
                         shard_mesh=shard_mesh)
            channels = o
            name = f"{n:02d}_conv"
        elif tok.startswith("mp"):
            k, s, p = extract_ints(tok, 3)
            layer = MaxPool(k, s, p)
            name = f"{n:02d}_maxpool"
        elif tok.startswith("ap"):
            k, s, p = extract_ints(tok, 3)
            layer = AvgPool(k, s, p)
            name = f"{n:02d}_avgpool"
        elif tok.startswith("r"):
            layer = block_stack("r", n, tok)
            name = f"{n:02d}_stack"
        elif tok.startswith("b"):
            layer = block_stack("b", n, tok)
            name = f"{n:02d}_stack"
        elif tok.startswith("n"):
            layer = BatchNorm(channels, compute_dtype=cd)
            name = f"{n:02d}_bn"
        elif tok.startswith("a"):
            layer = ReLU()
            name = f"{n:02d}_relu"
        elif tok.startswith("f"):
            i, o = extract_ints(tok, 2)
            layer = Dense(i, o, compute_dtype=cd)
            name = f"{n:02d}_fc"
        else:
            raise ValueError(
                f"Unknown component {tok!r} in architecture spec."
            )
        entries.append((name, layer))
    return Sequential(tuple(entries))


class ResNet:
    """A residual network built from an architecture spec string.

    Functional counterpart of the reference's ``ResNet`` nn.Module
    (resnet.py:25-166): construction parses the spec; ``init`` creates the
    parameter/state pytrees under an explicit PRNG key; ``apply`` runs the
    batched NHWC forward pass.
    """

    def __init__(
        self,
        architecture_spec: str,
        preact: bool,
        use_proj: bool,
        dropout_prob: float,
        compute_dtype: Any = jnp.bfloat16,
        remat: bool = False,
        pallas_conv: bool = False,
        fused_block: bool = False,
        int8_train: bool = False,
        int8_train_bwd: bool = False,
        inkernel_dropout: bool = False,
        lane_transition: bool = False,
        shard_mesh: Any = None,
    ):
        self.architecture_spec = architecture_spec
        self.preact = preact
        self.use_proj = use_proj
        self.dropout_prob = dropout_prob
        self.compute_dtype = compute_dtype
        self.remat = remat
        self.pallas_conv = pallas_conv
        self.fused_block = fused_block
        self.int8_train = int8_train
        self.int8_train_bwd = int8_train_bwd
        self.inkernel_dropout = inkernel_dropout
        self.lane_transition = lane_transition
        self.shard_mesh = shard_mesh
        self.spine = parse_spec(
            architecture_spec, preact, use_proj, dropout_prob, compute_dtype,
            remat=remat, pallas_conv=pallas_conv, fused_block=fused_block,
            int8_train=int8_train, int8_train_bwd=int8_train_bwd,
            inkernel_dropout=inkernel_dropout,
            lane_transition=lane_transition, shard_mesh=shard_mesh,
        )

    def init(self, rng, input_shape: Shape):
        """input_shape: per-sample (H, W, C). Returns (params, state)."""
        params, state, out_shape = self.spine.init(rng, tuple(input_shape))
        self.output_shape = out_shape
        return params, state

    def apply(self, params, state, x, *, train: bool, rng=None):
        """x: (N, H, W, C). Returns (logits fp32, new_state)."""
        if train and self.dropout_prob > 0.0 and rng is None:
            raise ValueError("Training with dropout requires an rng.")
        return self.spine.apply(params, state, x, train=train, rng=rng)

    def param_count(self, params) -> int:
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
