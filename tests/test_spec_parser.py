"""Spec mini-language parser tests (reference behavior: resnet.py:122-158).

Golden parameter counts and shapes were measured by instantiating the
reference torch models directly (see docstrings per test)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from pytorch_ddp_resnet_tpu.models.resnet import ResNet, extract_ints, parse_spec
from pytorch_ddp_resnet_tpu.models import layers as L
from pytorch_ddp_resnet_tpu.models.blocks import (
    BottleneckResidualBlock,
    ResidualBlock,
)


def test_extract_ints():
    assert extract_ints("c3,16,3,1,1", 5) == (3, 16, 3, 1, 1)
    assert extract_ints("r3", 1) == 3
    assert extract_ints("ap8,1,0", 3) == (8, 1, 0)
    # The letter prefix is [a-z]+, so the shipped 'fc64,10' token parses
    # (reference quirk, resnet.py:17 + configs).
    assert extract_ints("fc64,10", 2) == (64, 10)
    with pytest.raises(ValueError):
        extract_ints("c3,16", 5)
    with pytest.raises(ValueError):
        extract_ints("n", 1)


def test_unknown_component_raises():
    with pytest.raises(ValueError):
        parse_spec("c3,16,3,1,1 z3", False, False, 0.0)


def test_token_to_layer_mapping():
    spine = parse_spec(
        "c3,16,3,1,1 n a mp3,2,1 r2 r2 b2 ap8,1,0 fc32,10", False, False, 0.0
    )
    kinds = [type(layer).__name__ for _, layer in spine.layers]
    assert kinds == [
        "Conv", "BatchNorm", "ReLU", "MaxPool", "Sequential", "Sequential",
        "Sequential", "AvgPool", "Dense",
    ]


def test_adjacency_downsampling_rule():
    """Adjacent same-kind stacks: first block of the later stack downsamples
    and doubles channels (resnet.py:135-147)."""
    spine = parse_spec("c3,16,3,1,1 r2 r2 b2 b2", False, False, 0.0)
    stacks = [layer for _, layer in spine.layers if isinstance(layer, L.Sequential)]
    r1, r2, b1, b2 = stacks

    def flags(stack):
        return [(blk.downsample, blk.in_channels, blk.out_channels)
                for _, blk in stack.layers]

    # first r stack: previous token is the conv -> no downsample
    assert flags(r1) == [(False, 16, 16), (False, 16, 16)]
    # second r stack: previous token is r -> downsample in block 0 only
    assert flags(r2) == [(True, 16, 32), (False, 32, 32)]
    # first b stack: previous token is 'r2' (not b) -> no downsample
    assert flags(b1) == [(False, 32, 32), (False, 32, 32)]
    assert flags(b2) == [(True, 32, 64), (False, 64, 64)]
    assert all(isinstance(blk, ResidualBlock) for _, blk in r2.layers)
    assert all(isinstance(blk, BottleneckResidualBlock) for _, blk in b2.layers)


def test_channel_threading_through_norm():
    spine = parse_spec("c3,16,3,1,1 r2 r2 n a", True, True, 0.0)
    bn = spine.layers[-2][1]
    assert isinstance(bn, L.BatchNorm)
    assert bn.num_features == 32  # doubled by the second stack


# --- golden models: param counts & output shapes measured on the reference --

GOLDENS = [
    # (name, spec, preact, use_proj, input hw, classes, torch param count)
    ("resnet-v1-20",
     "c3,16,3,1,1 n a r3 r3 r3 ap8,1,0 fc64,10", False, False, 32, 10, 269738),
    ("wrn-28-10",
     "c3,160,3,1,1 r4 r4 r4 n a ap8,1,0 fc640,10", True, True, 32, 10, 36688330),
    ("resnet-v2-164",
     "c3,64,3,1,1 b18 b18 b18 n a ap8,1,0 fc256,10", True, True, 32, 10, 1704458),
    ("imagenet-bottleneck",
     "c3,64,7,2,3 n a mp3,2,1 b3 b4 b6 b3 ap7,1,0 fc512,1000",
     False, True, 224, 1000, 1999016),
]


@pytest.mark.slow
@pytest.mark.parametrize("name,spec,preact,proj,hw,classes,count", GOLDENS)
def test_golden_param_counts_and_shapes(name, spec, preact, proj, hw, classes, count):
    model = ResNet(spec, preact, proj, 0.0, compute_dtype=jnp.float32)
    params, state = model.init(jax.random.key(0), (hw, hw, 3))
    assert model.param_count(params) == count, name
    x = jnp.zeros((2, hw, hw, 3), jnp.float32)
    logits, _ = model.apply(params, state, x, train=False)
    assert logits.shape == (2, classes)
    assert logits.dtype == jnp.float32


# --- extended stack tokens (framework extension; models/resnet.py) ----------


EXTENDED_GOLDENS = [
    # torchvision wide_resnet50_2 = 68,883,240; ours has no shortcut BNs
    # (-7,680, reference shortcut convention) and a stem-conv bias (+64)
    ("wrn-50-2",
     "c3,64,7,2,3 n a mp3,2,1 b3,256,128,1 b4,512,256,2 b6,1024,512,2 "
     "b3,2048,1024,2 ap7,1,0 fc2048,1000", False, True, 224, 1000, 68875624),
    # torchvision resnet50 = 25,557,032; same -7,616 convention delta
    ("resnet-50",
     "c3,64,7,2,3 n a mp3,2,1 b3,256,64,1 b4,512,128,2 b6,1024,256,2 "
     "b3,2048,512,2 ap7,1,0 fc2048,1000", False, True, 224, 1000, 25549416),
]


@pytest.mark.parametrize("name,spec,preact,proj,hw,classes,count",
                         EXTENDED_GOLDENS)
@pytest.mark.slow
def test_extended_golden_param_counts(name, spec, preact, proj, hw, classes,
                                      count):
    model = ResNet(spec, preact, proj, 0.0, compute_dtype=jnp.float32)
    params, state = model.init(jax.random.key(0), (hw, hw, 3))
    assert model.param_count(params) == count, name
    x = jnp.zeros((1, hw, hw, 3), jnp.float32)
    logits, _ = model.apply(params, state, x, train=False)
    assert logits.shape == (1, classes)


def test_extended_tokens_match_legacy_semantics():
    """rD,O,S / bD,O,W,S with the legacy geometry must build the numerically
    identical model as the adjacency rule (same init key => same params)."""
    legacy = ResNet("c3,16,3,1,1 n a r2 r2 ap16,1,0 fc32,10",
                    preact=False, use_proj=True, dropout_prob=0.0,
                    compute_dtype=jnp.float32)
    # second stack: legacy adjacency => out 32, stride 2
    ext = ResNet("c3,16,3,1,1 n a r2 r2,32,2 ap16,1,0 fc32,10",
                 preact=False, use_proj=True, dropout_prob=0.0,
                 compute_dtype=jnp.float32)
    pl, sl = legacy.init(jax.random.key(7), (32, 32, 3))
    pe, se = ext.init(jax.random.key(7), (32, 32, 3))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), pl, pe)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    yl, _ = legacy.apply(pl, sl, x, train=False)
    ye, _ = ext.apply(pe, se, x, train=False)
    np.testing.assert_array_equal(np.asarray(yl), np.asarray(ye))


def test_extended_bottleneck_legacy_equivalence():
    legacy = ResNet("c3,64,3,1,1 b2 b2 ap16,1,0 fc128,10",
                    preact=True, use_proj=True, dropout_prob=0.0,
                    compute_dtype=jnp.float32)
    # legacy second b-stack: downsample => out 128, width 64//... width rule:
    # channels//2 when downsampling = 32? No: first block channels=64,
    # downsample => width 64//2=32, out 128; later blocks width 128//4=32.
    ext = ResNet("c3,64,3,1,1 b2 b2,128,32,2 ap16,1,0 fc128,10",
                 preact=True, use_proj=True, dropout_prob=0.0,
                 compute_dtype=jnp.float32)
    pl, sl = legacy.init(jax.random.key(3), (32, 32, 3))
    pe, se = ext.init(jax.random.key(3), (32, 32, 3))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), pl, pe)


def test_extended_token_arity_errors():
    with pytest.raises(ValueError, match="expected one of"):
        parse_spec("c3,16,3,1,1 r2,32 fc16,10", False, True, 0.0)
    with pytest.raises(ValueError, match="expected one of"):
        parse_spec("c3,16,3,1,1 b2,32,16 fc16,10", False, True, 0.0)


def test_extended_stage_stride1_channel_change_uses_projection():
    # first ImageNet stage: 64 -> 256 at stride 1 (not expressible before)
    model = ResNet("c3,64,3,1,1 b2,256,64,1 ap32,1,0 fc256,10",
                   preact=False, use_proj=True, dropout_prob=0.0,
                   compute_dtype=jnp.float32)
    params, state = model.init(jax.random.key(0), (32, 32, 3))
    stack = model.spine.layers[1][1]
    b0 = stack.layers[0][1]
    assert b0.transforms_shortcut and b0.stride == 1
    assert "proj" in params["01_stack"]["block0"]
    b1 = stack.layers[1][1]
    assert not b1.transforms_shortcut
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    y, _ = model.apply(params, state, x, train=False)
    assert y.shape == (1, 10)
