"""Fused preact block-half kernel (ops/pallas/fused_block.py).

Value- and gradient-level parity of the fused Pallas path against the exact
XLA composite it replaces (BatchNorm batch-stats normalize -> ReLU ->
quantized dropout -> stride-1 3x3 SAME conv -> residual add -> next-BN
statistics), plus the ResidualBlock-level integration behind `fused_block`
(reference chain: residual_block.py:8-99 preact branch).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.models.blocks import ResidualBlock
from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
    dropout_thresh,
    fold_bn,
    fused_half,
    fused_half_reference,
)

B, H, W, C = 2, 8, 8, 32
N = B * H * W


def _inputs(rng_np, dtype):
    x = jnp.asarray(rng_np.normal(size=(C, N)), dtype)
    wts = jnp.asarray(rng_np.normal(size=(3, 3, C, C)) * (9 * C) ** -0.5,
                      jnp.float32)
    gamma = jnp.asarray(rng_np.normal(size=(C,)) * 0.1 + 1, jnp.float32)
    beta = jnp.asarray(rng_np.normal(size=(C,)) * 0.1, jnp.float32)
    mean = jnp.asarray(rng_np.normal(size=(C,)) * 0.1, jnp.float32)
    var = jnp.asarray(rng_np.uniform(0.5, 2, size=(C,)), jnp.float32)
    scale, shift = fold_bn(gamma, beta, mean, var)
    bits = jnp.asarray(rng_np.integers(0, 256, size=(C, N)), jnp.uint8)
    res = jnp.asarray(rng_np.normal(size=(C, N)), dtype)
    return x, wts, scale, shift, bits, res


@pytest.mark.parametrize("rate,use_res", [
    (0.0, False), (0.0, True), (0.3, False), (0.3, True)])
def test_forward_matches_reference_bf16_exact(rng_np, rate, use_res):
    x, wts, scale, shift, bits, res = _inputs(rng_np, jnp.bfloat16)
    bb = bits if rate > 0 else None
    rr = res if use_res else None
    y1, s1, q1 = fused_half(x, wts, scale, shift, bb, rr,
                            dropout_rate=rate, h=H, w_img=W, interpret=True)
    y2, s2, q2 = fused_half_reference(x, wts, scale, shift, bb, rr,
                                      dropout_rate=rate, h=H, w_img=W)
    # prologue/epilogue elementwise math is bit-identical; the conv's f32
    # accumulation over identical bf16 inputs matches lax.conv on CPU
    np.testing.assert_array_equal(np.asarray(y1, np.float32),
                                  np.asarray(y2, np.float32))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-3)


@pytest.mark.parametrize("rate,use_res", [
    (0.0, False), (0.0, True), (0.3, False), (0.3, True)])
def test_gradients_match_reference_f32(rng_np, rate, use_res):
    """In f32 the custom VJP must agree with autodiff of the reference
    composite to float roundoff — including the cotangents flowing in
    through the stats outputs (the next BN differentiating through its
    batch statistics)."""
    x, wts, scale, shift, bits, res = _inputs(rng_np, jnp.float32)
    bb = bits if rate > 0 else None
    rr = res if use_res else None

    def loss_with(fn, extra):
        def loss(x, wts, scale, shift):
            y, s, q = fn(x, wts, scale, shift, bb, rr,
                         dropout_rate=rate, h=H, w_img=W, **extra)
            mu = s / N
            v = q / N - mu ** 2
            return (jnp.sum(jnp.cos(y.astype(jnp.float32)) * 1.7)
                    + jnp.sum(jnp.sin(mu) * 3 + v * 0.5))
        return loss

    g1 = jax.grad(loss_with(fused_half, {"interpret": True}),
                  argnums=(0, 1, 2, 3))(x, wts, scale, shift)
    g2 = jax.grad(loss_with(fused_half_reference, {}),
                  argnums=(0, 1, 2, 3))(x, wts, scale, shift)
    for a, b in zip(g1, g2):
        af, bf = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.abs(af - bf).max() / (np.abs(bf).max() + 1e-9)
        assert rel < 1e-5, rel


@pytest.mark.parametrize("rate,use_res", [(0.0, False), (0.3, True)])
def test_no_stats_variant_matches(rng_np, rate, use_res):
    """want_stats=False (a block's LAST conv, whose epilogue stats nobody
    reads): same y, None stats, and gradients matching the reference when
    no cotangents flow through the stats outputs."""
    x, wts, scale, shift, bits, res = _inputs(rng_np, jnp.float32)
    bb = bits if rate > 0 else None
    rr = res if use_res else None
    y1, s1, q1 = fused_half(x, wts, scale, shift, bb, rr,
                            dropout_rate=rate, h=H, w_img=W,
                            want_stats=False, interpret=True)
    assert s1 is None and q1 is None
    y2, _, _ = fused_half_reference(x, wts, scale, shift, bb, rr,
                                    dropout_rate=rate, h=H, w_img=W)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)

    def loss_with(fn, extra):
        def loss(x, wts, scale, shift):
            y = fn(x, wts, scale, shift, bb, rr,
                   dropout_rate=rate, h=H, w_img=W, **extra)[0]
            return jnp.sum(jnp.cos(y) * 1.7)
        return loss

    g1 = jax.grad(loss_with(fused_half,
                            {"want_stats": False, "interpret": True}),
                  argnums=(0, 1, 2, 3))(x, wts, scale, shift)
    g2 = jax.grad(loss_with(fused_half_reference, {}),
                  argnums=(0, 1, 2, 3))(x, wts, scale, shift)
    for a, b in zip(g1, g2):
        af, bf = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.abs(af - bf).max() / (np.abs(bf).max() + 1e-9)
        assert rel < 1e-5, rel


def test_dropout_thresh_matches_layer_quantization():
    # layers.py Dropout: thresh = round(keep * 256)
    assert dropout_thresh(0.0) == 256
    assert dropout_thresh(0.3) == 179
    assert dropout_thresh(1.0) == 0


def _block_io(rng_np, c=C, b=B, h=H, w=W):
    x = jnp.asarray(rng_np.normal(size=(b, h, w, c)), jnp.bfloat16)
    return x


def _make_block(fused, dropout=0.0, preact=True, c=C):
    return ResidualBlock(
        channels=c, downsample=False, preact=preact, use_proj=False,
        dropout_prob=dropout, fused_block=fused)


def test_block_fused_matches_normal_no_dropout(rng_np):
    """With dropout off the fused and layer-by-layer paths compute the same
    function; outputs and BatchNorm EMA state must agree (conv accumulation
    order is the only difference)."""
    block_n = _make_block(False)
    block_f = _make_block(True)
    rng = jax.random.key(0)
    params, state, out_shape = block_n.init(rng, (H, W, C))
    x = _block_io(rng_np)

    y_n, st_n = block_n.apply(params, state, x, train=True, rng=None)
    y_f, st_f = block_f.apply(params, state, x, train=True, rng=None)
    assert y_f.shape == y_n.shape == (B,) + tuple(out_shape)
    np.testing.assert_allclose(np.asarray(y_f, np.float32),
                               np.asarray(y_n, np.float32),
                               atol=5e-2, rtol=0)
    for name in ("norm1", "norm2"):
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(st_f[name][k]), np.asarray(st_n[name][k]),
                atol=1e-3, err_msg=f"{name}.{k}")
        assert int(st_f[name]["count"]) == int(st_n[name]["count"]) == 1


@pytest.mark.slow
def test_block_fused_gradients_match_no_dropout(rng_np):
    block_n = _make_block(False)
    block_f = _make_block(True)
    rng = jax.random.key(0)
    params, state, _ = block_n.init(rng, (H, W, C))
    x = _block_io(rng_np)

    def loss(blk, p):
        y, _ = blk.apply(p, state, x, train=True, rng=None)
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    g_n = jax.grad(lambda p: loss(block_n, p))(params)
    g_f = jax.grad(lambda p: loss(block_f, p))(params)
    flat_n = jax.tree_util.tree_leaves_with_path(g_n)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_f))
    for path, leaf_n in flat_n:
        leaf_f = flat_f[path]
        an, af = np.asarray(leaf_n, np.float32), np.asarray(leaf_f, np.float32)
        denom = np.abs(an).max() + 1e-9
        assert np.abs(af - an).max() / denom < 5e-2, path


@pytest.mark.slow
def test_block_fused_with_dropout_runs_and_flows(rng_np):
    """Dropout bit streams legitimately differ between the paths (lane vs
    NHWC shapes); assert the fused path trains: finite output, correct
    inverted-dropout scaling in expectation, finite gradients."""
    block = _make_block(True, dropout=0.3)
    rng = jax.random.key(0)
    params, state, _ = block.init(rng, (H, W, C))
    x = _block_io(rng_np)
    y, st = block.apply(params, state, x, train=True,
                        rng=jax.random.key(7))
    assert bool(jnp.isfinite(y.astype(jnp.float32)).all())
    assert int(st["norm1"]["count"]) == 1

    g = jax.grad(lambda p: jnp.mean(jnp.square(
        block.apply(p, state, x, train=True, rng=jax.random.key(7))[0]
        .astype(jnp.float32))))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert bool(jnp.isfinite(leaf).all())


def test_block_fused_eval_uses_normal_path(rng_np):
    """Eval mode must be unaffected by the flag (bitwise)."""
    block_n = _make_block(False)
    block_f = _make_block(True)
    rng = jax.random.key(0)
    params, state, _ = block_n.init(rng, (H, W, C))
    x = _block_io(rng_np)
    y_n, _ = block_n.apply(params, state, x, train=False)
    y_f, _ = block_f.apply(params, state, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_n, np.float32),
                                  np.asarray(y_f, np.float32))


@pytest.mark.slow
def test_sequential_lane_hoisting_exact(rng_np):
    """Sequential's transpose hoisting (layers.py): a run of fused blocks
    executed in lane layout end-to-end must be EXACTLY the composition of
    the per-block fused applies (the hoisted path elides value-preserving
    transposes only — same kernels, same rng folding, same state)."""
    from pytorch_ddp_resnet_tpu.models.layers import Sequential

    blocks = tuple((f"block{i}", _make_block(True, dropout=0.3))
                   for i in range(3))
    seq = Sequential(blocks)
    rng = jax.random.key(0)
    params, state, _ = seq.init(rng, (H, W, C))
    x = _block_io(rng_np)
    drop_rng = jax.random.key(7)

    y_seq, st_seq = seq.apply(params, state, x, train=True, rng=drop_rng)

    # manual composition with Sequential's own per-index rng folding
    y_man, st_man = x, dict(state)
    for i, (name, blk) in enumerate(blocks):
        y_man, s = blk.apply(params[name], state[name], y_man, train=True,
                             rng=jax.random.fold_in(drop_rng, i))
        st_man[name] = s
    np.testing.assert_array_equal(np.asarray(y_seq, np.float32),
                                  np.asarray(y_man, np.float32))
    for name in st_man:
        for bn in st_man[name]:
            for k in ("mean", "var"):
                np.testing.assert_array_equal(
                    np.asarray(st_seq[name][bn][k]),
                    np.asarray(st_man[name][bn][k]))

    # a trailing non-lane layer forces clean exit from lane layout
    from pytorch_ddp_resnet_tpu.models.layers import ReLU

    seq2 = Sequential(blocks + (("relu", ReLU()),))
    y2, _ = seq2.apply(params, state, x, train=True, rng=drop_rng)
    np.testing.assert_array_equal(
        np.asarray(y2, np.float32),
        np.maximum(np.asarray(y_seq, np.float32), 0))


def test_block_fused_fallbacks(rng_np):
    """Ineligible geometries (non-preact, transforming shortcut, odd
    channel counts) silently take the layer-by-layer path."""
    rng = jax.random.key(0)
    # non-preact: bitwise same as flag-off
    for mk in (lambda f: _make_block(f, preact=False),
               lambda f: ResidualBlock(channels=C, downsample=True,
                                       preact=True, use_proj=True,
                                       dropout_prob=0.0, fused_block=f)):
        bn, bf = mk(False), mk(True)
        params, state, _ = bn.init(rng, (H, W, C))
        x = _block_io(rng_np)
        y_n, _ = bn.apply(params, state, x, train=True, rng=rng)
        y_f, _ = bf.apply(params, state, x, train=True, rng=rng)
        np.testing.assert_array_equal(np.asarray(y_n, np.float32),
                                      np.asarray(y_f, np.float32))
    # channels not tileable for uint8 bits (24 % 32 != 0) with dropout on
    blk = _make_block(True, dropout=0.3, c=48)
    assert not blk._fused_eligible((B, H, W, 48), True)
    assert blk._fused_eligible((B, H, W, 48), False) is False
