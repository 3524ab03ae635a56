"""Tests for ops/pallas/bneck.py — the fused int8 bottleneck-block kernel.

The mirror here is deliberately INDEPENDENT of the kernel's padded-flat
construction: it computes the 3x3 taps on an explicit [rows, stride] 2-D
view with out-of-range reads as literal zeros, so bit-equality validates
the kernel's flat-shift tap offsets, its zero-pad edge handling, and its
single a1 mask all at once. Block-level closeness is checked against
models/blocks.py BottleneckResidualBlock.apply(train=False) (reference
semantics: residual_block.py:102-215)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.models.blocks import BottleneckResidualBlock
from pytorch_ddp_resnet_tpu.models.quantize import (
    _bn_eval_affine,
    quantize_conv_weights,
)
from pytorch_ddp_resnet_tpu.ops.pallas.bneck import (
    bneck_block_int8,
    flat_geometry,
    fold_block_scales,
    pack_w2,
    pad_flat,
    quantize_pad_flat,
    unpad_flat,
)


def assert_quant_equal(got, want, tie_frac=5e-4):
    """Bit-equality up to a tiny budget of requant tie flips: XLA's FMA
    contraction shifts acc*p+q by <=1 ULP, which can tip round() at a
    .5 tie; each flip moves one int8 step through the remaining chain.
    Budget 0.05% still catches any indexing bug (an off-by-one tap
    corrupts whole edge rows, percent-level)."""
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    frac = float((g != w).mean())
    assert frac <= tie_frac, f"{frac:.2%} of elements differ"


def _mirror_block(q_in, w1q, w2q, w3q, p1, q1, p2, q2, p3, q3, r,
                  h, w, emit_int8):
    """Pure-numpy mirror on the 2-D view; returns the padded-flat output
    with image positions exact and pad positions ZERO (the kernel leaves
    garbage there — compare through unpad_flat or a zero-pad mask)."""
    n, m, cin = q_in.shape
    rows, stride, _ = flat_geometry(h, w)
    wdt = w1q.shape[1]
    q2d = np.asarray(q_in, np.int32).reshape(n, rows, stride, cin)

    def rq(acc, p, q):
        y = np.maximum(acc.astype(np.float32) * p + q, 0.0)
        return np.clip(np.round(y), -127, 127).astype(np.int32)

    acc1 = np.einsum("nyxc,cw->nyxw", q2d, np.asarray(w1q, np.int32))
    a1 = rq(acc1, np.asarray(p1), np.asarray(q1))
    # zero outside the image (the kernel's one mask)
    img = np.zeros((rows, stride), bool)
    img[1:1 + h, 1:1 + w] = True
    a1 = np.where(img[None, :, :, None], a1, 0)

    acc2 = np.zeros((n, rows, stride, wdt), np.int64)
    w2 = np.asarray(w2q, np.int64)
    for dy in range(3):
        for dx in range(3):
            sh = np.zeros_like(a1)
            ys = slice(max(0, 1 - dy), min(rows, rows + 1 - dy))
            xs = slice(max(0, 1 - dx), min(stride, stride + 1 - dx))
            src_y = slice(ys.start + dy - 1, ys.stop + dy - 1)
            src_x = slice(xs.start + dx - 1, xs.stop + dx - 1)
            sh[:, ys, xs, :] = a1[:, src_y, src_x, :]
            acc2 += np.einsum("nyxi,io->nyxo", sh.astype(np.int64),
                              w2[dy * 3 + dx])
    a2 = rq(acc2, np.asarray(p2), np.asarray(q2))

    acc3 = np.einsum("nyxi,io->nyxo", a2.astype(np.int64),
                     np.asarray(w3q, np.int64))
    y = acc3.astype(np.float32) * np.asarray(p3) + np.asarray(q3)
    y = np.maximum(q2d.astype(np.float32) * np.float32(r) + y, 0.0)
    if emit_int8:
        out = np.clip(np.round(y), -127, 127).astype(np.int8)
    else:
        out = jnp.asarray(y, jnp.bfloat16)
    out = np.asarray(out) * img[None, :, :, None].astype(out.dtype if
                                                         emit_int8 else np.float32).astype(np.asarray(out).dtype)
    return np.asarray(out).reshape(n, m, -1)


def _rand_block_operands(rng, h, w, cin, wdt, n=2):
    rows, stride, m = flat_geometry(h, w)
    q_in = rng.integers(-127, 128, (n, m, cin)).astype(np.int8)
    # zero the pad slots the way a real carrier arrives at run entry
    img = np.zeros((rows, stride), bool)
    img[1:1 + h, 1:1 + w] = True
    q_in = (q_in.reshape(n, rows, stride, cin)
            * img[None, :, :, None]).reshape(n, m, cin).astype(np.int8)
    w1q = rng.integers(-127, 128, (cin, wdt)).astype(np.int8)
    w2q = rng.integers(-127, 128, (9, wdt, wdt)).astype(np.int8)
    w3q = rng.integers(-127, 128, (wdt, cin)).astype(np.int8)
    sc = lambda k: rng.uniform(1e-4, 3e-3, (k,)).astype(np.float32)
    off = lambda k: rng.uniform(-2.0, 2.0, (k,)).astype(np.float32)
    return q_in, w1q, w2q, w3q, sc(wdt), off(wdt), sc(wdt), off(wdt), \
        sc(cin), off(cin), 0.37


def test_flat_geometry_and_roundtrip():
    for h, w in [(56, 56), (28, 28), (14, 14), (7, 7), (5, 6)]:
        rows, stride, m = flat_geometry(h, w)
        assert stride >= w + 2 and stride & (stride - 1) == 0
        assert rows >= h + 2 and m == rows * stride and m % 32 == 0
        x = jnp.arange(2 * h * w * 3, dtype=jnp.float32).reshape(2, h, w, 3)
        assert (unpad_flat(pad_flat(x), h, w) == x).all()


@pytest.mark.parametrize("h,w,cin,wdt", [(6, 5, 16, 8), (14, 14, 32, 16)])
@pytest.mark.parametrize("emit_int8", [True, False])
@pytest.mark.parametrize("conv2_impl", ["grouped3", "dots9"])
def test_kernel_matches_2d_mirror(h, w, cin, wdt, emit_int8, conv2_impl):
    rng = np.random.default_rng(0)
    ops = _rand_block_operands(rng, h, w, cin, wdt)
    got = bneck_block_int8(*[jnp.asarray(o) for o in ops[:-1]], ops[-1],
                           h=h, w=w,
                           out_mode="flat_int8" if emit_int8 else "flat_bf16",
                           conv2_impl=conv2_impl, interpret=True)
    want = _mirror_block(*ops, h=h, w=w, emit_int8=emit_int8)
    g = np.asarray(unpad_flat(jnp.asarray(got), h, w))
    m = np.asarray(unpad_flat(jnp.asarray(want), h, w))
    assert_quant_equal(g, m)


def test_chained_blocks_contain_pad_garbage():
    """Two kernels chained carrier-to-carrier: block 2's image outputs
    must be independent of block 1's pad-slot garbage (the mirror feeds
    block 2 a ZERO-padded carrier; the kernel feeds it its own raw
    output)."""
    h, w, cin, wdt = (6, 5, 16, 8)
    rng = np.random.default_rng(1)
    ops1 = _rand_block_operands(rng, h, w, cin, wdt)
    ops2 = _rand_block_operands(rng, h, w, cin, wdt)
    j = lambda ops: [jnp.asarray(o) for o in ops[:-1]] + [ops[-1]]
    k1 = bneck_block_int8(*j(ops1), h=h, w=w, interpret=True)
    k2 = bneck_block_int8(k1, *j(ops2)[1:], h=h, w=w, interpret=True)
    m1 = _mirror_block(*ops1, h=h, w=w, emit_int8=True)
    m2 = _mirror_block(m1, *ops2[1:], h=h, w=w, emit_int8=True)
    np.testing.assert_array_equal(
        np.asarray(unpad_flat(k2, h, w)),
        np.asarray(unpad_flat(jnp.asarray(m2), h, w)))


def _calibrated_kernel_forward(block, params, state, x, emit_int8):
    """Calibrate per-tensor scales from the float intermediates, fold,
    and run the kernel — the same recipe models/quantize.py uses."""
    sub = {n: layer for n, layer, _ in block._sublayers()}
    p, s = params, state
    i1, t1 = _bn_eval_affine(sub["norm1"], p["norm1"], s["norm1"])
    i2, t2 = _bn_eval_affine(sub["norm2"], p["norm2"], s["norm2"])
    i3, t3 = _bn_eval_affine(sub["norm3"], p["norm3"], s["norm3"])
    xf = jnp.asarray(x, jnp.float32)
    w1, w2, w3 = (jnp.asarray(p[c]["w"], jnp.float32)
                  for c in ("conv1", "conv2", "conv3"))
    conv = lambda a, wt: jax.lax.conv_general_dilated(
        a, wt, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    a1 = jnp.maximum(conv(xf, w1) * i1 + t1, 0.0)
    a2 = jnp.maximum(conv(a1, w2) * i2 + t2, 0.0)
    absmax = lambda a: max(float(jnp.max(jnp.abs(a))), 1e-12) / 127.0
    s_in, s2, s3 = absmax(xf), absmax(a1), absmax(a2)

    w1q, w1s = quantize_conv_weights(p["conv1"]["w"])
    w2q, w2s = quantize_conv_weights(p["conv2"]["w"])
    w3q, w3s = quantize_conv_weights(p["conv3"]["w"])
    folded = fold_block_scales(s_in, s2, s3, 1.0, w1s, i1, t1,
                               w2s, i2, t2, w3s, i3, t3)
    n, h, w_img, c = x.shape
    # the production entry/exit: NHWC in (quantize+pack in-kernel),
    # NHWC bf16 out (unpad in-kernel)
    out = bneck_block_int8(
        xf, w1q.reshape(c, -1), pack_w2(w2q),
        w3q.reshape(-1, c), *folded, s_in, h=h, w=w_img,
        in_mode="nhwc", out_mode="nhwc_bf16", interpret=True)
    assert not emit_int8
    return out.astype(jnp.float32)


def test_block_level_close_to_float():
    """Kernel output tracks the float BottleneckResidualBlock within
    int8 quantization noise (same tolerance family as
    test_quantize.test_int8_serving_close_to_float)."""
    c = 32
    block = BottleneckResidualBlock(
        channels=c, downsample=False, preact=False, use_proj=False,
        dropout_prob=0.0, compute_dtype=jnp.float32)
    params, state, _ = block.init(jax.random.PRNGKey(0), (10, 10, c))
    # non-trivial BN running stats so the eval affines matter
    for k in ("norm1", "norm2", "norm3"):
        n = state[k]["mean"].shape[0]
        key = jax.random.PRNGKey(hash(k) % 2**31)
        state[k]["mean"] = 0.3 * jax.random.normal(key, (n,))
        state[k]["var"] = jnp.exp(
            0.3 * jax.random.normal(jax.random.fold_in(key, 1), (n,)))
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 10, 10, c),
                          jnp.float32)
    ref, _ = block.apply(params, state, x, train=False)
    got = _calibrated_kernel_forward(block, params, state, x,
                                     emit_int8=False)
    ref = jnp.asarray(ref, jnp.float32)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) < 0.06 * scale + 0.05


def test_entry_exit_modes_match_flat_path():
    """in_mode="nhwc" / out_mode="nhwc_bf16" are bit-identical to the
    XLA-side quantize_pad_flat entry + flat kernel + unpad_flat exit."""
    h, w, cin, wdt = (6, 5, 16, 8)
    rng = np.random.default_rng(3)
    ops = _rand_block_operands(rng, h, w, cin, wdt)
    _, w1q, w2q, w3q, p1, q1, p2, q2, p3, q3, r = ops
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, cin)), jnp.float32)
    s_in = 0.02
    rest = [jnp.asarray(o) for o in (w1q, w2q, w3q, p1, q1, p2, q2, p3, q3)]
    q_in = quantize_pad_flat(x, s_in)
    want_flat = bneck_block_int8(q_in, *rest, r, h=h, w=w,
                                 out_mode="flat_bf16", interpret=True)
    want = unpad_flat(want_flat, h, w)
    got = bneck_block_int8(x, *rest, r, s_in, h=h, w=w, in_mode="nhwc",
                           out_mode="nhwc_bf16", interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))
    # int8-out equivalence too (mid-run carrier from an nhwc entry)
    want_q = bneck_block_int8(q_in, *rest, r, h=h, w=w, interpret=True)
    got_q = bneck_block_int8(x, *rest, r, s_in, h=h, w=w, in_mode="nhwc",
                             out_mode="flat_int8", interpret=True)
    np.testing.assert_array_equal(np.asarray(got_q), np.asarray(want_q))
