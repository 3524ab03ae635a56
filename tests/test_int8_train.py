"""Int8 quantization-aware training path (ops/pallas/fused_block.py
fused_half_int8 + models/blocks.py int8_train).

The fused lane path with an s8 x s8 -> s32 conv core (the v5e MXU's 2x int8
mode, tools/bench_int8_mxu.py): per-channel weight scales quantized per
step, per-TILE dynamic activation scales computed inside the kernel (the
conv is tile-local, so each tile's absmax is an exact scale — no carried
state), straight-through gradients (backward kernels at the unquantized
point). These tests run interpret mode on CPU: forward within quantization
tolerance of the float composite, gradients IDENTICAL to the bf16 fused
path (same backward kernels), block/model integration, and eligibility
gating.

Reference parity: none — the reference (lucaslingle/pytorch_ddp_resnet)
trains f32/AMP only; this is a beyond-reference performance capability on
the training axis, accuracy-gated by the full-length proxy runs
(ACCURACY.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.models.blocks import ResidualBlock
from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
    fold_bn,
    fused_half,
    fused_half_int8,
    fused_half_reference,
)

B, H, W, C = 2, 8, 8, 32
N = B * H * W


def _inputs(rng_np, dtype=jnp.float32):
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
    (0.0, False), (0.0, True), (0.3, True)])
def test_forward_close_to_float_reference(rng_np, rate, use_res):
    x, wts, scale, shift, bits, res = _inputs(rng_np)
    bb = bits if rate > 0 else None
    rr = res if use_res else None
    y1, s1, q1 = fused_half_int8(
        x, wts, scale, shift, bb, rr, dropout_rate=rate, h=H, w_img=W,
        interpret=True)
    y2, s2, q2 = fused_half_reference(x, wts, scale, shift, bb, rr,
                                      dropout_rate=rate, h=H, w_img=W)
    # per-channel w8 + per-tile a8: a few percent relative error
    yd = np.abs(np.asarray(y1, np.float32) - np.asarray(y2, np.float32))
    assert yd.max() / (np.abs(np.asarray(y2, np.float32)).max() + 1e-9) < 0.05
    sd = np.abs(np.asarray(s1) - np.asarray(s2))
    assert sd.max() / (np.abs(np.asarray(s2)).max() + 1e-9) < 0.05


def test_quantization_error_at_int8_grain(rng_np):
    """The error vs the float composite is genuine int8-grain noise —
    nonzero (the path really quantizes) but below a single-level bound."""
    x, wts, scale, shift, _, _ = _inputs(rng_np)
    y1, _, _ = fused_half_int8(x, wts, scale, shift, None, None,
                               dropout_rate=0.0, h=H, w_img=W,
                               interpret=True)
    y2, _, _ = fused_half_reference(x, wts, scale, shift, None, None,
                                    dropout_rate=0.0, h=H, w_img=W)
    diff = np.abs(np.asarray(y1, np.float32) - np.asarray(y2, np.float32))
    assert diff.max() > 0.0
    # crude per-conv error model: 9C taps each off by <= (a_scale/2 * |w|
    # + w_scale/2 * |a|); with unit-variance inputs this lands far below
    # |y|'s own scale
    assert diff.mean() < 0.05 * np.abs(np.asarray(y2, np.float32)).mean()


@pytest.mark.slow
@pytest.mark.parametrize("want_stats", [True, False])
def test_gradients_are_straight_through(rng_np, want_stats):
    """With a LINEAR loss in y (cotangent independent of the forward
    value), the int8 op's gradients must equal the bf16 fused op's
    EXACTLY: same backward kernels evaluated at the same unquantized
    point."""
    x, wts, scale, shift, bits, res = _inputs(rng_np)
    ct = jnp.asarray(np.asarray(
        jax.random.normal(jax.random.key(3), (C, N))), jnp.float32)

    def loss_with(fn):
        def loss(x, wts, scale, shift):
            out = fn(x, wts, scale, shift, bits, res,
                     dropout_rate=0.3, h=H, w_img=W,
                     want_stats=want_stats, interpret=True)
            return jnp.sum(out[0] * ct)
        return loss

    g_q = jax.grad(loss_with(fused_half_int8),
                   argnums=(0, 1, 2, 3))(x, wts, scale, shift)
    g_f = jax.grad(loss_with(fused_half),
                   argnums=(0, 1, 2, 3))(x, wts, scale, shift)
    for a, b in zip(g_q, g_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stats_cotangents_flow(rng_np):
    """A loss through the stats outputs (the next BN differentiating its
    batch statistics) stays finite and close to the float composite's
    gradient — the backward linearizes around the quantized y."""
    x, wts, scale, shift, _, _ = _inputs(rng_np)

    def loss_with(fn, extra):
        def loss(x, wts):
            y, s, q = fn(x, wts, scale, shift, None, None,
                         dropout_rate=0.0, h=H, w_img=W, **extra)
            mu = s / N
            v = q / N - mu ** 2
            return (jnp.sum(jnp.cos(y.astype(jnp.float32)) * 1.7)
                    + jnp.sum(jnp.sin(mu) * 3 + v * 0.5))
        return loss

    g_q = jax.grad(loss_with(fused_half_int8, {"interpret": True}),
                   argnums=(0, 1))(x, wts)
    g_f = jax.grad(loss_with(fused_half_reference, {}),
                   argnums=(0, 1))(x, wts)
    for a, b in zip(g_q, g_f):
        af, bf = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.isfinite(af).all()
        rel = np.abs(af - bf).max() / (np.abs(bf).max() + 1e-9)
        assert rel < 0.15, rel  # quantized y perturbs cos(y) cotangents


# --- fully-quantized backward (quant_bwd / int8_train_bwd) -------------------


@pytest.mark.parametrize("rate,use_res,want_stats", [
    (0.0, False, True), (0.0, True, False), (0.3, True, True)])
def test_quant_bwd_grads_close_to_float(rng_np, rate, use_res, want_stats):
    """FQT gradients (int8 dgrad + wgrad with per-tile dynamic scales)
    land within int8-grain tolerance of the float composite's gradients —
    close, NOT equal (the straight-through exactness test above is the
    quant_bwd=False contract)."""
    x, wts, scale, shift, bits, res = _inputs(rng_np)
    bb = bits if rate > 0 else None
    rr = res if use_res else None
    ct = jnp.asarray(np.asarray(
        jax.random.normal(jax.random.key(7), (C, N))), jnp.float32)

    def loss_with(fn, extra):
        def loss(x, wts, scale, shift):
            out = fn(x, wts, scale, shift, bb, rr, dropout_rate=rate,
                     h=H, w_img=W, want_stats=want_stats, **extra)
            y = out[0]
            val = jnp.sum(y.astype(jnp.float32) * ct)
            if want_stats:
                val = val + jnp.sum(out[1]) * 0.1 + jnp.sum(out[2]) * 0.01
            return val
        return loss

    g_q = jax.grad(
        loss_with(lambda *a, **k: fused_half_int8(*a, quant_bwd=True, **k),
                  {"interpret": True}),
        argnums=(0, 1, 2, 3))(x, wts, scale, shift)
    g_f = jax.grad(
        loss_with(lambda *a, want_stats, **k: fused_half_reference(*a, **k),
                  {}),
        argnums=(0, 1, 2, 3))(x, wts, scale, shift)
    for name, a, b in zip("x w scale shift".split(), g_q, g_f):
        af, bf = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.isfinite(af).all(), name
        rel = np.abs(af - bf).max() / (np.abs(bf).max() + 1e-9)
        assert rel < 0.05, (name, rel)
        # and the quantization is real: dgrad/wgrad go through int8
        if name in ("x", "w"):
            assert np.abs(af - bf).max() > 0.0, name


def test_quant_bwd_forward_identical_to_fwd_only(rng_np):
    """quant_bwd only changes the backward: the primal outputs are
    bit-identical to the fwd-only int8 path."""
    x, wts, scale, shift, _, res = _inputs(rng_np)
    kw = dict(dropout_rate=0.0, h=H, w_img=W, interpret=True)
    y1, s1, q1 = fused_half_int8(x, wts, scale, shift, None, res, **kw)
    y2, s2, q2 = fused_half_int8(x, wts, scale, shift, None, res,
                                 quant_bwd=True, **kw)
    np.testing.assert_array_equal(np.asarray(y1, np.float32),
                                  np.asarray(y2, np.float32))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))


# --- block-level integration -------------------------------------------------


def _make_block(int8, dropout=0.0, c=C):
    return ResidualBlock(
        channels=c, downsample=False, preact=True, use_proj=False,
        dropout_prob=dropout, int8_train=int8)


def test_block_int8_close_to_normal(rng_np):
    block_n = _make_block(False)
    block_q = _make_block(True)
    rng = jax.random.key(0)
    params, state, _ = block_n.init(rng, (H, W, C))
    state_q = block_q.init(rng, (H, W, C))[1]
    # int8_train carries NO extra state (per-tile scales are stateless)
    assert jax.tree_util.tree_structure(
        state) == jax.tree_util.tree_structure(state_q)

    x = jnp.asarray(rng_np.normal(size=(B, H, W, C)), jnp.bfloat16)
    y_n, st_n = block_n.apply(params, state, x, train=True, rng=None)
    y_q, st_q = block_q.apply(params, state, x, train=True, rng=None)
    an, aq = np.asarray(y_n, np.float32), np.asarray(y_q, np.float32)
    assert np.abs(aq - an).max() / (np.abs(an).max() + 1e-9) < 0.1
    # BN EMA state follows the quantized stats — close, not equal
    for name in ("norm1", "norm2"):
        np.testing.assert_allclose(
            np.asarray(st_q[name]["mean"]), np.asarray(st_n[name]["mean"]),
            atol=5e-2)
        assert int(st_q[name]["count"]) == 1


def test_block_int8_eval_uses_normal_path(rng_np):
    block_n = _make_block(False)
    block_q = _make_block(True)
    rng = jax.random.key(0)
    params, state, _ = block_n.init(rng, (H, W, C))
    x = jnp.asarray(rng_np.normal(size=(B, H, W, C)), jnp.bfloat16)
    y_n, _ = block_n.apply(params, state, x, train=False)
    y_q, _ = block_q.apply(params, state, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_n, np.float32),
                                  np.asarray(y_q, np.float32))


def test_int8_skips_spatial_crossover_gate():
    """int8_train fuses even below the bf16 path's h*w >= 2c crossover
    (the int8 win is the conv core, not epilogue bytes)."""
    blk_f = ResidualBlock(channels=C, downsample=False, preact=True,
                          use_proj=False, dropout_prob=0.0, fused_block=True)
    blk_q = _make_block(True)
    shape = (8, 4, 4, C)  # h*w = 16 < 2c = 64
    assert not blk_f._fused_eligible(shape, True)
    assert blk_q._fused_eligible(shape, True)
    # both reject eval mode and non-tileable widths
    assert not blk_q._fused_eligible(shape, False)
    blk_odd = _make_block(True, c=24)
    assert not blk_odd._fused_eligible((8, 4, 4, 24), True)


@pytest.mark.slow
def test_model_int8_train_step(rng_np):
    """End-to-end: a small preact ResNet with use_int8_train trains one
    step — finite loss/grads, loss close to the float model's."""
    from pytorch_ddp_resnet_tpu.models import ResNet

    kw = dict(preact=True, use_proj=False, dropout_prob=0.3,
              compute_dtype=jnp.bfloat16)
    spec = "c3,32,3,1,1 r2 n a ap8,1,0 fc32,10"
    model_q = ResNet(spec, int8_train=True, **kw)
    model_n = ResNet(spec, **kw)
    params, state = model_q.init(jax.random.PRNGKey(0), (8, 8, 3))
    x = jnp.asarray(rng_np.normal(size=(8, 8, 8, 3)), jnp.float32)
    y = jnp.asarray(rng_np.integers(0, 10, size=(8,)), jnp.int32)

    def loss_fn(model, p):
        logits, new_state = model.apply(p, state, x, train=True,
                                        rng=jax.random.key(1))
        one_hot = jax.nn.one_hot(y, 10)
        loss = -jnp.mean(jnp.sum(
            jax.nn.log_softmax(logits) * one_hot, axis=-1))
        return loss, new_state

    (loss_q, _), grads = jax.value_and_grad(
        lambda p: loss_fn(model_q, p), has_aux=True)(params)
    loss_n, _ = loss_fn(model_n, params)
    assert bool(jnp.isfinite(loss_q))
    assert abs(float(loss_q) - float(loss_n)) < 0.1
    for leaf in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.isfinite(leaf).all())


@pytest.mark.slow
def test_model_int8_bwd_train_step(rng_np):
    """Fully-quantized training end-to-end: int8_train_bwd grads are
    finite and close to the fwd-only QAT grads (same forward, int8-grain
    backward)."""
    from pytorch_ddp_resnet_tpu.models import ResNet

    kw = dict(preact=True, use_proj=False, dropout_prob=0.0,
              compute_dtype=jnp.bfloat16)
    spec = "c3,32,3,1,1 r2 n a ap8,1,0 fc32,10"
    model_fq = ResNet(spec, int8_train=True, int8_train_bwd=True, **kw)
    model_q = ResNet(spec, int8_train=True, **kw)
    params, state = model_fq.init(jax.random.PRNGKey(0), (8, 8, 3))
    x = jnp.asarray(rng_np.normal(size=(8, 8, 8, 3)), jnp.float32)
    y = jnp.asarray(rng_np.integers(0, 10, size=(8,)), jnp.int32)

    def loss_fn(model, p):
        logits, _ = model.apply(p, state, x, train=True,
                                rng=jax.random.key(1))
        one_hot = jax.nn.one_hot(y, 10)
        return -jnp.mean(jnp.sum(
            jax.nn.log_softmax(logits) * one_hot, axis=-1))

    (loss_fq, g_fq) = jax.value_and_grad(
        lambda p: loss_fn(model_fq, p))(params)
    (loss_q, g_q) = jax.value_and_grad(
        lambda p: loss_fn(model_q, p))(params)
    assert float(loss_fq) == float(loss_q)  # identical forward
    leaves_fq = jax.tree_util.tree_leaves(g_fq)
    leaves_q = jax.tree_util.tree_leaves(g_q)
    glob = np.sqrt(sum(
        float(np.square(np.asarray(b, np.float32)).sum()) for b in leaves_q))
    some_differ = False
    for a, b in zip(leaves_fq, leaves_q):
        af, bf = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.isfinite(af).all()
        # per-leaf relative L2 error with an absolute floor: leaves whose
        # true gradient is a vanishing fraction of the global norm (e.g. a
        # deep BN beta at init) see int8-grain noise dominate the RELATIVE
        # metric while staying irrelevant to the SGD step
        num = np.linalg.norm((af - bf).ravel())
        den = np.linalg.norm(bf.ravel())
        assert num < max(0.1 * den, 1e-3 * glob), (num, den, glob)
        some_differ = some_differ or np.abs(af - bf).max() > 0
    assert some_differ  # the int8 backward really engaged
    # and the full update direction is preserved
    num_g = np.sqrt(sum(
        float(np.square(np.asarray(a, np.float32)
                        - np.asarray(b, np.float32)).sum())
        for a, b in zip(leaves_fq, leaves_q)))
    assert num_g / glob < 0.05, num_g / glob


# --- stage-transition blocks (int8 conv2 via the lane-entry protocol) --------


def _trans_blocks(c=32, use_proj=True, **kw):
    mk = lambda **more: ResidualBlock(
        channels=c, downsample=True, preact=True, use_proj=use_proj,
        dropout_prob=0.0, compute_dtype=jnp.float32, **more)
    return mk(int8_train=True, int8_train_bwd=True, **kw), mk()


@pytest.mark.parametrize("use_proj", [True, False])
def test_transition_block_int8_close_to_normal(rng_np, use_proj):
    """A downsample block with int8_train runs conv2 on the int8 path
    (norm2+relu+conv2+residual in one fused_half_int8, the shortcut —
    1x1 projection or option-A zero-pad — riding its epilogue) —
    outputs and BN EMA state within int8-grain of the standard path."""
    bq, bn = _trans_blocks(use_proj=use_proj)
    params, state, _ = bn.init(jax.random.key(0), (8, 8, 32))
    assert bq.lane_entry_eligible((16, 8, 8, 32), True)
    assert not bn.lane_entry_eligible((16, 8, 8, 32), True)  # int8 off
    assert not bq.lane_entry_eligible((16, 8, 8, 32), False)  # eval
    x = jnp.asarray(rng_np.normal(size=(16, 8, 8, 32)), jnp.float32)
    y_n, st_n = bn.apply(params, state, x, train=True, rng=jax.random.key(1))
    y_q, st_q = bq.apply(params, state, x, train=True, rng=jax.random.key(1))
    an, aq = np.asarray(y_n, np.float32), np.asarray(y_q, np.float32)
    assert aq.shape == an.shape == (16, 4, 4, 64)
    assert np.abs(aq - an).max() / (np.abs(an).max() + 1e-9) < 0.05
    assert np.abs(aq - an).max() > 0  # the int8 path really engaged
    for name in ("norm1", "norm2"):
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(st_q[name][k]), np.asarray(st_n[name][k]),
                atol=1e-3)


@pytest.mark.slow
def test_transition_block_int8_grads_close(rng_np):
    bq, bn = _trans_blocks()
    params, state, _ = bn.init(jax.random.key(0), (8, 8, 32))
    x = jnp.asarray(rng_np.normal(size=(16, 8, 8, 32)), jnp.float32)

    def loss_of(block):
        def f(p):
            y, _ = block.apply(p, state, x, train=True,
                               rng=jax.random.key(1))
            return jnp.sum(jnp.square(y.astype(jnp.float32)))
        return f

    g_q = jax.grad(loss_of(bq))(params)
    g_n = jax.grad(loss_of(bn))(params)
    leaves_n = jax.tree_util.tree_leaves(g_n)
    glob = np.sqrt(sum(float(np.square(np.asarray(b, np.float32)).sum())
                       for b in leaves_n))
    for a, b in zip(jax.tree_util.tree_leaves(g_q), leaves_n):
        af, bf = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.isfinite(af).all()
        num = np.linalg.norm(af - bf)
        assert num < max(0.1 * np.linalg.norm(bf), 2e-2 * glob), af.shape


def test_transition_block_eval_uses_normal_path(rng_np):
    bq, bn = _trans_blocks()
    params, state, _ = bn.init(jax.random.key(0), (8, 8, 32))
    x = jnp.asarray(rng_np.normal(size=(16, 8, 8, 32)), jnp.float32)
    y_n, _ = bn.apply(params, state, x, train=False)
    y_q, _ = bq.apply(params, state, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_n, np.float32),
                                  np.asarray(y_q, np.float32))


@pytest.mark.slow
def test_transition_lane_entry_threads_through_sequential(rng_np):
    """In a multi-stage model, the transition block consumes NHWC and
    emits LANE layout (Sequential lane-entry branch): end-to-end training
    step stays finite and close to the non-quantized model."""
    from pytorch_ddp_resnet_tpu.models import ResNet

    kw = dict(preact=True, use_proj=True, dropout_prob=0.3,
              compute_dtype=jnp.bfloat16)
    spec = "c3,32,3,1,1 r2 r2 n a ap4,1,0 fc64,10"
    mq = ResNet(spec, int8_train=True, int8_train_bwd=True, **kw)
    mn = ResNet(spec, **kw)
    params, state = mq.init(jax.random.PRNGKey(0), (8, 8, 3))
    x = jnp.asarray(rng_np.normal(size=(16, 8, 8, 3)), jnp.float32)
    y = jnp.asarray(rng_np.integers(0, 10, size=(16,)), jnp.int32)

    def loss_fn(model, p):
        logits, ns = model.apply(p, state, x, train=True,
                                 rng=jax.random.key(1))
        one_hot = jax.nn.one_hot(y, 10)
        return -jnp.mean(jnp.sum(
            jax.nn.log_softmax(logits) * one_hot, axis=-1)), ns

    (loss_q, _), grads = jax.value_and_grad(
        lambda p: loss_fn(mq, p), has_aux=True)(params)
    loss_n, _ = loss_fn(mn, params)
    assert bool(jnp.isfinite(loss_q))
    assert abs(float(loss_q) - float(loss_n)) < 0.15  # dropout streams differ
    for leaf in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.isfinite(leaf).all())


@pytest.mark.slow
def test_transition_int8_with_remat(rng_np):
    """remat=True wraps apply_to_lane in jax.checkpoint — the static
    shape tuple must survive and the grads stay finite."""
    from pytorch_ddp_resnet_tpu.models import ResNet

    m = ResNet("c3,32,3,1,1 r2 r2 n a ap4,1,0 fc64,10", int8_train=True,
               int8_train_bwd=True, preact=True, use_proj=True,
               dropout_prob=0.3, compute_dtype=jnp.bfloat16, remat=True)
    p, s = m.init(jax.random.PRNGKey(0), (8, 8, 3))
    x = jnp.asarray(rng_np.normal(size=(16, 8, 8, 3)), jnp.float32)
    y = jnp.asarray(rng_np.integers(0, 10, size=(16,)), jnp.int32)

    def lf(p):
        logits, _ = m.apply(p, s, x, train=True, rng=jax.random.key(1))
        oh = jax.nn.one_hot(y, 10)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

    l, g = jax.value_and_grad(lf)(p)
    assert bool(jnp.isfinite(l))
    assert all(bool(jnp.isfinite(t).all())
               for t in jax.tree_util.tree_leaves(g))
