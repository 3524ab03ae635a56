"""Int8 quantization-aware training path (ops/pallas/fused_block.py
fused_half_int8 + models/blocks.py int8_train).

The fused lane path with an s8 x s8 -> s32 conv core (the v5e MXU's 2x int8
mode, tools/bench_int8_mxu.py), per-channel weight scales quantized per
step, per-tensor delayed activation scales carried in block state, and
straight-through gradients (backward kernels at the unquantized point).
These tests run interpret mode on CPU: forward within quantization
tolerance of the float composite, amax bookkeeping exact, gradients
IDENTICAL to the bf16 fused path (same backward kernels), block/state
integration, and eligibility gating.

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


def _true_amax(x, scale, shift, bits, rate):
    """absmax of the conv input (prologue output) in f32."""
    d = jnp.maximum(x.astype(jnp.float32) * scale[:, None] + shift[:, None],
                    0.0)
    if rate > 0:
        thresh = int(round((1 - rate) * 256))
        d = jnp.where(bits.astype(jnp.int32) < thresh, d / (thresh / 256.0),
                      jnp.zeros_like(d))
    return float(jnp.max(jnp.abs(d)))


@pytest.mark.parametrize("rate,use_res", [
    (0.0, False), (0.0, True), (0.3, True)])
def test_forward_close_to_float_reference(rng_np, rate, use_res):
    x, wts, scale, shift, bits, res = _inputs(rng_np)
    bb = bits if rate > 0 else None
    rr = res if use_res else None
    amax0 = _true_amax(x, scale, shift, bits, rate)
    sa = jnp.float32(amax0 / 127.0)
    y1, s1, q1, amax = fused_half_int8(
        x, wts, scale, shift, sa, bb, rr, dropout_rate=rate, h=H, w_img=W,
        interpret=True)
    y2, s2, q2 = fused_half_reference(x, wts, scale, shift, bb, rr,
                                      dropout_rate=rate, h=H, w_img=W)
    # per-channel w8 + per-tensor a8: a few percent relative error
    yd = np.abs(np.asarray(y1, np.float32) - np.asarray(y2, np.float32))
    assert yd.max() / (np.abs(np.asarray(y2, np.float32)).max() + 1e-9) < 0.05
    sd = np.abs(np.asarray(s1) - np.asarray(s2))
    assert sd.max() / (np.abs(np.asarray(s2)).max() + 1e-9) < 0.05
    # amax output is the true conv-input absmax (delayed-scale bookkeeping)
    np.testing.assert_allclose(float(amax), amax0, rtol=1e-5)


def test_saturating_out_of_range_scale(rng_np):
    """A stale (too-small) delayed scale saturates at +-127 instead of
    exploding — values stay finite and bounded."""
    x, wts, scale, shift, _, _ = _inputs(rng_np)
    sa = jnp.float32(1e-4)  # absurdly small: everything clips
    y, _, _, amax = fused_half_int8(
        x, wts, scale, shift, sa, None, None, dropout_rate=0.0, h=H,
        w_img=W, interpret=True)
    yf = np.asarray(y, np.float32)
    assert np.isfinite(yf).all()
    # output bounded by |w| * 9C * 127 * sa * wscale — far below the
    # unclipped conv's magnitude; just assert the clip actually engaged
    y_ref, _, _ = fused_half_reference(x, wts, scale, shift, None, None,
                                       dropout_rate=0.0, h=H, w_img=W)
    assert np.abs(yf).max() < np.abs(np.asarray(y_ref, np.float32)).max()
    assert float(amax) > 1e-2  # true amax still reported for recovery


@pytest.mark.parametrize("want_stats", [True, False])
def test_gradients_are_straight_through(rng_np, want_stats):
    """With a LINEAR loss in y (cotangent independent of the forward
    value), the int8 op's gradients must equal the bf16 fused op's
    EXACTLY: same backward kernels evaluated at the same unquantized
    point."""
    x, wts, scale, shift, bits, res = _inputs(rng_np)
    sa = jnp.float32(_true_amax(x, scale, shift, bits, 0.3) / 127.0)
    ct = jnp.asarray(np.asarray(
        jax.random.normal(jax.random.key(3), (C, N))), jnp.float32)

    def loss_q(x, wts, scale, shift):
        out = fused_half_int8(x, wts, scale, shift, sa, bits, res,
                              dropout_rate=0.3, h=H, w_img=W,
                              want_stats=want_stats, interpret=True)
        return jnp.sum(out[0] * ct)

    def loss_f(x, wts, scale, shift):
        out = fused_half(x, wts, scale, shift, bits, res,
                         dropout_rate=0.3, h=H, w_img=W,
                         want_stats=want_stats, interpret=True)
        y = out[0] if isinstance(out, tuple) else out
        return jnp.sum(y * ct)

    g_q = jax.grad(loss_q, argnums=(0, 1, 2, 3))(x, wts, scale, shift)
    g_f = jax.grad(loss_f, argnums=(0, 1, 2, 3))(x, wts, scale, shift)
    for a, b in zip(g_q, g_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sa_receives_zero_cotangent(rng_np):
    x, wts, scale, shift, _, _ = _inputs(rng_np)
    sa = jnp.float32(0.05)

    def loss(sa):
        y, _, _, _ = fused_half_int8(x, wts, scale, shift, sa, None, None,
                                     dropout_rate=0.0, h=H, w_img=W,
                                     interpret=True)
        return jnp.sum(y.astype(jnp.float32))

    assert float(jax.grad(loss)(sa)) == 0.0


# --- block-level integration -------------------------------------------------


def _make_block(int8, dropout=0.0, c=C):
    return ResidualBlock(
        channels=c, downsample=False, preact=True, use_proj=False,
        dropout_prob=dropout, int8_train=int8)


def test_block_int8_close_to_normal_and_updates_amax(rng_np):
    block_n = _make_block(False)
    block_q = _make_block(True)
    rng = jax.random.key(0)
    params, state_n, _ = block_n.init(rng, (H, W, C))
    _, state_q, _ = block_q.init(rng, (H, W, C))
    # int8 blocks carry delayed-scale state the float block lacks
    assert set(state_q) - set(state_n) == {"conv1", "conv2"}
    assert float(state_q["conv1"]["amax"]) == 8.0

    x = jnp.asarray(rng_np.normal(size=(B, H, W, C)), jnp.bfloat16)
    y_n, _ = block_n.apply(params, state_n, x, train=True, rng=None)
    y_q, st_q = block_q.apply(params, state_q, x, train=True, rng=None)
    an, aq = np.asarray(y_n, np.float32), np.asarray(y_q, np.float32)
    assert np.abs(aq - an).max() / (np.abs(an).max() + 1e-9) < 0.1
    # amax state refreshed: running max of (measured, 0.95 * old)
    for cname in ("conv1", "conv2"):
        new = float(st_q[cname]["amax"])
        assert new >= 0.95 * 8.0 - 1e-6
        assert new != 8.0
    # second step with the refreshed state stays close
    y_q2, st_q2 = block_q.apply(params, st_q, x, train=True, rng=None)
    aq2 = np.asarray(y_q2, np.float32)
    assert np.abs(aq2 - an).max() / (np.abs(an).max() + 1e-9) < 0.1
    # measured amax below the decayed floor: decays by exactly 0.95
    assert float(st_q2["conv1"]["amax"]) <= float(st_q["conv1"]["amax"])


def test_block_int8_eval_uses_normal_path(rng_np):
    block_n = _make_block(False)
    block_q = _make_block(True)
    rng = jax.random.key(0)
    params, _, _ = block_n.init(rng, (H, W, C))
    _, state_q, _ = block_q.init(rng, (H, W, C))
    x = jnp.asarray(rng_np.normal(size=(B, H, W, C)), jnp.bfloat16)
    y_n, _ = block_n.apply(params, {k: v for k, v in state_q.items()
                                    if k not in ("conv1", "conv2")},
                           x, train=False)
    y_q, _ = block_q.apply(params, state_q, x, train=False)
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


def test_model_int8_train_step(rng_np):
    """End-to-end: a small preact ResNet with use_int8_train trains one
    SGD step — finite loss/grads, amax state threaded through the model
    pytree."""
    from pytorch_ddp_resnet_tpu.models import ResNet

    model = ResNet("c3,32,3,1,1 r2 n a ap8,1,0 fc32,10",
                   preact=True, use_proj=False, dropout_prob=0.3,
                   compute_dtype=jnp.bfloat16, int8_train=True)
    params, state = model.init(jax.random.PRNGKey(0), (8, 8, 3))
    assert "amax" in state["01_stack"]["block0"]["conv1"]
    x = jnp.asarray(rng_np.normal(size=(8, 8, 8, 3)), jnp.float32)
    y = jnp.asarray(rng_np.integers(0, 10, size=(8,)), jnp.int32)

    def loss_fn(p):
        logits, new_state = model.apply(p, state, x, train=True,
                                        rng=jax.random.key(1))
        one_hot = jax.nn.one_hot(y, 10)
        loss = -jnp.mean(jnp.sum(
            jax.nn.log_softmax(logits) * one_hot, axis=-1))
        return loss, new_state

    (loss, new_state), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    assert bool(jnp.isfinite(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.isfinite(leaf).all())
    a0 = float(state["01_stack"]["block0"]["conv1"]["amax"])
    a1 = float(new_state["01_stack"]["block0"]["conv1"]["amax"])
    assert a1 != a0  # delayed scale refreshed by the step
