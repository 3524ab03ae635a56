"""Correctness of the lane-packed Pallas 3x3 conv (interpret mode on CPU)
against jax.lax.conv_general_dilated — the same oracle XLA's own lowering
implements and the analog of the reference's stride-1 nn.Conv2d blocks
(reference residual_block.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.ops.pallas.conv import (
    _pick_tile,
    _tap_groups,
    conv3x3_nhwc,
    pack_weights,
)


def _lax_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("b,h,w,cin,cout", [
    (2, 8, 16, 32, 48),     # multi-image tile, non-square, cin != cout
    (1, 8, 16, 16, 16),     # single image
    (4, 8, 16, 160, 32),    # WRN stage-1 width -> 4-taps-per-group path
])
def test_conv_matches_lax(b, h, w, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
    wts = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
    ref = _lax_conv(x, wts)
    got = conv3x3_nhwc(x, wts, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_tap_groups_lane_alignment():
    # the whole point: per-group contraction K = 640 for every WRN width
    assert [len(g) for g in _tap_groups(160)] == [4, 4, 1]
    assert [len(g) for g in _tap_groups(320)] == [2, 2, 2, 2, 1]
    assert [len(g) for g in _tap_groups(640)] == [1] * 9
    for cin in (160, 320, 640):
        for g in _tap_groups(cin)[:-1]:
            assert (len(g) * cin) % 128 == 0


def test_pick_tile_respects_image_boundaries():
    assert _pick_tile(1024, 256 * 1024) % 1024 == 0     # stage 1
    assert _pick_tile(256, 256 * 256) % 256 == 0        # stage 2
    assert _pick_tile(64, 256 * 64) % 128 == 0          # stage 3
    assert _pick_tile(64, 256 * 64) % 64 == 0


def test_padding_masks_zero_out_borders():
    """An all-ones image with identity-ish weights: border outputs must see
    fewer taps (SAME zero padding), interior exactly 9."""
    b, h, w, c = 1, 8, 16, 16
    x = jnp.ones((b, h, w, c), jnp.float32)
    wts = jnp.zeros((3, 3, c, 1), jnp.float32)
    wts = wts.at[:, :, 0, 0].set(1.0)  # sum the 9 taps of channel 0
    out = conv3x3_nhwc(x, wts, interpret=True)[0, :, :, 0]
    assert float(out[4, 8]) == 9.0
    assert float(out[0, 0]) == 4.0     # corner: 2x2 valid taps
    assert float(out[0, 8]) == 6.0     # top edge: 2x3
    assert float(out[4, 0]) == 6.0     # left edge: 3x2


def test_dgrad_matches_lax_vjp():
    """Input gradient: the dgrad of a stride-1 SAME 3x3 conv is the same
    lane-packed forward kernel applied to dy with rot180/transposed
    weights (pack_weights_dgrad)."""
    from pytorch_ddp_resnet_tpu.ops.pallas.conv import (
        conv3x3_lanes, lanes_to_nhwc, nhwc_to_lanes, pack_weights_dgrad)

    rng = np.random.default_rng(1)
    b, h, w, cin, cout = 2, 8, 16, 32, 48
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
    wts = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
    dy = jnp.asarray(rng.normal(size=(b, h, w, cout)), jnp.float32)

    _, vjp = jax.vjp(lambda x_: _lax_conv(x_, wts), x)
    (dx_ref,) = vjp(dy)

    dy_cs, _, _ = nhwc_to_lanes(dy)
    dx_cs = conv3x3_lanes(dy_cs, pack_weights_dgrad(wts), h=h, w_img=w,
                          interpret=True)
    dx = lanes_to_nhwc(dx_cs, b, h, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cin,cout", [(32, 48), (160, 32)])
def test_wgrad_matches_lax_vjp(cin, cout):
    from pytorch_ddp_resnet_tpu.ops.pallas.conv import (
        conv3x3_wgrad_lanes, nhwc_to_lanes)

    rng = np.random.default_rng(2)
    b, h, w = 2, 8, 16
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
    wts = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
    dy = jnp.asarray(rng.normal(size=(b, h, w, cout)), jnp.float32)

    _, vjp = jax.vjp(lambda w_: _lax_conv(x, w_), wts)
    (dw_ref,) = vjp(dy)

    x_cs, _, _ = nhwc_to_lanes(x)
    dy_cs, _, _ = nhwc_to_lanes(dy)
    dw = conv3x3_wgrad_lanes(x_cs, dy_cs, h=h, w_img=w, interpret=True)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=2e-4)


def test_conv3x3_same_custom_vjp_matches_autodiff():
    """The differentiable entry point (custom_vjp over the fwd/dgrad/wgrad
    kernels) must match lax.conv's value AND both gradients."""
    from pytorch_ddp_resnet_tpu.ops.pallas.conv import conv3x3_same

    rng = np.random.default_rng(5)
    b, h, w, cin, cout = 2, 8, 16, 32, 16
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
    wts = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
    dy = jnp.asarray(rng.normal(size=(b, h, w, cout)), jnp.float32)

    def loss_pallas(x, w):
        return jnp.vdot(conv3x3_same(x, w, True), dy)

    def loss_lax(x, w):
        return jnp.vdot(_lax_conv(x, w), dy)

    (gx, gw) = jax.grad(loss_pallas, argnums=(0, 1))(x, wts)
    (rx, rw) = jax.grad(loss_lax, argnums=(0, 1))(x, wts)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_model_pallas_conv_flag_equivalence():
    """A model built with use_pallas_conv routes its stride-1 3x3 convs
    through the kernel and reproduces the lax.conv model's loss and grads
    (fp32, CPU interpret mode)."""
    from pytorch_ddp_resnet_tpu.models.resnet import ResNet

    spec = "c3,16,3,1,1 n a r1 ap8,1,0 fc16,4"
    kwargs = dict(architecture_spec=spec, preact=False, use_proj=False,
                  dropout_prob=0.0, compute_dtype=jnp.float32)
    m_ref = ResNet(**kwargs)
    m_pal = ResNet(**kwargs, pallas_conv=True)
    key = jax.random.PRNGKey(0)
    params, state = m_ref.init(key, (8, 8, 3))
    params2, state2 = m_pal.init(key, (8, 8, 3))
    jax.tree_util.tree_map(np.testing.assert_array_equal, params, params2)

    x = jnp.asarray(np.random.default_rng(1).normal(size=(16, 8, 8, 3)),
                    jnp.float32)
    y = jnp.asarray(np.arange(16) % 4)

    def loss(model, p, s):
        logits, _ = model.apply(p, s, x, train=True, rng=jax.random.PRNGKey(2))
        onehot = jax.nn.one_hot(y, 4)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(m_ref, p, state))(params)
    l_pal, g_pal = jax.value_and_grad(lambda p: loss(m_pal, p, state2))(params)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        g_pal, g_ref)


@pytest.mark.parametrize("relu,quant,use_res", [
    (True, True, False),    # conv1-style: affine -> relu -> s8 out
    (False, False, True),   # preact conv2: affine + residual -> bf16 out
    (True, False, True),    # v1 conv2: affine + residual -> relu -> bf16
])
def test_requant_epilogue_matches_composition(relu, quant, use_res):
    """conv3x3_lanes_requant == conv3x3_lanes + explicit XLA epilogue."""
    from pytorch_ddp_resnet_tpu.ops.pallas.conv import (
        conv3x3_lanes,
        conv3x3_lanes_requant,
    )

    rng = np.random.default_rng(0)
    b, h, w, cin, cout = 2, 8, 16, 32, 32
    n = b * h * w
    xq = jnp.asarray(rng.integers(-127, 128, size=(cin, n)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, size=(cout, 9 * cin)), jnp.int8)
    scale = jnp.asarray(rng.uniform(1e-4, 1e-2, size=(cout,)), jnp.float32)
    shift = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    res = (jnp.asarray(rng.normal(size=(cout, n)), jnp.bfloat16)
           if use_res else None)
    inv = 3.7 if quant else None

    got = conv3x3_lanes_requant(xq, wq, scale, shift, res, h=h, w_img=w,
                                relu=relu, inv_out_scale=inv, interpret=True)

    y = conv3x3_lanes(xq, wq, h=h, w_img=w, interpret=True)
    ref = y.astype(jnp.float32) * scale[:, None] + shift[:, None]
    if use_res:
        ref = ref + res.astype(jnp.float32)
    if relu:
        ref = jnp.maximum(ref, 0.0)
    if quant:
        ref = jnp.clip(jnp.round(ref * inv), -127, 127).astype(jnp.int8)
        assert got.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    else:
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(ref.astype(jnp.bfloat16), np.float32),
            rtol=0, atol=2e-2)


def test_requant_epilogue_dual_output():
    """Dual mode: the carrier AND the next block's quantized input come
    out of one kernel, each matching the explicit composition."""
    from pytorch_ddp_resnet_tpu.ops.pallas.conv import (
        conv3x3_lanes,
        conv3x3_lanes_requant,
    )

    rng = np.random.default_rng(1)
    b, h, w, c = 2, 8, 16, 32
    n = b * h * w
    xq = jnp.asarray(rng.integers(-127, 128, size=(c, n)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, size=(c, 9 * c)), jnp.int8)
    scale = jnp.asarray(rng.uniform(1e-4, 1e-2, size=(c,)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(c, n)), jnp.bfloat16)
    sb = jnp.asarray(rng.uniform(5.0, 50.0, size=(c,)), jnp.float32)
    tb = jnp.asarray(rng.normal(size=(c,)) * 3, jnp.float32)
    zeros = jnp.zeros((c,), jnp.float32)

    carrier, nq = conv3x3_lanes_requant(
        xq, wq, scale, zeros, res, (sb, tb), h=h, w_img=w,
        relu=False, inv_out_scale=None, interpret=True)

    y = (conv3x3_lanes(xq, wq, h=h, w_img=w, interpret=True)
         .astype(jnp.float32) * scale[:, None] + res.astype(jnp.float32))
    ref_q = jnp.clip(jnp.round(jnp.maximum(
        y * sb[:, None] + tb[:, None], 0.0)), -127, 127).astype(jnp.int8)
    assert carrier.dtype == jnp.bfloat16 and nq.dtype == jnp.int8
    np.testing.assert_allclose(
        np.asarray(carrier, np.float32),
        np.asarray(y.astype(jnp.bfloat16), np.float32), rtol=0, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(nq), np.asarray(ref_q))
