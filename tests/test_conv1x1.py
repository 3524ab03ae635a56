"""Lane-layout 1x1 conv kernels (ops/pallas/conv1x1.py, interpret mode
on CPU) + the bottleneck int8 serving path (models/quantize.py — NHWC
XLA int8 dots, chosen over the lane kernels by end-to-end measurement;
see BASELINE.md "Int8 serving, bottleneck family").

Parity targets: jax.lax 1x1 conv semantics (the nn.Conv2d k=1 calls in
reference residual_block.py:102-215) and exact integer requantization
arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.models.quantize import Int8Inference, calibrate
from pytorch_ddp_resnet_tpu.models.resnet import ResNet
from pytorch_ddp_resnet_tpu.ops.pallas.conv1x1 import (
    conv1x1_lanes_requant,
    pack_weights_1x1,
    pick_tile_dense,
)


def _int8_case(cin=64, cout=32, n=512, seed=0):
    rng = np.random.default_rng(seed)
    xq = jnp.asarray(rng.integers(-127, 128, (cin, n)), jnp.int8)
    w_hwio = jnp.asarray(rng.integers(-127, 128, (1, 1, cin, cout)),
                         jnp.int8)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, (cout,)), jnp.float32) * 1e-3
    shift = jnp.asarray(rng.normal(size=(cout,)), jnp.float32) * 0.01
    acc = (np.asarray(w_hwio).reshape(cin, cout).T.astype(np.int64)
           @ np.asarray(xq, np.int64))
    y_ref = (acc.astype(np.float32) * np.asarray(scale)[:, None]
             + np.asarray(shift)[:, None])
    return xq, pack_weights_1x1(w_hwio), scale, shift, y_ref


def test_pick_tile_dense():
    assert pick_tile_dense(512, 64) == 512
    assert pick_tile_dense(802816, 256) == 2048
    assert pick_tile_dense(12544, 2048) == 256  # 12544 = 2^7 * 98
    with pytest.raises(ValueError):
        pick_tile_dense(1568, 2048)  # 7x7 at batch 32: not 128-aligned


def test_bf16_out_matches_reference():
    xq, wq, scale, shift, y_ref = _int8_case()
    y = conv1x1_lanes_requant(xq, wq, scale, shift, relu=True,
                              interpret=True)
    ref = np.maximum(y_ref, 0).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_int8_out_exact():
    xq, wq, scale, shift, y_ref = _int8_case(seed=1)
    inv = 50.0
    q = conv1x1_lanes_requant(xq, wq, scale, shift, relu=True,
                              inv_out_scale=inv, interpret=True)
    q_ref = np.clip(np.round(np.maximum(y_ref, 0) * inv), -127, 127)
    np.testing.assert_array_equal(np.asarray(q), q_ref.astype(np.int8))


def test_residual_and_dual_outputs():
    rng = np.random.default_rng(2)
    xq, wq, scale, shift, y_ref = _int8_case(seed=2)
    cout, n = y_ref.shape
    res = jnp.asarray(rng.normal(size=(cout, n)), jnp.bfloat16)
    sb = jnp.asarray(rng.uniform(0.5, 2.0, (cout,)), jnp.float32)
    tb = jnp.asarray(rng.normal(size=(cout,)), jnp.float32) * 0.1
    yc, q2 = conv1x1_lanes_requant(xq, wq, scale, shift, res, (sb, tb),
                                   relu=False, interpret=True)
    y_res = y_ref + np.asarray(res, np.float32)
    np.testing.assert_array_equal(
        np.asarray(yc), np.asarray(y_res.astype(jnp.bfloat16)))
    q2_ref = np.clip(np.round(np.maximum(
        y_res * np.asarray(sb)[:, None] + np.asarray(tb)[:, None], 0)),
        -127, 127).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(q2), q2_ref)


def test_dual_with_int8_out_rejected():
    xq, wq, scale, shift, _ = _int8_case()
    dual = (jnp.ones((32,), jnp.float32), jnp.zeros((32,), jnp.float32))
    with pytest.raises(ValueError, match="dual"):
        conv1x1_lanes_requant(xq, wq, scale, shift, None, dual,
                              relu=True, inv_out_scale=2.0, interpret=True)


def test_pack_weights_1x1_rejects_3x3():
    w = jnp.zeros((3, 3, 8, 8), jnp.int8)
    with pytest.raises(ValueError, match="1x1"):
        pack_weights_1x1(w)


# --- bottleneck serving path --------------------------------------------


def _bneck_model(preact: bool, channels: int = 128):
    # one 2-block identity bottleneck stack: width = channels // 4 = 32
    spec = f"c3,{channels},3,1,1 b2 n a ap8,1,0 fc{channels},10"
    model = ResNet(spec, preact=preact, use_proj=False, dropout_prob=0.0,
                   compute_dtype=jnp.bfloat16)
    params, state = model.init(jax.random.PRNGKey(0), (8, 8, 3))
    return model, params, state


def _batch(n=64, hw=8, seed=1):
    # n=64 at 8x8 -> N=4096 = 32 * 128 channels: exactly at the measured
    # int8-dot crossover (_bneck_eligible), so the blocks quantize
    return jax.random.normal(jax.random.PRNGKey(seed), (n, hw, hw, 3),
                             jnp.float32)


@pytest.mark.slow
@pytest.mark.parametrize("preact", [True, False])
def test_bneck_float_walk_matches_model_apply(preact):
    model, params, state = _bneck_model(preact)
    x = _batch()
    ref, _ = model.apply(params, state, x, train=False)
    inf = Int8Inference(model, params, state)
    got, stats = jax.jit(inf.calibrate_fn())(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-2)
    # observers at all three convs of both blocks: the XLA-dot path
    # only consumes the 1x1 scales, but the fused/NV kernels quantize
    # conv2 too, and one calibration walk serves every substrate
    assert sorted(stats) == [
        f"01_stack/block{b}/conv{c}" for b in (0, 1) for c in (1, 2, 3)]


@pytest.mark.parametrize("preact", [True, False])
def test_bneck_int8_serving_close_to_float(preact):
    model, params, state = _bneck_model(preact)
    x = _batch()
    ref, _ = model.apply(params, state, x, train=False)
    inf = Int8Inference(model, params, state)
    scales = calibrate(inf, [x])
    assert len(scales) == 6
    ql = jax.jit(inf.serve_fn(scales))(x)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ql - ref))) < 0.1 * scale + 0.05
    assert (jnp.argmax(ql, -1) == jnp.argmax(ref, -1)).all()


def test_bneck_transition_falls_back_float():
    # ResNet-50-style stage plan: the first block of each extended-token
    # stack transforms the shortcut -> wholesale float; identity blocks
    # quantize their two 1x1s
    spec = "c3,64,3,1,1 b2,128,32,1 n a ap8,1,0 fc128,10"
    model = ResNet(spec, preact=True, use_proj=True, dropout_prob=0.0,
                   compute_dtype=jnp.bfloat16)
    params, state = model.init(jax.random.PRNGKey(0), (8, 8, 3))
    x = _batch()
    ref, _ = model.apply(params, state, x, train=False)
    inf = Int8Inference(model, params, state)
    got, stats = jax.jit(inf.calibrate_fn())(x)
    # only block1 (identity) is quantized; block0 transforms the shortcut
    # (its observers only ride the NV-trunk walk, fused_bneck='nv')
    assert sorted(stats) == [f"01_stack/block1/conv{c}" for c in (1, 2, 3)]
    scales = calibrate(inf, [x])
    ql = jax.jit(inf.serve_fn(scales))(x)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ql - ref))) < 0.1 * scale + 0.05


@pytest.mark.parametrize("preact", [True, False])
def test_bneck_imagenet_geometry(preact):
    """Non-power-of-2 spatial (14x14, the shapes that force 6272-lane
    whole-image tiles on the 3x3 lane kernel): the hybrid path must stay
    eligible — the mid 3x3 rides XLA in CNHW — and serve accurately."""
    spec = "c3,128,3,1,1 b2 n a ap14,1,0 fc128,10"
    model = ResNet(spec, preact=preact, use_proj=False, dropout_prob=0.0,
                   compute_dtype=jnp.bfloat16)
    params, state = model.init(jax.random.PRNGKey(0), (14, 14, 3))
    x = jax.random.normal(jax.random.PRNGKey(3), (32, 14, 14, 3),
                          jnp.float32)  # N = 32*196 = 6272 = 49*128
    ref, _ = model.apply(params, state, x, train=False)
    inf = Int8Inference(model, params, state)
    _, stats = jax.jit(inf.calibrate_fn())(x)
    assert sorted(stats) == [
        f"01_stack/block{b}/conv{c}" for b in (0, 1) for c in (1, 2, 3)]
    scales = calibrate(inf, [x])
    ql = jax.jit(inf.serve_fn(scales))(x)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ql - ref))) < 0.1 * scale + 0.05
    assert (jnp.argmax(ql, -1) == jnp.argmax(ref, -1)).all()


def test_pick_tile_vmem_guard():
    """_pick_tile refuses image-aligned tiles that overflow scoped VMEM
    (measured: c=128 tile 6272 -> 16.56M > 16M on v5e) so eligibility
    gates fall back to float instead of compile-crashing."""
    from pytorch_ddp_resnet_tpu.ops.pallas.conv import _pick_tile
    with pytest.raises(ValueError, match="VMEM"):
        _pick_tile(28 * 28, 64 * 28 * 28, 128)  # ImageNet stage 2
    assert _pick_tile(32 * 32, 256 * 32 * 32, 160) == 2048  # WRN unchanged


def test_bneck_below_crossover_ineligible():
    # N = 4*64 = 256 < 32 * 128 channels: below the measured int8-dot
    # crossover -> wholesale float fallback (BASELINE.md: the quantize
    # chains dwarf the dots at ResNet-50's 7x7 stage, 0.44x)
    model, params, state = _bneck_model(True)
    x = _batch(n=4)
    inf = Int8Inference(model, params, state)
    _, stats = jax.jit(inf.calibrate_fn())(x)
    assert stats == {}
    assert calibrate(inf, [x]) == {}
