"""Lane-emitting stem conv (ops/pallas/stem.py + layers.py Conv.apply_to_lane).

Parity target: the reference spec's stem `nn.Conv2d(3, C, 3, 1, 1,
bias=True)` == layers.py Conv.apply's lax.conv + bias. The kernel must
match the XLA path's values (same f32-accumulate -> compute-dtype ->
+bias rounding order); its bias gradient is the f32-exact per-channel sum
of the cotangent (the XLA path's own bias VJP accumulates in bf16 — the
kernel is strictly closer to the torch oracle's f32 accumulation)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.models import ResNet
from pytorch_ddp_resnet_tpu.ops.pallas.stem import stem_conv_lane

B, H, W = 8, 32, 32
N = B * H * W


def _reference(x_cs, w_hwio, bias, cin, cout):
    xn = jnp.transpose(x_cs.reshape(cin, B, H, W), (1, 2, 3, 0))
    y = jax.lax.conv_general_dilated(
        xn, w_hwio.astype(x_cs.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias.astype(x_cs.dtype)
    return jnp.transpose(y, (3, 0, 1, 2)).reshape(cout, N)


@pytest.mark.parametrize("cin,cout", [(3, 16), (3, 160), (1, 32)])
def test_kernel_matches_conv(cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(cin, N)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    y = stem_conv_lane(x, w, b, h=H, w_img=W, interpret=True)
    ref = _reference(x, w, b, cin, cout)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=1e-2)


def test_kernel_gradients():
    rng = np.random.default_rng(1)
    cin, cout = 3, 16
    x = jnp.asarray(rng.normal(size=(cin, N)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    co = jnp.asarray(rng.normal(size=(cout, N)), jnp.bfloat16)

    _, vjp = jax.vjp(
        lambda a, ww, bb: stem_conv_lane(a, ww, bb, h=H, w_img=W,
                                         interpret=True), x, w, b)
    dx, dw, db = vjp(co)

    # dx is a DCE'd placeholder (no parameter upstream of the data batch)
    assert not np.asarray(dx).any()

    # dW vs an f32 reference conv wgrad (inputs are bf16 -> bf16-grain tol)
    _, vjp_ref = jax.vjp(
        lambda ww: _reference(x.astype(jnp.float32), ww,
                              b, cin, cout), w.astype(jnp.float32))
    (dw_ref,) = vjp_ref(co.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=2e-2, atol=2e-1)

    # db is the f32-EXACT cotangent sum
    np.testing.assert_allclose(
        np.asarray(db), np.asarray(jnp.sum(co.astype(jnp.float32), axis=1)),
        rtol=1e-6, atol=1e-4)


def _build(int8=True):
    return ResNet("c3,32,3,1,1 r2 r2 r2 n a ap8,1,0 fc128,10",
                  preact=True, use_proj=True, dropout_prob=0.3,
                  compute_dtype=jnp.bfloat16, int8_train=int8,
                  int8_train_bwd=int8)


def _stem_off(spine):
    name, stem = spine.layers[0]
    return dataclasses.replace(
        spine,
        layers=((name, dataclasses.replace(stem, lane_stem=False)),)
        + spine.layers[1:])


@pytest.mark.slow
def test_model_lane_stem_equivalence():
    """Same training loss and (non-stem-bias) gradients with the stem
    emitting lane layout vs the XLA entry-transpose path. Single-stage
    model: with stage transitions present the two builds legitimately
    diverge at int8 grain — an OPEN lane run now crosses transitions via
    the lane-through kernel (int8 conv1, packed dropout bits) while the
    stem-off control closes its lane at the stage boundary and takes the
    lane-entry path (bf16 XLA conv1); tests/test_transition.py covers
    that path's own equivalence."""
    m = ResNet("c3,32,3,1,1 r2 n a ap32,1,0 fc32,10",
               preact=True, use_proj=True, dropout_prob=0.3,
               compute_dtype=jnp.bfloat16, int8_train=True,
               int8_train_bwd=True)
    assert m.spine.layers[0][1].lane_stem
    params, state = m.init(jax.random.key(0), (32, 32, 3))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, 32, 32, 3)),
                    jnp.float32)
    yl = jnp.asarray(np.arange(B) % 10)
    ctl = _stem_off(m.spine)

    def loss(net):
        def f(p):
            out, _ = net.apply(p, state, x, train=True,
                               rng=jax.random.key(1, impl="rbg"))
            return jnp.mean(-jax.nn.log_softmax(out)[jnp.arange(B), yl])
        return f

    l1, g1 = jax.value_and_grad(loss(m.spine))(params)
    l2, g2 = jax.value_and_grad(loss(ctl))(params)
    assert abs(float(l1) - float(l2)) < 1e-5

    from jax.tree_util import tree_flatten_with_path, keystr
    f1, _ = tree_flatten_with_path(g1)
    f2, _ = tree_flatten_with_path(g2)
    for (k, a), (_, b) in zip(f1, f2):
        if "00_conv" in keystr(k) and "'b'" in keystr(k):
            continue  # bias grad: kernel is f32-exact, XLA path bf16 — see
            # module docstring; magnitudes agree to bf16 grain
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(1e-6, float(np.max(np.abs(b))))
        assert float(np.max(np.abs(a - b))) / denom < 2e-2, keystr(k)


def test_eval_and_non_preact_fall_back():
    """The lane stem only engages on the train-mode fused trunk."""
    m = _build()
    stem = m.spine.layers[0][1]
    assert not stem.lane_entry_eligible((B, 32, 32, 3), train=False)
    m2 = ResNet("c3,16,3,1,1 n a r3 r3 r3 ap8,1,0 fc64,10",
                preact=False, use_proj=False, dropout_prob=0.0,
                compute_dtype=jnp.bfloat16)
    assert not m2.spine.layers[0][1].lane_stem

    # eval forward agrees between the builds (stem path inert at eval)
    params, state = m.init(jax.random.key(0), (32, 32, 3))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(B, 32, 32, 3)),
                    jnp.float32)
    y1, _ = m.spine.apply(params, state, x, train=False)
    y2, _ = _stem_off(m.spine).apply(params, state, x, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
