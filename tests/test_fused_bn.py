"""Fused-VJP BatchNorm: outputs and gradients must match plain autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_ddp_resnet_tpu.ops.batchnorm import batch_norm_train


def _reference(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    y = ((xf - mean) * inv * scale + bias).astype(x.dtype)
    return y, mean, var


def _data(seed=0, n=8, h=4, w=4, c=6):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(1.5, 2.0, size=(n, h, w, c)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(c,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    return x, scale, bias


def test_forward_matches_reference():
    x, scale, bias = _data()
    y, mean, var = batch_norm_train(x, scale, bias, 1e-5)
    yr, meanr, varr = _reference(x, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(meanr), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(varr), rtol=1e-5)


def test_gradients_match_autodiff():
    x, scale, bias = _data(seed=1)

    def loss_fused(x, s, b):
        y, _, _ = batch_norm_train(x, s, b, 1e-5)
        return jnp.sum(jnp.sin(y) * jnp.arange(y.size).reshape(y.shape))

    def loss_ref(x, s, b):
        y, _, _ = _reference(x, s, b, 1e-5)
        return jnp.sum(jnp.sin(y) * jnp.arange(y.size).reshape(y.shape))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b, name in zip(gf, gr, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=name)


def test_bf16_input_path():
    x, scale, bias = _data(seed=2)
    xb = x.astype(jnp.bfloat16)
    y, mean, var = jax.jit(batch_norm_train, static_argnums=3)(
        xb, scale, bias, 1e-5)
    assert y.dtype == jnp.bfloat16
    assert mean.dtype == jnp.float32 and var.dtype == jnp.float32
    # grads flow in bf16
    g = jax.grad(lambda x_, s, b: jnp.sum(
        batch_norm_train(x_, s, b, 1e-5)[0].astype(jnp.float32)))(
            xb, scale, bias)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_stat_outputs_carry_no_gradient():
    """mean/var feed the no-grad EMA buffers; their cotangent is defined 0."""
    x, scale, bias = _data(seed=3)

    def loss(x):
        _, mean, var = batch_norm_train(x, scale, bias, 1e-5)
        return jnp.sum(mean) + jnp.sum(var)

    g = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_layer_flag_equivalence():
    """BatchNorm(fused_vjp=True) must match the autodiff default."""
    from pytorch_ddp_resnet_tpu.models.layers import BatchNorm

    x, scale, bias = _data(seed=4, c=8)
    outs = []
    for fused in (False, True):
        bn = BatchNorm(num_features=8, compute_dtype=jnp.float32,
                       fused_vjp=fused)
        params, state, _ = bn.init(jax.random.key(0), (4, 4, 8))
        y, new_state = bn.apply(params, state, x[..., :8], train=True)
        outs.append((y, new_state))
    (ya, sa), (yb, sb) = outs
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sa["mean"]), np.asarray(sb["mean"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sa["var"]), np.asarray(sb["var"]),
                               rtol=1e-5)
