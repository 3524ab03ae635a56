"""Fused train-mode BatchNorm with a hand-written VJP.

Profiling the WRN-28-10 step on v5e shows BatchNorm statistics/gradient
reductions costing ~30% of device time under plain autodiff (README
"Benchmarks"). This custom VJP was built to attack that: it computes the
mathematically identical gradients with the minimal reduction set. Measured
result: perf-neutral (72.8 vs 71.8 ms/step) — XLA's autodiff already emits an
equivalent schedule, so the BN cost is intrinsic to the reductions' layouts,
not autodiff overhead. Kept as an opt-in (``BatchNorm(fused_vjp=True)``) and
as the starting point for a future Pallas BN kernel (ROADMAP.md #2):

    forward:  S1 = sum(x), S2 = sum(x^2)            (2 channel reductions)
    backward: T1 = sum(g), T2 = sum(g * xhat)       (2 channel reductions)
              dbias = T1, dscale = T2
              dx = (scale * inv / n) * (n*g - T1 - xhat * T2)

with the normalized activation ``xhat`` saved in bf16 (autodiff saves fp32
intermediates). The (mean, var) outputs exist only to feed the running-stat
EMA — a no-grad buffer path in torch semantics — so their cotangents are
defined as zero; the only caller (models/layers.py BatchNorm) relies on
exactly that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def batch_norm_train(x, scale, bias, eps: float):
    """x: (N, H, W, C) any float dtype; scale/bias: (C,) f32.
    Returns (y [x.dtype], mean [f32], biased var [f32])."""
    y, mean, var, _ = _bn_forward(x, scale, bias, eps)
    return y, mean, var


def _bn_forward(x, scale, bias, eps):
    n = x.shape[0] * x.shape[1] * x.shape[2]
    s1 = jnp.sum(x, axis=(0, 1, 2), dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(0, 1, 2))
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    inv = lax.rsqrt(var + eps)
    xhat = (x.astype(jnp.float32) - mean) * inv
    y = (xhat * scale + bias).astype(x.dtype)
    return y, mean, var, (xhat.astype(x.dtype), inv, scale)


def _bn_fwd(x, scale, bias, eps):
    y, mean, var, res = _bn_forward(x, scale, bias, eps)
    return (y, mean, var), (res, x.shape)


def _bn_bwd(eps, carry, cotangents):
    (xhat, inv, scale), x_shape = carry
    gy = cotangents[0]  # cotangents of mean/var are zero by contract
    n = x_shape[0] * x_shape[1] * x_shape[2]
    t1 = jnp.sum(gy, axis=(0, 1, 2), dtype=jnp.float32)
    t2 = jnp.sum(gy.astype(jnp.float32) * xhat.astype(jnp.float32),
                 axis=(0, 1, 2))
    k = (scale * inv) / n
    xhat32 = xhat.astype(jnp.float32)
    dx = (k * (n * gy.astype(jnp.float32) - t1 - xhat32 * t2)).astype(gy.dtype)
    return dx, t2, t1


batch_norm_train.defvjp(_bn_fwd, _bn_bwd)
