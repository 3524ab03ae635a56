"""Step-time physics probe: where does the WRN train step's conv time go?

The chained-conv microbenchmark (tools/bench_conv.py) shows XLA's bare
stride-1 3x3 convs run near MXU peak at ALL three WRN stage widths —
contradicting the round-2 attribution of the 2:1.25:1 equal-FLOP stage
ratio to 128-lane Cout padding. This probe isolates what the *train step*
adds on top of a bare conv: BN (stats + normalize), ReLU, dropout, and
the residual add, each chained ``inner`` times inside one dispatch at
each stage shape (same RTT-subtracted methodology as bench_conv).

    PYTHONPATH="/root/repo:$PYTHONPATH" \
        JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
        python tools/probe_step_physics.py [--inner 24] [--outer 8]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STAGES = [
    (32, 32, 160),
    (16, 16, 320),
    (8, 8, 640),
]


def _readback(x):
    return float(jnp.ravel(x)[0])


def _measure_rtt():
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((), jnp.float32)
    _readback(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _readback(f(x))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _time_chain(fn, args, inner, outer, rtt):
    jfn = jax.jit(fn)
    _readback(jfn(*args))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        _readback(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return max(statistics.median(ts) - rtt, 1e-9) / inner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--inner", type=int, default=24)
    ap.add_argument("--outer", type=int, default=8)
    args = ap.parse_args()
    b, inner, outer = args.batch, args.inner, args.outer
    dtype = jnp.bfloat16

    print(f"devices: {jax.devices()}", flush=True)
    rtt = _measure_rtt()
    print(f"dispatch rtt: {rtt * 1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    out = []
    for h, w, c in STAGES:
        scale = (9 * c) ** -0.5
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
        wts = jnp.asarray(rng.normal(size=(3, 3, c, c)) * scale, dtype)
        key = jax.random.key(0, impl="rbg")

        def conv(x_):
            return jax.lax.conv_general_dilated(
                x_, wts, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def bn_relu(x_):
            xf = x_.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
            y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
            return jnp.maximum(y, 0).astype(dtype)

        def drop(x_, k):
            bits = jax.random.bernoulli(k, 0.7, x_.shape)
            return jnp.where(bits, x_ / 0.7, 0).astype(dtype)

        def chain_conv(x_):
            for _ in range(inner):
                x_ = conv(x_)
            return x_

        def chain_conv_bn(x_):
            for _ in range(inner):
                x_ = bn_relu(conv(x_))
            return x_

        def chain_conv_bn_drop(x_, key_):
            for i in range(inner):
                x_ = drop(bn_relu(conv(x_)), jax.random.fold_in(key_, i))
            return x_

        def chain_full_block(x_, key_):
            # preact basic-block half: bn+relu -> conv -> dropout -> +res
            for i in range(inner):
                y = conv(bn_relu(x_))
                y = drop(y, jax.random.fold_in(key_, i))
                x_ = x_ + y
            return x_

        t0 = _time_chain(chain_conv, (x,), inner, outer, rtt)
        t1 = _time_chain(chain_conv_bn, (x,), inner, outer, rtt)
        t2 = _time_chain(chain_conv_bn_drop, (x, key), inner, outer, rtt)
        t3 = _time_chain(chain_full_block, (x, key), inner, outer, rtt)

        flops = 2 * b * h * w * 9 * c * c
        row = {
            "shape": f"{b}x{h}x{w}x{c}",
            "conv_ms": 1e3 * t0,
            "conv_tflops": flops / t0 / 1e12,
            "conv_bn_relu_ms": 1e3 * t1,
            "conv_bn_drop_ms": 1e3 * t2,
            "full_block_half_ms": 1e3 * t3,
            "bn_relu_cost_ms": 1e3 * (t1 - t0),
            "dropout_cost_ms": 1e3 * (t2 - t1),
            "residual_cost_ms": 1e3 * (t3 - t2),
        }
        out.append(row)
        print(f"{row['shape']:>16}: conv {row['conv_ms']:.3f}ms "
              f"({row['conv_tflops']:.1f} TF/s) | +bn+relu "
              f"{row['conv_bn_relu_ms']:.3f}ms (+{row['bn_relu_cost_ms']:.3f}) "
              f"| +dropout {row['conv_bn_drop_ms']:.3f}ms "
              f"(+{row['dropout_cost_ms']:.3f}) | block-half "
              f"{row['full_block_half_ms']:.3f}ms "
              f"(+{row['residual_cost_ms']:.3f})", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
