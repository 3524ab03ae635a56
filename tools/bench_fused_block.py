"""Microbenchmark: fused block-half Pallas kernels vs the XLA layer path.

Times one preact basic BLOCK (norm1+relu+drop+conv1 -> norm2+relu+drop+conv2
-> +residual) per iteration — the exact integration unit behind
`use_fused_block` (models/blocks.py _forward_fused: one XLA stats pass over
the block input, then two fused halves wired epilogue-stats -> next-norm) —
against the layer-by-layer XLA composition the model otherwise runs, at the
three WRN-28-10 stage shapes. Forward chains and value_and_grad chains are
timed separately.

Same chained methodology as tools/bench_conv.py / probe_step_physics.py:
data-dependent applications inside ONE dispatch, measured dispatch RTT
subtracted (per-iteration readbacks on this tunneled host cost 12-37 ms and
would swamp millisecond kernels).

    PYTHONPATH="/root/repo:$PYTHONPATH" \
        JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
        python tools/bench_fused_block.py [--inner 8] [--outer 8]
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

from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
    fold_bn,
    fused_half,
)

STAGES = [
    (32, 32, 160),
    (16, 16, 320),
    (8, 8, 640),
]
RATE = 0.3
THRESH = 179  # dropout_thresh(0.3)


def _readback(x):
    return float(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


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


def _time(fn, args, inner, outer, rtt):
    jfn = jax.jit(fn)
    _readback(jfn(*args))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        _readback(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return max(statistics.median(ts) - rtt, 1e-9) / inner


def _stats(x_cs):
    xf = x_cs.astype(jnp.float32)
    return jnp.sum(xf, axis=1), jnp.sum(jnp.square(xf), axis=1)


def _fold(gamma, beta, ssum, sssq, n):
    mean = ssum / n
    var = sssq / n - jnp.square(mean)
    return fold_bn(gamma, beta, mean, var)


def make_block_fns(b, h, w, c, key):
    """Returns (fused_block, xla_block): x_cs/x -> y, matching semantics."""
    n = b * h * w

    def bits_for(k, i, j):
        return jax.random.bits(jax.random.fold_in(jax.random.fold_in(k, i), j),
                               (c, n), dtype=jnp.uint8)

    def fused_block(x_cs, wts1, wts2, gamma, beta, k, i):
        s1, t1 = _fold(gamma, beta, *_stats(x_cs), n)
        z, zsum, zssq = fused_half(
            x_cs, wts1, s1, t1, bits_for(k, i, 0), None,
            dropout_rate=RATE, h=h, w_img=w)
        s2, t2 = _fold(gamma, beta, zsum, zssq, n)
        y, _, _ = fused_half(
            z, wts2, s2, t2, bits_for(k, i, 1), x_cs,
            dropout_rate=RATE, h=h, w_img=w, want_stats=False)
        return y

    def half_xla(x, wts, gamma, beta, bits):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
        inv = jax.lax.rsqrt(var + 1e-5) * gamma
        z = ((xf - mean) * inv + beta).astype(x.dtype)
        z = jnp.maximum(z, 0)
        z = jnp.where(bits < jnp.uint8(THRESH), z / (THRESH / 256.0),
                      jnp.zeros_like(z))
        return jax.lax.conv_general_dilated(
            z, wts.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def xla_block(x, wts1, wts2, gamma, beta, k, i):
        bits1 = bits_for(k, i, 0).reshape(c, b, h, w).transpose(1, 2, 3, 0)
        bits2 = bits_for(k, i, 1).reshape(c, b, h, w).transpose(1, 2, 3, 0)
        z = half_xla(x, wts1, gamma, beta, bits1)
        y = half_xla(z, wts2, gamma, beta, bits2)
        return x + y

    return fused_block, xla_block


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--outer", type=int, default=8)
    args = ap.parse_args()
    b, inner, outer = args.batch, args.inner, args.outer

    print(f"devices: {jax.devices()}", flush=True)
    rtt = _measure_rtt()
    print(f"dispatch rtt: {rtt * 1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    out = []
    for h, w, c in STAGES:
        n = b * h * w
        scale = (9 * c) ** -0.5
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
        x_cs = jnp.transpose(x, (3, 0, 1, 2)).reshape(c, n)
        wts1 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * scale, jnp.float32)
        wts2 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * scale, jnp.float32)
        gamma = jnp.asarray(rng.uniform(0.8, 1.2, size=(c,)), jnp.float32)
        beta = jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32)
        key = jax.random.key(0, impl="rbg")

        fused_block, xla_block = make_block_fns(b, h, w, c, key)

        def chain_fused(x_cs, wts1, wts2):
            for i in range(inner):
                x_cs = fused_block(x_cs, wts1, wts2, gamma, beta, key, i)
            return x_cs

        def chain_xla(x, wts1, wts2):
            for i in range(inner):
                x = xla_block(x, wts1, wts2, gamma, beta, key, i)
            return x

        def loss_fused(x_cs, wts1, wts2):
            return jnp.sum(chain_fused(x_cs, wts1, wts2)
                           .astype(jnp.float32) ** 2) * 1e-6

        def loss_xla(x, wts1, wts2):
            return jnp.sum(chain_xla(x, wts1, wts2)
                           .astype(jnp.float32) ** 2) * 1e-6

        tf_fwd = _time(chain_fused, (x_cs, wts1, wts2), inner, outer, rtt)
        tx_fwd = _time(chain_xla, (x, wts1, wts2), inner, outer, rtt)
        g_fused = jax.value_and_grad(loss_fused, argnums=(1, 2))
        g_xla = jax.value_and_grad(loss_xla, argnums=(1, 2))
        tf_all = _time(g_fused, (x_cs, wts1, wts2), inner, outer, rtt)
        tx_all = _time(g_xla, (x, wts1, wts2), inner, outer, rtt)

        row = {
            "shape": f"{b}x{h}x{w}x{c}",
            "fwd_fused_ms": 1e3 * tf_fwd,
            "fwd_xla_ms": 1e3 * tx_fwd,
            "fwd_speedup": tx_fwd / tf_fwd,
            "fwdbwd_fused_ms": 1e3 * tf_all,
            "fwdbwd_xla_ms": 1e3 * tx_all,
            "fwdbwd_speedup": tx_all / tf_all,
        }
        out.append(row)
        print(f"{row['shape']:>16}: fwd fused {row['fwd_fused_ms']:.3f}ms "
              f"vs xla {row['fwd_xla_ms']:.3f}ms ({row['fwd_speedup']:.2f}x) "
              f"| fwd+bwd fused {row['fwdbwd_fused_ms']:.3f}ms vs xla "
              f"{row['fwdbwd_xla_ms']:.3f}ms ({row['fwdbwd_speedup']:.2f}x)",
              flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
