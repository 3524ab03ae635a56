"""Microbenchmark: int8 QAT/FQT fused half-block kernels per WRN stage.

Times `fused_half_int8` (ops/pallas/fused_block.py) forward chains and
VJP chains (fwd + dgrad + wgrad in one dispatch) at the three WRN-28-10
stage shapes, with `--quant-bwd` switching the backward between the
straight-through bf16 kernels and the fully-quantized int8 kernels —
the per-kernel attribution behind BASELINE.md "Int8 training".

Same chained methodology as tools/bench_conv.py: data-dependent
applications inside ONE dispatch, measured dispatch RTT subtracted
(per-iteration readbacks on this tunneled host cost 12-37 ms and would
swamp millisecond kernels).

CAVEAT (measured 2026-08-18): the *_fwd_ms chains report implausibly
low absolutes at the 320/640 stages (down to 0.001 ms — XLA evidently
collapses parts of the repeated-apply chain despite the loop-carried
data dependence). Use the *_train_ms columns and A/B DELTAS only; for
absolute per-kernel attribution use tools/trace_step.py's xplane
aggregation, which reads the real train step's trace.

    PYTHONPATH="/root/repo:$PYTHONPATH" \
        JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
        python tools/bench_int8_train_kernels.py [--batch 256] [--inner 8]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_ddp_resnet_tpu.ops.pallas.fused_block import (
    fold_bn,
    fused_half,
    fused_half_int8,
)

STAGES = [
    (32, 32, 160),
    (16, 16, 320),
    (8, 8, 640),
]
RATE = 0.3


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
    c = jax.jit(fn, static_argnums=())
    _readback(c(*args))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        _readback(c(*args))
        ts.append(time.perf_counter() - t0)
    return (statistics.median(ts) - rtt) / inner * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--outer", type=int, default=8)
    args = ap.parse_args()
    rtt = _measure_rtt()
    print(f"devices: {jax.devices()}  rtt: {rtt * 1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    for h, w, c in STAGES:
        n = args.batch * h * w
        x = jnp.asarray(rng.normal(size=(c, n)), jnp.bfloat16)
        wts = jnp.asarray(rng.normal(size=(3, 3, c, c)) * (9 * c) ** -0.5,
                          jnp.float32)
        gamma = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
        mean = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
        var = jnp.asarray(rng.uniform(0.5, 2, size=(c,)), jnp.float32)
        scale, shift = fold_bn(gamma, beta, mean, var)
        bits = jnp.asarray(rng.integers(0, 256, size=(c, n)), jnp.uint8)
        ct = jnp.asarray(rng.normal(size=(c, n)), jnp.float32)

        def chain_fwd(x, wts, half, k=args.inner):
            for _ in range(k):
                y, s, q = half(x, wts, scale, shift, bits, None,
                               dropout_rate=RATE, h=h, w_img=w)
                x = (y + ((s + q) * 1e-9)[:, None]).astype(x.dtype)
            return x

        def chain_vjp(x, wts, half, k=args.inner):
            def loss(x, wts):
                y, s, q = half(x, wts, scale, shift, bits, None,
                               dropout_rate=RATE, h=h, w_img=w)
                return (jnp.sum(y.astype(jnp.float32) * ct)
                        + jnp.sum(s) * 1e-3 + jnp.sum(q) * 1e-4)
            for _ in range(k):
                l, (dx, dw) = jax.value_and_grad(loss, argnums=(0, 1))(x, wts)
                x = (x + dx * 1e-9 + l * 1e-12).astype(x.dtype)
                wts = wts + dw * 1e-9
            return x

        row = {"stage": f"{h}x{w}x{c}", "batch": args.batch}
        for name, half in [
            ("bf16", fused_half),
            ("int8_fwd", fused_half_int8),
            ("int8_fqt", lambda *a, **k: fused_half_int8(
                *a, quant_bwd=True, **k)),
        ]:
            row[f"{name}_fwd_ms"] = round(
                _time(lambda x, w: chain_fwd(x, w, half), (x, wts),
                      args.inner, args.outer, rtt), 3)
            row[f"{name}_train_ms"] = round(
                _time(lambda x, w: chain_vjp(x, w, half), (x, wts),
                      args.inner, args.outer, rtt), 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
