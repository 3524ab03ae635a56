"""Microbenchmark: lane-packed Pallas 3x3 conv vs XLA's lax.conv lowering
on the three WRN-28-10 b256 stage shapes (VERDICT round 2, next-round #1
'Done' criterion). Run on the real TPU:

    PYTHONPATH="/root/repo:$PYTHONPATH" \
        JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
        python tools/bench_conv.py [--batch 256] [--inner 24] [--outer 8]

Timing methodology (tunneled-TPU aware): each candidate op is applied
``inner`` times with a data dependency INSIDE one jitted dispatch, and
host-side timing covers ``outer`` such dispatches with one forced value
readback each. The measured per-dispatch round-trip latency (an empty
jitted op, ~4-12 ms on this tunnel) is subtracted before dividing by
``inner`` — per-iteration readbacks would otherwise swamp the ~1-2 ms
kernels. Weights are scaled by (9*Cin)^-1/2 so chained outputs keep unit
variance (no overflow at any chain length).

Per shape, prints: XLA NHWC conv, pure Pallas kernel (operands already in
the [C, B*H*W] lane layout — the steady-state cost if the model adopted a
C-major layout), Pallas including NHWC<->lane transposes (the bolt-on
integration cost, = the model's `use_pallas_conv` path), and the same
trio for dgrad; plus wgrad (XLA vs Pallas). The padded-MXU cost model
predicts XLA/Pallas lane utilization 62.5%/93.75% (160ch), 83%/97.8%
(320ch), 100%/100% (640ch); see ops/pallas/conv.py.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_ddp_resnet_tpu.ops.pallas.conv import (
    conv3x3_lanes,
    conv3x3_nhwc,
    conv3x3_wgrad_lanes,
    nhwc_to_lanes,
    pack_weights,
    pack_weights_dgrad,
)

STAGES = [  # (H, W, C) of the three equal-FLOP WRN-28-10 stage shapes
    (32, 32, 160),
    (16, 16, 320),
    (8, 8, 640),
]


def _readback(x):
    # force full execution: block_until_ready can return early on the
    # tunneled backend (verify skill gotchas)
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
    """Median per-op seconds: `fn` must apply the op `inner` times with a
    data dependency and return one array."""
    jfn = jax.jit(fn)
    _readback(jfn(*args))  # compile + warm
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        _readback(jfn(*args))
        ts.append(time.perf_counter() - t0)
    per_dispatch = statistics.median(ts)
    return max(per_dispatch - rtt, 1e-9) / inner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--inner", type=int, default=24)
    ap.add_argument("--outer", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--stages", type=str, default="0,1,2",
                    help="comma-separated STAGES indices to run")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    b, inner, outer = args.batch, args.inner, args.outer
    stages = [STAGES[int(i)] for i in args.stages.split(",")]

    print(f"devices: {jax.devices()}", flush=True)
    rtt = _measure_rtt()
    print(f"dispatch rtt: {rtt * 1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    results = []
    for h, w, c in stages:
        scale = (9 * c) ** -0.5  # unit-variance chaining
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
        wts = jnp.asarray(rng.normal(size=(3, 3, c, c)) * scale, dtype)
        dy = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)

        def lax_conv(x_, w_):
            return jax.lax.conv_general_dilated(
                x_, w_, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # --- forward ---
        def xla_chain(x_, w_):
            for _ in range(inner):
                x_ = lax_conv(x_, w_)
            return x_
        t_lax = _time_chain(xla_chain, (x, wts), inner, outer, rtt)

        x_cs, _, _ = nhwc_to_lanes(x)
        x_cs = jax.device_put(x_cs)
        wp = jax.device_put(pack_weights(wts))

        def pallas_pure_chain(xc, wp_):
            for _ in range(inner):
                xc = conv3x3_lanes(xc, wp_, h=h, w_img=w)
            return xc
        t_pure = _time_chain(pallas_pure_chain, (x_cs, wp), inner, outer, rtt)

        def pallas_nhwc_chain(x_, w_):
            for _ in range(inner):
                x_ = conv3x3_nhwc(x_, w_)
            return x_
        t_wrap = _time_chain(pallas_nhwc_chain, (x, wts), inner, outer, rtt)

        # --- input gradient (dgrad) ---
        def xla_dgrad_chain(dy_, w_):
            g = jax.vjp(lambda x_: lax_conv(x_, w_), x)[1]
            for _ in range(inner):
                dy_ = g(dy_)[0]
            return dy_
        t_lax_dg = _time_chain(xla_dgrad_chain, (dy, wts), inner, outer, rtt)

        wdg = jax.device_put(pack_weights_dgrad(wts))

        def pallas_dgrad_chain(dyc, wd):
            for _ in range(inner):
                dyc = conv3x3_lanes(dyc, wd, h=h, w_img=w)
            return dyc
        dy_cs, _, _ = nhwc_to_lanes(dy)
        dy_cs = jax.device_put(dy_cs)
        t_pal_dg = _time_chain(
            pallas_dgrad_chain, (dy_cs, wdg), inner, outer, rtt)

        # --- weight gradient (wgrad); output isn't chainable, so feed the
        # next dy through a NONLINEAR perturbation of each dW — wgrad is
        # linear in dy, and a pure scalar-factor chain lets XLA collapse
        # all iterations to one conv (measured 0.017ms "wgrad": artifact)
        def xla_wgrad_chain(x_, dy_):
            g = jax.vjp(lambda w_: lax_conv(x_, w_), wts)[1]
            acc = jnp.zeros((), jnp.float32)
            for _ in range(inner):
                dw = g(dy_)[0]
                # consume ALL of dW: reading one element lets XLA slice the
                # conv down to computing just that element (measured 0.000ms
                # "wgrad": artifact)
                s = jnp.sum(dw.astype(jnp.float32))
                acc = acc + s
                dy_ = dy_ + (1e-9 * s).astype(dy_.dtype) * jnp.abs(dy_)
            return acc
        t_lax_wg = _time_chain(xla_wgrad_chain, (x, dy), inner, outer, rtt)

        def pallas_wgrad_chain(xc, dyc):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(inner):
                dw = conv3x3_wgrad_lanes(xc, dyc, h=h, w_img=w)
                s = jnp.sum(dw.astype(jnp.float32))
                acc = acc + s
                dyc = dyc + (1e-9 * s).astype(dyc.dtype) * jnp.abs(dyc)
            return acc
        t_pal_wg = _time_chain(
            pallas_wgrad_chain, (x_cs, dy_cs), inner, outer, rtt)

        # correctness spot check on-device (bf16 tolerance)
        ref = np.asarray(jax.jit(lax_conv)(x, wts), np.float32)
        got = np.asarray(jax.jit(conv3x3_nhwc)(x, wts), np.float32)
        err = float(np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9))

        flops = 2 * b * h * w * 9 * c * c
        row = {
            "shape": f"{b}x{h}x{w}x{c}",
            "xla_ms": 1e3 * t_lax,
            "pallas_pure_ms": 1e3 * t_pure,
            "pallas_nhwc_ms": 1e3 * t_wrap,
            "xla_dgrad_ms": 1e3 * t_lax_dg,
            "pallas_dgrad_ms": 1e3 * t_pal_dg,
            "xla_wgrad_ms": 1e3 * t_lax_wg,
            "pallas_wgrad_ms": 1e3 * t_pal_wg,
            "xla_tflops": flops / t_lax / 1e12,
            "pallas_tflops": flops / t_pure / 1e12,
            "speedup_pure": t_lax / t_pure,
            "speedup_nhwc": t_lax / t_wrap,
            "speedup_dgrad": t_lax_dg / t_pal_dg,
            "speedup_wgrad": t_lax_wg / t_pal_wg,
            "rel_err": err,
        }
        results.append(row)
        print(f"{row['shape']:>16}: fwd xla {row['xla_ms']:.3f}ms "
              f"({row['xla_tflops']:.1f} TF/s) | pallas "
              f"{row['pallas_pure_ms']:.3f}ms ({row['pallas_tflops']:.1f} "
              f"TF/s, {row['speedup_pure']:.2f}x) | +transposes "
              f"{row['pallas_nhwc_ms']:.3f}ms ({row['speedup_nhwc']:.2f}x) "
              f"| rel_err {row['rel_err']:.2e}", flush=True)
        print(f"{'':>16}  dgrad xla {row['xla_dgrad_ms']:.3f}ms | pallas "
              f"{row['pallas_dgrad_ms']:.3f}ms "
              f"({row['speedup_dgrad']:.2f}x) ; wgrad xla "
              f"{row['xla_wgrad_ms']:.3f}ms | pallas "
              f"{row['pallas_wgrad_ms']:.3f}ms "
              f"({row['speedup_wgrad']:.2f}x)", flush=True)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
