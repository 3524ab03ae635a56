"""Microbenchmark: lane-packed Pallas 3x3 conv vs XLA's lax.conv lowering
on the three WRN-28-10 b256 stage shapes (VERDICT round 2, next-round #1
'Done' criterion). Run on the real TPU:

    PYTHONPATH=/root/repo JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
        python tools/bench_conv.py [--batch 256] [--iters 50]

Prints per-shape: XLA NHWC conv time, pure Pallas kernel time (operands
already in the [C, B*H*W] lane layout — the steady-state cost if the model
adopted a C-major layout), and Pallas including NHWC<->lane transposes
(the bolt-on integration cost). The padded-MXU cost model predicts
XLA/Pallas utilization 62.5%/93.75% (160ch), 83%/97.8% (320ch),
100%/100% (640ch); see ops/pallas/conv.py.
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


def _time(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        # force a value readback: block_until_ready can return early on the
        # tunneled backend (verify skill gotchas)
        _ = float(jnp.ravel(out if not isinstance(out, tuple) else out[0])[0])
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    b = args.batch

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    results = []
    for h, w, c in STAGES:
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
        wts = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, dtype)

        lax_fn = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(dtype))
        t_lax = _time(lax_fn, x, wts, iters=args.iters)

        x_cs, _, _ = nhwc_to_lanes(x)
        x_cs = jax.device_put(x_cs)
        wp = jax.device_put(pack_weights(wts))
        pallas_pure = jax.jit(
            lambda xc, wp: conv3x3_lanes(xc, wp, h=h, w_img=w))
        t_pure = _time(pallas_pure, x_cs, wp, iters=args.iters)

        pallas_wrap = jax.jit(lambda x, w: conv3x3_nhwc(x, w))
        t_wrap = _time(pallas_wrap, x, wts, iters=args.iters)

        # backward shapes (dgrad reuses the forward kernel; wgrad is its
        # own kernel). XLA references: the conv VJPs.
        dy = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
        dy_cs, _, _ = nhwc_to_lanes(dy)
        dy_cs = jax.device_put(dy_cs)
        wdg = jax.device_put(pack_weights_dgrad(wts))

        lax_dgrad = jax.jit(lambda dy, w: jax.vjp(
            lambda x_: jax.lax.conv_general_dilated(
                x_, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dtype), x)[1](dy)[0])
        t_lax_dg = _time(lax_dgrad, dy, wts, iters=args.iters)
        pallas_dg = jax.jit(
            lambda dyc, wd: conv3x3_lanes(dyc, wd, h=h, w_img=w))
        t_pal_dg = _time(pallas_dg, dy_cs, wdg, iters=args.iters)

        lax_wgrad = jax.jit(lambda x_, dy_: jax.vjp(
            lambda w_: jax.lax.conv_general_dilated(
                x_, w_, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dtype),
            wts)[1](dy_)[0])
        t_lax_wg = _time(lax_wgrad, x, dy, iters=args.iters)
        pallas_wg = jax.jit(
            lambda xc, dyc: conv3x3_wgrad_lanes(xc, dyc, h=h, w_img=w))
        t_pal_wg = _time(pallas_wg, x_cs, dy_cs, iters=args.iters)

        # correctness spot check on-device (bf16 tolerance)
        ref = np.asarray(lax_fn(x, wts), np.float32)
        got = np.asarray(pallas_wrap(x, wts), np.float32)
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
