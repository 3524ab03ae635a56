"""Probe: does a Pallas/Mosaic matmul engage the v5e 2x int8 MXU mode?

Round-2 measured that XLA:TPU does NOT use the int8 MXU mode for plain
convs/dots (int8 convs timed 0.95x/0.99x/0.70x vs bf16 on the WRN stage
shapes — BASELINE.md). The open question from VERDICT round 2 (#1a) is
whether a CUSTOM kernel can: v5e datasheets quote ~394 int8 TOPS vs ~197
bf16 TF/s, i.e. 2x peak if the mode is reachable from Mosaic.

Method: square [S,S]x[S,S] matmuls, Pallas tiled kernel vs jnp.dot, in
bf16->f32 and int8->s32, chained ``inner`` times inside one dispatch with
a scalar data dependency (a broadcast perturbation of `a`, identical
across variants), measured dispatch RTT subtracted — the repo's standard
tunneled-TPU methodology (tools/bench_conv.py).

    PYTHONPATH="/root/repo:$PYTHONPATH" \
        JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
        python tools/bench_int8_mxu.py [--size 4096] [--tile 512]

An int8 result near 2x the bf16 TF/s opens a serving-side int8 conv
path; Mosaic rejecting the int8 dot, or ~1x timing, closes the avenue.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _mm_kernel(a_ref, b_ref, o_ref, *, acc_t):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_t)


def pallas_mm(a, b, tile: int, acc_t):
    m, k = a.shape
    _, n = b.shape
    return pl.pallas_call(
        functools.partial(_mm_kernel, acc_t=acc_t),
        grid=(m // tile, n // tile),
        in_specs=[
            pl.BlockSpec((tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), acc_t),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n) * a.dtype.itemsize
            + m * n * jnp.dtype(acc_t).itemsize,
            transcendentals=0),
    )(a, b)


def xla_mm(a, b, acc_t):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_t)


def _dispatch_time(fn, args, outer):
    jfn = jax.jit(fn)
    _readback(jfn(*args))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        _readback(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _time(make_chain, args, inner, outer, rtt=None):
    """Two-length difference timing: per-op seconds from
    (T(2k) - T(k)) / k. Cancels the dispatch RTT exactly — on this
    tunnel the RTT swings by several ms minute-to-minute, and when the
    chain's real work is only ~5-15 ms a subtracted-constant estimate
    over- or under-corrects wildly (observed: impossible >peak TF/s)."""
    t1 = _dispatch_time(make_chain(inner), args, outer)
    t2 = _dispatch_time(make_chain(2 * inner), args, outer)
    return max(t2 - t1, 1e-9) / inner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--inner", type=int, default=16)
    ap.add_argument("--outer", type=int, default=8)
    args = ap.parse_args()
    s, tile = args.size, args.tile

    print(f"devices: {jax.devices()}", flush=True)
    rtt = _measure_rtt()
    print(f"dispatch rtt: {rtt * 1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    flops = 2 * s * s * s
    out = {}

    # chain by feeding the (re-cast) output back as the next LHS — a real
    # data dependency XLA cannot fold or CSE away: bf16 keeps unit variance
    # via the s^-0.5-scaled RHS; int8 requantizes the s32 accumulator
    cases = [
        ("bf16", jnp.asarray(rng.normal(size=(s, s)), jnp.bfloat16),
         jnp.asarray(rng.normal(size=(s, s)) * s ** -0.5, jnp.bfloat16),
         jnp.float32, lambda y: y.astype(jnp.bfloat16)),
        ("int8", jnp.asarray(rng.integers(-4, 5, size=(s, s)), jnp.int8),
         jnp.asarray(rng.integers(-4, 5, size=(s, s)), jnp.int8),
         jnp.int32,
         lambda y: jnp.clip(y >> 6, -127, 127).astype(jnp.int8)),
    ]
    for name, a, b, acc_t, recast in cases:
        for impl, mm in (("xla", lambda a, b, t=acc_t: xla_mm(a, b, t)),
                         ("pallas", lambda a, b, t=acc_t:
                          pallas_mm(a, b, tile, t))):
            label = f"{name}/{impl}"

            def make_chain(k, mm=mm, recast=recast):
                def chain(a, b):
                    for _ in range(k):
                        a = recast(mm(a, b))
                    return a
                return chain

            try:
                t = _time(make_chain, (a, b), args.inner, args.outer)
                tput = flops / t / 1e12
                out[label] = {"ms": round(t * 1e3, 3),
                              "tflops": round(tput, 1)}
                print(f"{label:>12}: {t * 1e3:7.3f} ms  {tput:6.1f} T/s",
                      flush=True)
            except Exception as e:  # Mosaic/XLA rejection IS a result
                msg = str(e).split("\n")[0][:160]
                out[label] = {"error": msg}
                print(f"{label:>12}: REJECTED: {msg}", flush=True)

    if "tflops" in out.get("int8/pallas", {}) and \
            "tflops" in out.get("bf16/pallas", {}):
        r = out["int8/pallas"]["tflops"] / out["bf16/pallas"]["tflops"]
        print(f"int8/bf16 pallas ratio: {r:.2f}x", flush=True)

    # --- conv probe: int8 lane-packed kernel vs bf16 lax.conv, WRN shapes,
    # including the requantize step a real int8 serving chain pays
    from pytorch_ddp_resnet_tpu.ops.pallas.conv import (
        conv3x3_lanes,
        pack_weights,
    )

    for hh, ww, c in ((32, 32, 160), (16, 16, 320), (8, 8, 640)):
        bsz = 256
        n = bsz * hh * ww
        cflops = 2 * c * 9 * c * n
        xb = jnp.asarray(rng.normal(size=(bsz, hh, ww, c)), jnp.bfloat16)
        wb = jnp.asarray(rng.normal(size=(3, 3, c, c)) * (9 * c) ** -0.5,
                         jnp.bfloat16)

        def make_bf16_conv_chain(k):
            def chain(x, w):
                for _ in range(k):
                    x = jax.lax.conv_general_dilated(
                        x, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return x
            return chain

        t = _time(make_bf16_conv_chain, (xb, wb), args.inner, args.outer)
        key = f"conv{c}/bf16_xla"
        out[key] = {"ms": round(t * 1e3, 3),
                    "tflops": round(cflops / t / 1e12, 1)}
        print(f"{key:>16}: {t * 1e3:7.3f} ms  {cflops / t / 1e12:6.1f} T/s",
              flush=True)

        xi = jnp.asarray(rng.integers(-4, 5, size=(c, n)), jnp.int8)
        wi = pack_weights(jnp.asarray(
            rng.integers(-4, 5, size=(3, 3, c, c)), jnp.int8))

        def make_int8_conv_chain(k, h=hh, wimg=ww):
            def chain(x, w):
                for _ in range(k):
                    y = conv3x3_lanes(x, w, h=h, w_img=wimg)  # s32 acc
                    # requantize: the real per-layer step of an int8
                    # serving chain (>> 5 keeps this data in range)
                    x = jnp.clip(y >> 5, -127, 127).astype(jnp.int8)
                return x
            return chain

        try:
            t = _time(make_int8_conv_chain, (xi, wi), args.inner,
                      args.outer)
            key = f"conv{c}/int8_pallas"
            out[key] = {"ms": round(t * 1e3, 3),
                        "tflops": round(cflops / t / 1e12, 1)}
            print(f"{key:>16}: {t * 1e3:7.3f} ms  "
                  f"{cflops / t / 1e12:6.1f} T/s", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            out[f"conv{c}/int8_pallas"] = {"error": msg}
            print(f"conv{c}/int8_pallas: REJECTED: {msg}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
