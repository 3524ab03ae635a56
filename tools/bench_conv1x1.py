"""Microbench: int8 lane 1x1 conv (fused requant epilogue) vs XLA bf16,
at the bottleneck-family stage shapes (ResNet-50 / WRN-50-2, ImageNet
geometry) plus the bottleneck mid 3x3.

Gate for the bottleneck int8 serving/training path (ROADMAP #8 "measure
first"): the 1x1s carry ~55% of ResNet-50's FLOPs; this tool decides
whether the int8 MXU win survives at those shapes before any model
integration is built.

Method: two-length-difference chained timing (tools/bench_int8_mxu.py) —
each iteration runs the down-projection then the up-projection
(Cin->width->Cin) so the chain has a real data dependency and constant
shapes; per-PAIR ms and combined TF/s are reported. The int8 chain stays
quantized end-to-end via the fused inv_out_scale epilogue, exactly like
the serving path.

    PYTHONPATH="/root/repo:$PYTHONPATH" \
        JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
        python tools/bench_conv1x1.py [--batch 256] [--arch r50|wrn50]
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


def _readback(x):
    return float(jnp.ravel(x)[0])


def _dispatch_time(fn, args, outer):
    jfn = jax.jit(fn)
    _readback(jfn(*args))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        _readback(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _time(make_chain, args, inner, outer):
    t1 = _dispatch_time(make_chain(inner), args, outer)
    t2 = _dispatch_time(make_chain(2 * inner), args, outer)
    return max(t2 - t1, 1e-9) / inner


# (h, w, channels, width) per stage
STAGES = {
    "r50": [(56, 56, 256, 64), (28, 28, 512, 128),
            (14, 14, 1024, 256), (7, 7, 2048, 512)],
    "wrn50": [(56, 56, 256, 128), (28, 28, 512, 256),
              (14, 14, 1024, 512), (7, 7, 2048, 1024)],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--arch", default="r50", choices=sorted(STAGES))
    ap.add_argument("--inner", type=int, default=48,
                    help="chain length; the measured difference chain must "
                         "dwarf per-dispatch RTT noise (~1ms on the tunnel)")
    ap.add_argument("--outer", type=int, default=8)
    args = ap.parse_args()

    from pytorch_ddp_resnet_tpu.ops.pallas.conv import (
        conv3x3_lanes_requant, pack_weights)
    from pytorch_ddp_resnet_tpu.ops.pallas.conv1x1 import (
        conv1x1_lanes_requant)

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    out = {}
    b = args.batch

    for h, w, c, cw in STAGES[args.arch]:
        n = b * h * w
        tag = f"{h}x{w} c{c} w{cw}"
        pair_flops = 2 * c * cw * n * 2  # down + up projection

        # --- bf16 XLA 1x1 pair (NHWC conv == batched matmul) -------------
        xb = jnp.asarray(rng.normal(size=(b, h, w, c)) * 0.5, jnp.bfloat16)
        wd = jnp.asarray(rng.normal(size=(1, 1, c, cw)) * c ** -0.5,
                         jnp.bfloat16)
        wu = jnp.asarray(rng.normal(size=(1, 1, cw, c)) * cw ** -0.5,
                         jnp.bfloat16)

        def make_bf16(k):
            def chain(x, wd, wu):
                for _ in range(k):
                    z = jax.lax.conv_general_dilated(
                        x, wd, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    z = jnp.maximum(z, 0)
                    x = jax.lax.conv_general_dilated(
                        z, wu, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return x
            return chain

        t = _time(make_bf16, (xb, wd, wu), args.inner, args.outer)
        out[f"{tag}/1x1 bf16_xla"] = {
            "ms": round(t * 1e3, 3),
            "tflops": round(pair_flops / t / 1e12, 1)}
        print(f"{tag:>22} 1x1 pair bf16: {t * 1e3:7.3f} ms "
              f"{pair_flops / t / 1e12:6.1f} T/s", flush=True)

        # --- int8 lane pair with fused requant epilogues -------------------
        xq = jnp.asarray(rng.integers(-80, 81, size=(c, n)), jnp.int8)
        wdq = jnp.asarray(rng.integers(-127, 128, size=(cw, c)), jnp.int8)
        wuq = jnp.asarray(rng.integers(-127, 128, size=(c, cw)), jnp.int8)
        sd = jnp.full((cw,), 1e-4, jnp.float32)
        su = jnp.full((c,), 1e-4, jnp.float32)
        zd = jnp.zeros((cw,), jnp.float32)
        zu = jnp.zeros((c,), jnp.float32)

        def make_int8(k):
            def chain(x, wdq, wuq):
                for _ in range(k):
                    q = conv1x1_lanes_requant(
                        x, wdq, sd, zd, relu=True, inv_out_scale=300.0)
                    x = conv1x1_lanes_requant(
                        q, wuq, su, zu, relu=True, inv_out_scale=300.0)
                return x
            return chain

        try:
            t = _time(make_int8, (xq, wdq, wuq), args.inner, args.outer)
            out[f"{tag}/1x1 int8_lane"] = {
                "ms": round(t * 1e3, 3),
                "tflops": round(pair_flops / t / 1e12, 1)}
            print(f"{tag:>22} 1x1 pair int8: {t * 1e3:7.3f} ms "
                  f"{pair_flops / t / 1e12:6.1f} T/s", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            out[f"{tag}/1x1 int8_lane"] = {"error": msg}
            print(f"{tag} 1x1 int8: REJECTED: {msg}", flush=True)

        # --- the bottleneck mid 3x3 at width channels ----------------------
        m_flops = 2 * cw * 9 * cw * n
        x3b = jnp.asarray(rng.normal(size=(b, h, w, cw)) * 0.5,
                          jnp.bfloat16)
        w3b = jnp.asarray(
            rng.normal(size=(3, 3, cw, cw)) * (9 * cw) ** -0.5,
            jnp.bfloat16)

        def make_bf16_3(k):
            def chain(x, w):
                for _ in range(k):
                    x = jnp.maximum(jax.lax.conv_general_dilated(
                        x, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC")), 0)
                return x
            return chain

        t = _time(make_bf16_3, (x3b, w3b), args.inner, args.outer)
        out[f"{tag}/3x3 bf16_xla"] = {
            "ms": round(t * 1e3, 3),
            "tflops": round(m_flops / t / 1e12, 1)}
        print(f"{tag:>22} 3x3 mid bf16: {t * 1e3:7.3f} ms "
              f"{m_flops / t / 1e12:6.1f} T/s", flush=True)

        x3q = jnp.asarray(rng.integers(-80, 81, size=(cw, n)), jnp.int8)
        w3q = pack_weights(jnp.asarray(
            rng.integers(-127, 128, size=(3, 3, cw, cw)), jnp.int8))
        s3 = jnp.full((cw,), 1e-4, jnp.float32)
        z3 = jnp.zeros((cw,), jnp.float32)

        def make_int8_3(k, hh=h, ww=w):
            def chain(x, w):
                for _ in range(k):
                    x = conv3x3_lanes_requant(
                        x, w, s3, z3, h=hh, w_img=ww, relu=True,
                        inv_out_scale=300.0)
                return x
            return chain

        try:
            t = _time(make_int8_3, (x3q, w3q), args.inner, args.outer)
            out[f"{tag}/3x3 int8_lane"] = {
                "ms": round(t * 1e3, 3),
                "tflops": round(m_flops / t / 1e12, 1)}
            print(f"{tag:>22} 3x3 mid int8: {t * 1e3:7.3f} ms "
                  f"{m_flops / t / 1e12:6.1f} T/s", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            out[f"{tag}/3x3 int8_lane"] = {"error": msg}
            print(f"{tag} 3x3 int8: REJECTED: {msg}", flush=True)

    for k in sorted(out):
        if k.endswith("int8_lane") and out[k].get("ms"):
            ref = out.get(k.replace("int8_lane", "bf16_xla"), {})
            if ref.get("ms"):
                out[k]["vs_bf16"] = round(ref["ms"] / out[k]["ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
