"""Probe: can the stage-transition boundary relayouts be avoided or
beaten on v5e?

The int8-FQT WRN step's remaining XLA glue is dominated by lane<->NHWC
relayouts around the stage transitions (~6-7 ms/step at b512; trace
2026-08-18). Two candidate fixes, measured here with the chained-ops
methodology (tools/bench_conv.py: data-dependent chains inside one
dispatch, two chain lengths differenced so the tunnel RTT cancels):

1. CNHW convs: run the transition's strided conv + proj directly on the
   lane tensor viewed as [C, B, H, W] (a free reshape of [C, B*H*W])
   with conv dimension_numbers "CNHW" — no relayout at all, IF XLA's
   CNHW conv is not slower than NHWC + copies.
2. A Pallas transpose kernel for the relayout itself, vs XLA's
   transposing copy (measured 1.7x off the HBM bound).
"""

import functools
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _readback(x):
    return float(jnp.ravel(x)[0].astype(jnp.float32))


def _t(jfn, args, outer=5):
    _readback(jfn(*args))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        _readback(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def timeit(make, args, inner=24):
    t1 = _t(jax.jit(make(inner)), args)
    t2 = _t(jax.jit(make(2 * inner)), args)
    return max(t2 - t1, 1e-9) / inner


def transpose_lane_to_nhwc_pallas(x_cs, b, h, w, interpret=False):
    """[C, B*H*W] (C-major) -> [B, H, W, C] via an in-kernel block
    transpose; one [C, tile] block in, one [tile, C] block out."""
    c, n = x_cs.shape
    tile = 2048
    while n % tile != 0:
        tile //= 2

    def kernel(x_ref, y_ref):
        y_ref[:] = x_ref[:].T

    y = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((c, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), x_cs.dtype),
        interpret=interpret,
    )(x_cs)
    return y.reshape(b, h, w, c)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    b = int(os.environ.get("PROBE_BATCH", "512"))

    for h, w, cin, cout in [(32, 32, 160, 320), (16, 16, 320, 640)]:
        n = b * h * w
        x_cs = jnp.asarray(rng.normal(size=(cin, n)) * .5, jnp.bfloat16)
        wt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * .05,
                         jnp.bfloat16)
        flops = 2 * cout * 9 * cin * (n // 4)

        def mk_nhwc(k):
            # status quo: relayout to NHWC + strided NHWC conv; the chain
            # keeps the output in NHWC and re-enters via a dummy op that
            # restores the input shape (pad back up), so each iteration
            # pays the relayout like the real step does
            def chain(x_cs, wt):
                acc = jnp.zeros((), jnp.float32)
                xi = x_cs
                for i in range(k):
                    xn = jnp.transpose(xi.reshape(cin, b, h, w),
                                       (1, 2, 3, 0))
                    y = jax.lax.conv_general_dilated(
                        xn, wt, (2, 2), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    acc = acc + jnp.sum(y[0, 0, 0].astype(jnp.float32))
                    # data-dependent re-entry at the input shape
                    xi = x_cs * (1.0 + acc * 1e-20).astype(x_cs.dtype)
                return acc
            return chain

        def mk_cnhw(k):
            def chain(x_cs, wt):
                acc = jnp.zeros((), jnp.float32)
                xi = x_cs
                for i in range(k):
                    xc = xi.reshape(cin, b, h, w)
                    y = jax.lax.conv_general_dilated(
                        xc, wt, (2, 2), "SAME",
                        dimension_numbers=("CNHW", "HWIO", "CNHW"))
                    acc = acc + jnp.sum(y[:, 0, 0, 0].astype(jnp.float32))
                    xi = x_cs * (1.0 + acc * 1e-20).astype(x_cs.dtype)
                return acc
            return chain

        tn = timeit(mk_nhwc, (x_cs, wt))
        tc = timeit(mk_cnhw, (x_cs, wt))
        print(f"transition {h}x{w} {cin}->{cout} b{b}: "
              f"relayout+NHWC {tn*1e3:7.3f} ms ({flops/tn/1e12:5.1f} T/s) | "
              f"CNHW {tc*1e3:7.3f} ms ({flops/tc/1e12:5.1f} T/s) | "
              f"NHWC/CNHW {tn/tc:.2f}", flush=True)

    # relayout alone: XLA copy vs pallas transpose
    for h, w, c in [(32, 32, 160), (16, 16, 320), (8, 8, 640)]:
        n = b * h * w
        x_cs = jnp.asarray(rng.normal(size=(c, n)) * .5, jnp.bfloat16)
        gb = 2 * x_cs.size * 2 / 1e9  # read + write, bf16

        def mk_xla(k):
            def chain(x_cs):
                acc = jnp.zeros((), jnp.float32)
                xi = x_cs
                for i in range(k):
                    xn = jnp.transpose(xi.reshape(c, b, h, w), (1, 2, 3, 0))
                    acc = acc + jnp.sum(xn[0, 0, 0].astype(jnp.float32))
                    xi = x_cs * (1.0 + acc * 1e-20).astype(x_cs.dtype)
                return acc
            return chain

        def mk_pallas(k):
            def chain(x_cs):
                acc = jnp.zeros((), jnp.float32)
                xi = x_cs
                for i in range(k):
                    xn = transpose_lane_to_nhwc_pallas(xi, b, h, w)
                    acc = acc + jnp.sum(xn[0, 0, 0].astype(jnp.float32))
                    xi = x_cs * (1.0 + acc * 1e-20).astype(x_cs.dtype)
                return acc
            return chain

        tx = timeit(mk_xla, (x_cs,))
        tp = timeit(mk_pallas, (x_cs,))
        print(f"relayout [{c},{n}] ({gb:.2f} GB rt): "
              f"XLA {tx*1e3:7.3f} ms ({gb/tx:5.0f} GB/s) | "
              f"pallas {tp*1e3:7.3f} ms ({gb/tp:5.0f} GB/s) | "
              f"XLA/pallas {tx/tp:.2f}", flush=True)


if __name__ == "__main__":
    main()
