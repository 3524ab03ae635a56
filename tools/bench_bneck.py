"""A/B the fused int8 NV bottleneck-block kernel (ops/pallas/
bneck_nv.py) against the bf16 XLA block at the ResNet-50 / WRN-50-2
stage shapes.

Methodology: chained-ops timing (tools/bench_conv.py / CLAUDE.md) — the
block is data-dependently chained inside one dispatch at two chain
lengths and the times differenced, so the tunnel RTT cancels. Identity
bottleneck blocks map [N,H,W,C] -> [N,H,W,C], so chaining is natural:
the bf16 chain carries NHWC bf16, the NV chain carries the int8
[h, wp, N, C] carrier. (The round-4 padded-flat kernel's columns were
removed with that kernel's displacement in round 5 — BASELINE.md.)

Usage: python tools/bench_bneck.py [b] (default 128)
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

from pytorch_ddp_resnet_tpu.ops.pallas.bneck_nv import (
    bneck_block_nv,
    quantize_to_nv,
)


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


def timeit(make, args, inner=8):
    t1 = _t(jax.jit(make(inner)), args)
    t2 = _t(jax.jit(make(2 * inner)), args)
    return max(t2 - t1, 1e-9) / inner


# R50 widths and WRN-50-2 widths per stage: (h, w, cin, width)
STAGES = [
    ("r50-s1", 56, 56, 256, 64),
    ("r50-s2", 28, 28, 512, 128),
    ("r50-s3", 14, 14, 1024, 256),
    ("r50-s4", 7, 7, 2048, 512),
    ("wrn50-s1", 56, 56, 256, 128),
    ("wrn50-s2", 28, 28, 512, 256),
    ("wrn50-s3", 14, 14, 1024, 512),
]


def bf16_block(x, w1, w2, w3, i1, t1, i2, t2, i3, t3):
    """The shipped float serving block (models/quantize.py float path):
    bf16 convs, f32 BN eval affines + relu, identity residual."""
    xf = x.astype(jnp.float32)
    conv = lambda a, wt: jax.lax.conv_general_dilated(
        a.astype(jnp.bfloat16), wt, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    a1 = jnp.maximum(conv(xf, w1) * i1 + t1, 0.0)
    a2 = jnp.maximum(conv(a1, w2) * i2 + t2, 0.0)
    z3 = conv(a2, w3) * i3 + t3
    return jnp.maximum(xf + z3, 0.0).astype(jnp.bfloat16)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print(f"devices: {jax.devices()}  batch={b}", flush=True)
    rng = np.random.default_rng(0)

    stages = STAGES
    want = os.environ.get("BENCH_STAGES")  # comma-separated stage names
    if want:
        keep = set(want.split(","))
        stages = [s for s in STAGES if s[0] in keep]
    for name, h, w, cin, wdt in stages:
        gflop = 2 * b * h * w * (cin * wdt + 9 * wdt * wdt + wdt * cin) / 1e9

        # ---- bf16 XLA chain ----
        w1 = jnp.asarray(rng.normal(0, 0.05, (1, 1, cin, wdt)), jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, wdt, wdt)), jnp.bfloat16)
        w3 = jnp.asarray(rng.normal(0, 0.05, (1, 1, wdt, cin)), jnp.bfloat16)
        aff = lambda k, s=1.0: (jnp.asarray(rng.uniform(0.9, 1.1, (k,)) * s,
                                            jnp.float32),
                                jnp.asarray(rng.uniform(-.01, .01, (k,)),
                                            jnp.float32))
        i1, t1 = aff(wdt)
        i2, t2 = aff(wdt)
        i3, t3 = aff(cin, 0.05)
        x = jnp.asarray(rng.normal(0, 1, (b, h, w, cin)), jnp.bfloat16)

        def make_f(k):
            def f(x):
                for _ in range(k):
                    x = bf16_block(x, w1, w2, w3, i1, t1, i2, t2, i3, t3)
                return x
            return f

        inner = 8 if h >= 56 else (16 if h >= 28 else 32)
        tf = timeit(make_f, (x,), inner=inner)

        # ---- int8 operands ----
        w1q = jnp.asarray(rng.integers(-127, 128, (cin, wdt)), jnp.int8)
        w2q = jnp.asarray(rng.integers(-127, 128, (9, wdt, wdt)), jnp.int8)
        w3q = jnp.asarray(rng.integers(-127, 128, (wdt, cin)), jnp.int8)
        vec = lambda k, s: jnp.full((k,), s, jnp.float32)
        p1, q1 = vec(wdt, 1e-4), vec(wdt, 0.1)
        p2, q2 = vec(wdt, 1e-4), vec(wdt, 0.1)
        p3, q3 = vec(cin, 1e-4), vec(cin, 0.05)

        # ---- NV-layout chain (ops/pallas/bneck_nv.py) ----
        # BENCH_BATCH_TILE: unset -> joint auto-pick (_pick_grid);
        # "legacy" -> the single-batch-tile geometry (pre-round-5);
        # integer -> that tile. BENCH_CHUNK_ROWS pins R.
        bt_env = os.environ.get("BENCH_BATCH_TILE")
        bt = b if bt_env == "legacy" else (int(bt_env) if bt_env else None)
        cr_env = os.environ.get("BENCH_CHUNK_ROWS")
        cr = int(cr_env) if cr_env else None

        def make_nv(k, impl):
            def f(q):
                for _ in range(k):
                    q = bneck_block_nv(q, w1q, w2q, w3q, p1, q1, p2, q2,
                                       p3, q3, 1.0, w=w, out_int8=True,
                                       conv2_impl=impl, chunk_rows=cr,
                                       batch_tile=bt)
                return q
            return f

        tnv = tnv9 = float("inf")
        if b >= 32 and b & (b - 1) == 0:  # bneck_block_nv: N pow2 mult of 32
            q_nv = quantize_to_nv(x.astype(jnp.float32), 0.02)
            tnv = timeit(functools.partial(make_nv, impl="grouped3"),
                         (q_nv,), inner=inner)
            tnv9 = timeit(functools.partial(make_nv, impl="dots9"),
                          (q_nv,), inner=inner)

        def col(label, t):
            if t == float("inf"):
                return f"{label} skipped"
            return f"{label} {t*1e3:7.3f} ms ({tf/t:5.2f}x)"

        print(f"{name:10s} h={h:2d} cin={cin:4d} w={wdt:4d} "
              f"bf16 {tf*1e3:7.3f} ms ({gflop/tf/1e3:6.1f} T/s)  "
              f"{col('nv-g3', tnv)}  {col('nv-d9', tnv9)}", flush=True)





def e2e():
    """End-to-end serving A/B on the full models: float bf16 vs int8
    XLA-dot (the shipped 0.99x substrate) vs int8 fused-kernel. Random
    init + synthetic calibration — pure perf; accuracy agreement is
    validated separately on trained checkpoints. Timing follows
    tools/eval_int8_serving.py serving_rate: k independent dispatches
    queue on the device, one final readback, two lengths differenced
    (explicit-params jits cannot ride an outer jit chain — the weights
    would be re-captured as program constants, exceeding the tunnel's
    compile-request limit)."""
    from pytorch_ddp_resnet_tpu.models.quantize import (
        Int8Inference, calibrate)
    from pytorch_ddp_resnet_tpu.models.resnet import ResNet

    b = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    print(f"devices: {jax.devices()}  batch={b}  @224", flush=True)
    specs = {
        "resnet-50": ("c3,64,7,2,3 n a mp3,2,1 b3,256,64,1 b4,512,128,2 "
                      "b6,1024,256,2 b3,2048,512,2 ap7,1,0 fc2048,1000"),
        "wrn-50-2": ("c3,64,7,2,3 n a mp3,2,1 b3,256,128,1 b4,512,256,2 "
                     "b6,1024,512,2 b3,2048,1024,2 ap7,1,0 fc2048,1000"),
    }
    # Compile-budget knobs for the tunneled host (fresh cache = ~2-5 min
    # per full-model compile): BENCH_MODELS / BENCH_VARIANTS are
    # comma-separated subsets.
    want_models = os.environ.get("BENCH_MODELS")
    if want_models:
        keep = set(want_models.split(","))
        specs = {k: v for k, v in specs.items() if k in keep}
    want_var = set(os.environ.get(
        "BENCH_VARIANTS", "float,int8-dot,int8-nv").split(","))
    # BENCH_NV_CONV2: comma list of conv2 impl forcings for the NV
    # variant ("default" = per-kernel defaults, "dots9", "grouped3") —
    # bit-equal impls, so this is a pure perf A/B column.
    nv_impls = os.environ.get("BENCH_NV_CONV2", "default").split(",")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (b, 224, 224, 3)), jnp.float32)

    def rate(fn, k=32):
        fn(x)
        def run(n):
            t0 = time.perf_counter()
            y = None
            for _ in range(n):
                y = fn(x)
            _readback(y)
            return time.perf_counter() - t0
        run(4)  # warm the queue
        t_full, t_half = run(k), run(k // 2)
        return (t_full - t_half) / (k - k // 2)

    for name, spec in specs.items():
        model = ResNet(spec, preact=False, use_proj=True, dropout_prob=0.0,
                       compute_dtype=jnp.bfloat16)
        params, state = model.init(jax.random.PRNGKey(0), (224, 224, 3))

        jf = jax.jit(lambda p, s, xx, _m=model: _m.apply(
            p, s, xx, train=False)[0])
        ffloat = lambda xx: jf(params, state, xx)
        variants = [("float", lambda: ffloat)]
        if "int8-dot" in want_var:
            inf_dot = Int8Inference(model, params, state, fused_bneck=False)
            variants.append(
                ("int8-dot",
                 lambda: inf_dot.serve_args_fn(calibrate(inf_dot, [x]))))
        if "int8-nv" in want_var:
            # NV trunk calibrates on its own float walk: its observers
            # also cover transition blocks (conv1/2/3).
            # BENCH_NV_GRID=legacy pins the pre-round-5 single-batch-tile
            # grid for the A/B against the joint (R, nb) auto-pick.
            for impl in nv_impls:
                inf_nv = Int8Inference(
                    model, params, state, fused_bneck="nv",
                    nv_grid=os.environ.get("BENCH_NV_GRID", "auto"),
                    nv_conv2_impl=None if impl == "default" else impl)
                label = ("int8-nv" if impl == "default"
                         else f"int8-nv/{impl}")
                variants.append(
                    (label,
                     lambda _i=inf_nv: _i.serve_args_fn(
                         calibrate(_i, [x]))))

        res = {}
        for label, mk in variants:
            res[label] = rate(mk())
            line = (f"{name:10s} {label:10s} {res[label]*1e3:7.2f} ms/batch"
                    f" ({b/res[label]:,.0f} img/s)")
            if label != "float":
                line += f"  ({res['float']/res[label]:4.2f}x vs float)"
            print(line, flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "e2e":
        e2e()
    else:
        main()
