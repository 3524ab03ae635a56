"""ResNet-50 @ 224x224 training-step throughput on the attached chip.

The reference's headline ImageNet model (resnet-50_ilsvrc2012 config;
reference README.md:76). Device-side step only — synthetic resident
data, no input pipeline (the streaming decode path is benchmarked
separately in BASELINE.md "Streaming input path") — so this measures
the compute ceiling the input pipeline must feed.

    PYTHONPATH="/root/repo:$PYTHONPATH" \
        JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
        python tools/bench_r50_train.py [--batch 64] [--remat] [--chunk 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SPEC = ("c3,64,7,2,3 n a mp3,2,1 b3,256,64,1 b4,512,128,2 "
        "b6,1024,256,2 b3,2048,512,2 ap7,1,0 fc2048,1000")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize residual blocks (halves activation "
                         "memory; needed for large batches)")
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--measure", type=int, default=16)
    ap.add_argument("--int8", action="store_true",
                    help="route identity bottleneck blocks through the NV "
                         "int8 FQT training kernels "
                         "(ops/pallas/bneck_nv_train.py)")
    ap.add_argument("--qat", action="store_true",
                    help="with --int8: exact straight-through backward "
                         "(bf16 dgrad/wgrad) instead of FQT")
    ap.add_argument("--model", default="resnet50",
                    choices=["resnet50", "wrn50_2"])
    ap.add_argument("--trace", action="store_true",
                    help="profile one warm dispatch and print the per-op "
                         "device-time aggregation (trace_step.py's "
                         "xplane workflow)")
    args = ap.parse_args()

    from pytorch_ddp_resnet_tpu.algos.steps import (
        init_train_state, make_chunked_train_step, make_train_step)
    from pytorch_ddp_resnet_tpu.models import ResNet
    from pytorch_ddp_resnet_tpu.parallel.mesh import (
        make_mesh, replicated_sharding)
    from pytorch_ddp_resnet_tpu.utils.optim import get_optimizer

    print(f"devices: {jax.devices()}", flush=True)
    mesh = make_mesh()
    spec = SPEC if args.model == "resnet50" else (
        "c3,64,7,2,3 n a mp3,2,1 b3,256,128,1 b4,512,256,2 "
        "b6,1024,512,2 b3,2048,1024,2 ap7,1,0 fc2048,1000")
    model = ResNet(spec, preact=False, use_proj=True, dropout_prob=0.0,
                   compute_dtype=jnp.bfloat16, remat=args.remat,
                   int8_train=args.int8,
                   int8_train_bwd=args.int8 and not args.qat)
    optimizer = get_optimizer("SGD", {
        "lr": 0.1, "momentum": 0.9, "nesterov": False,
        "weight_decay": 1e-4})  # the shipped r50 config's optimizer
    ts = init_train_state(model, optimizer, jax.random.key(0), (224, 224, 3))
    ts = jax.device_put(ts, replicated_sharding(mesh))

    # resident synthetic 224x224 batches (pipeline benchmarked separately)
    rng = np.random.default_rng(0)
    n_data = max(256, args.batch)
    rep = replicated_sharding(mesh)
    data_x = jax.device_put(
        jnp.asarray(rng.normal(size=(n_data, 224, 224, 3)) * 0.5,
                    jnp.float32), rep)
    data_y = jax.device_put(
        jnp.asarray(rng.integers(0, 1000, n_data), jnp.int32), rep)

    base_step = make_train_step(model, optimizer, 1)

    def resident_step(ts, idx, lr, rng_):
        return base_step(ts, data_x[idx], data_y[idx], lr, rng_)

    root_rng = jax.random.key(0, impl="rbg")
    chunk = jax.jit(make_chunked_train_step(resident_step, root_rng),
                    donate_argnums=0)

    from jax.sharding import NamedSharding, PartitionSpec as P
    idx_sh = NamedSharding(mesh, P(None, None, "data"))
    k = args.chunk
    feeds = [jax.device_put(
        rng.integers(0, n_data, size=(k, 1, args.batch)).astype(np.int32),
        idx_sh) for _ in range(4)]
    lrs = jnp.full((k,), 0.1, jnp.float32)

    t0 = time.time()
    ts, metrics = chunk(ts, (feeds[0],), lrs, jnp.int32(0))
    float(metrics["loss"][-1])
    print(f"compiled + first chunk in {time.time()-t0:.0f}s", flush=True)
    ts, metrics = chunk(ts, (feeds[1],), lrs, jnp.int32(k))
    float(metrics["loss"][-1])

    n_dispatch = -(-args.measure // k)
    t0 = time.perf_counter()
    for i in range(n_dispatch):
        ts, metrics = chunk(ts, (feeds[i % len(feeds)],), lrs,
                            jnp.int32((2 + i) * k))
    float(metrics["loss"][-1])
    dt = time.perf_counter() - t0
    steps = n_dispatch * k
    img_s = steps * args.batch / dt
    print(json.dumps({
        "metric": "ilsvrc2012_resnet50_train_images_per_sec_per_chip",
        "value": round(img_s / mesh.size, 1), "unit": "images/sec/chip",
        "batch": args.batch, "remat": args.remat,
        "ms_per_step": round(dt / steps * 1e3, 2)}))

    if args.trace:
        import tempfile

        from trace_step import aggregate_xplane
        trace_dir = tempfile.mkdtemp(prefix="r50trace_")
        jax.profiler.start_trace(trace_dir)
        ts, metrics = chunk(ts, (feeds[0],), lrs, jnp.int32(999 * k))
        float(metrics["loss"][-1])
        jax.profiler.stop_trace()
        per_op = aggregate_xplane(trace_dir, k)
        short = {}
        for name, ms in per_op.items():
            if "%" in name:  # '%opname = ...' HLO lines -> short op name
                name = name.split("%", 1)[1].split(" ", 1)[0]
            if name.startswith("while"):
                continue  # the chunk loop wrapper double-counts its body
            key = name.rstrip("0123456789.")
            short[key] = short.get(key, 0.0) + ms
        print(f"trace dir: {trace_dir}; device op total "
              f"{sum(short.values()):.2f} ms/step")
        for name, ms in sorted(short.items(), key=lambda kv: -kv[1])[:40]:
            if ms >= 0.05:
                print(f"{ms:8.2f} ms  {name}")


if __name__ == "__main__":
    main()
