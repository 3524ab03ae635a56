"""Trace the WRN train step on TPU and aggregate per-op device time.

Mirrors bench.py's dispatch (chunked resident train step, b256 bf16), runs
one warm dispatch under jax.profiler, parses the xplane proto with the
installed tensorflow, and prints per-op-name totals (ms per step) sorted
descending — the tool behind BASELINE.md's "where the step time actually
goes" analyses.

    BENCH_FUSED_BLOCK=1 python tools/trace_step.py [--steps 8] [--top 40]

Env knobs are bench.py's (BENCH_PALLAS_CONV / BENCH_FUSED_BLOCK).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH = int(os.environ.get("BENCH_BATCH", "256"))


def build_chunk(steps: int):
    from pytorch_ddp_resnet_tpu.algos.steps import (
        init_train_state,
        make_chunked_train_step,
        make_train_step,
    )
    from pytorch_ddp_resnet_tpu.data.datasets import load_synthetic
    from pytorch_ddp_resnet_tpu.data.pipeline import build_transforms
    from pytorch_ddp_resnet_tpu.data.transforms import make_batch_augment_fn
    from pytorch_ddp_resnet_tpu.models import ResNet
    from pytorch_ddp_resnet_tpu.parallel.mesh import (
        make_mesh,
        replicated_sharding,
    )
    from pytorch_ddp_resnet_tpu.utils.optim import get_optimizer

    mesh = make_mesh()
    model = ResNet("c3,160,3,1,1 r4 r4 r4 n a ap8,1,0 fc640,10",
                   preact=True, use_proj=True, dropout_prob=0.3,
                   compute_dtype=jnp.bfloat16,
                   pallas_conv=os.environ.get("BENCH_PALLAS_CONV") == "1",
                   fused_block=os.environ.get("BENCH_FUSED_BLOCK") == "1",
                   int8_train=(os.environ.get("BENCH_INT8_TRAIN") == "1"
                               or os.environ.get("BENCH_INT8_BWD") == "1"),
                   int8_train_bwd=os.environ.get("BENCH_INT8_BWD") == "1",
                   inkernel_dropout=(
                       os.environ.get("BENCH_INKERNEL_DROPOUT") == "1"),
                   lane_transition=(
                       os.environ.get("BENCH_LANE_TRANSITION") == "1"))
    optimizer = get_optimizer("SGD", {
        "lr": 0.1, "momentum": 0.9, "nesterov": True, "weight_decay": 5e-4})
    ds = load_synthetic(None, train=True, n_train=4096,
                        shape=(32, 32, 3), num_classes=10)
    aug_spec = {
        "ToTensorTransform": {},
        "StandardizeWhiteningTransform": {},
        "FlipTransform": {"p": 0.5},
        "PaddingTransform": {"pad_size": 4, "pad_type": "mirror"},
        "RandomCropTransform": {"crop_size": 32},
    }
    with tempfile.TemporaryDirectory() as tmp:
        transforms = build_transforms(ds, aug_spec, tmp, is_train=True)
    if jax.default_backend() == "tpu":
        from pytorch_ddp_resnet_tpu.ops.pallas.augment import (
            try_from_transforms)

        augment = try_from_transforms(transforms, ds.x)
        pass_indices = True
    else:
        augment = make_batch_augment_fn(list(transforms.values()))
        pass_indices = False

    ts = init_train_state(model, optimizer, jax.random.key(0), (32, 32, 3))
    rep = replicated_sharding(mesh)
    ts = jax.device_put(ts, rep)
    data_x = jax.device_put(ds.x, rep)
    data_y = jax.device_put(ds.y.astype(np.int32), rep)
    base_step = make_train_step(model, optimizer, 1, augment_fn=augment)

    def resident_step(ts, idx, lr, rng):
        x = idx if pass_indices else data_x[idx]
        return base_step(ts, x, data_y[idx], lr, rng)

    root_rng = jax.random.key(0, impl="rbg")
    chunk = jax.jit(make_chunked_train_step(resident_step, root_rng),
                    donate_argnums=0)

    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    idx = jax.device_put(
        rng.integers(0, len(ds), size=(steps, 1, BATCH)).astype(np.int32),
        NamedSharding(mesh, P(None, None, "data")))
    lrs = jnp.full((steps,), 0.1, jnp.float32)
    return chunk, ts, idx, lrs


def aggregate_xplane(trace_dir: str, steps: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xspace.ParseFromString(f.read())
    totals = collections.Counter()
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            # XLA op lines carry per-op events; step/trace lines would
            # double-count, so keep only op-level lines
            if line.name not in ("XLA Ops", "XLA Modules", "Steps"):
                if "op" not in line.name.lower():
                    continue
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                totals[name] += ev.duration_ps
    return {k: v / 1e9 / steps for k, v in totals.items()}  # ms per step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--contains", default=None,
                    help="only print ops whose name contains this substring")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    chunk, ts, idx, lrs = build_chunk(args.steps)
    # the chunk donates its train-state argument: thread it through
    ts, metrics = chunk(ts, (idx,), lrs, jnp.int32(0))
    float(metrics["loss"][-1])

    trace_dir = tempfile.mkdtemp(prefix="trace_step_")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    ts, metrics = chunk(ts, (idx,), lrs, jnp.int32(args.steps))
    float(metrics["loss"][-1])
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    per_op = aggregate_xplane(trace_dir, args.steps)
    if args.contains:
        per_op = {k: v for k, v in per_op.items() if args.contains in k}
    total = sum(per_op.values())
    print(f"wall: {wall * 1e3 / args.steps:.2f} ms/step; device op total: "
          f"{total:.2f} ms/step; trace: {trace_dir}", flush=True)
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{ms:9.3f} ms  {name}")


if __name__ == "__main__":
    main()
