"""Trace the serving forward (float vs int8 PTQ) and aggregate device time.

Companion to tools/eval_int8_serving.py: answers WHERE the int8 path's
kernel-level win goes end-to-end (quantize chains, delane/relane copies,
un-fused epilogues) by printing per-op device totals for both programs.

    python tools/trace_serving.py --models_dir=... --run_name=... \
        --data_dir=... [--batch 256] [--steps 8] [--top 30]
"""

from __future__ import annotations

import argparse
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

from tools.trace_step import aggregate_xplane  # noqa: E402


def trace_predictor(pred, x_u8, batch: int, steps: int):
    xb = jnp.asarray(x_u8[:batch])
    out = pred._fwd(xb)
    float(out[0, 0])  # warm + sync
    trace_dir = tempfile.mkdtemp(prefix="trace_serving_")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = pred._fwd(xb)
    float(out[0, 0])
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    return wall / steps, aggregate_xplane(trace_dir, steps)


def report(tag, wall, per_op, top):
    total = sum(per_op.values())
    print(f"\n== {tag}: wall {wall*1e3:.2f} ms/batch, device op total "
          f"{total:.2f} ms ==")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:9.3f} ms  {name}")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models_dir", required=True)
    ap.add_argument("--run_name", required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from pytorch_ddp_resnet_tpu.algos.predict import load_predictor
    from pytorch_ddp_resnet_tpu.data.datasets import get_dataset
    from pytorch_ddp_resnet_tpu.utils.config import get_config

    config = get_config(args.models_dir, args.run_name, mode="eval",
                        data_dir=args.data_dir, verbose=False)
    test = get_dataset(config["dataset_cls_name"], args.data_dir,
                       train=False, **config.get("dataset_args", {}) or {})
    x = np.asarray(test.x)

    fp = load_predictor(config, batch_size=args.batch)
    wall_f, ops_f = trace_predictor(fp, x, args.batch, args.steps)
    report("float bf16", wall_f, ops_f, args.top)

    qp = load_predictor(config, batch_size=args.batch, quantize="int8")
    wall_q, ops_q = trace_predictor(qp, x, args.batch, args.steps)
    report("int8 PTQ", wall_q, ops_q, args.top)


if __name__ == "__main__":
    main()
