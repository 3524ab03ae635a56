"""Real-TPU validation of the int8 post-training-quantized serving path.

Loads a trained run's latest checkpoint twice — float (BN-folded bf16) and
int8 (models/quantize.py w8a8) — evaluates both on the run's full test set,
and times steady-state serving throughput for both.

Timing on this tunneled host follows the bench_conv.py rule: chain many
batches inside one timed window with a single final readback, then subtract
nothing — at batch>=256 the per-window RTT is amortized below the noise
floor; we also report a 2-length difference estimate to be safe.

Usage:
  python tools/eval_int8_serving.py --models_dir=/tmp/accrun/models_dir \
      --run_name=wrn-28-10-dropout_synthspectral-hard \
      --data_dir=/tmp/accrun/data [--batch=256] [--timed_batches=40]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def top1_err(pred, x, y, batch):
    labels = pred.predict(x)
    return float((labels != y).mean())


def serving_rate(pred, x, batch, n_batches, n_warmup=3):
    """img/s over n_batches chained dispatches with one final readback."""
    xb = jnp.asarray(x[:batch])
    for _ in range(n_warmup):
        out = pred._fwd(xb)
    float(out[0, 0])  # sync

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = pred._fwd(xb)
        float(out[0, 0])
        return time.perf_counter() - t0

    t_full, t_half = run(n_batches), run(n_batches // 2)
    # 2-length difference cancels the constant dispatch+readback RTT
    dt = (t_full - t_half) / (n_batches - n_batches // 2)
    return batch / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models_dir", required=True)
    ap.add_argument("--run_name", required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--timed_batches", type=int, default=40)
    ap.add_argument("--calib_samples", type=int, default=512)
    args = ap.parse_args()

    from pytorch_ddp_resnet_tpu.algos.predict import load_predictor
    from pytorch_ddp_resnet_tpu.data.datasets import get_dataset
    from pytorch_ddp_resnet_tpu.utils.config import get_config

    config = get_config(args.models_dir, args.run_name, mode="eval",
                        data_dir=args.data_dir, verbose=False)
    test = get_dataset(config["dataset_cls_name"], args.data_dir,
                       train=False,
                       **config.get("dataset_args", {}) or {})
    x, y = np.asarray(test.x), np.asarray(test.y)
    print(f"test set: {x.shape} {x.dtype}, {len(np.unique(y))} classes")

    print("== float (bf16, BN-folded) ==", flush=True)
    fp = load_predictor(config, batch_size=args.batch, verbose=True)
    err_f = top1_err(fp, x, y, args.batch)
    rate_f, dt_f = serving_rate(fp, x, args.batch, args.timed_batches)
    print(f"float:  top-1 err {err_f:.4f}  "
          f"{rate_f:,.0f} img/s  ({dt_f*1e3:.2f} ms/batch)", flush=True)

    print("== int8 (w8a8 PTQ) ==", flush=True)
    qp = load_predictor(config, batch_size=args.batch, quantize="int8",
                        calib_samples=args.calib_samples, verbose=True)
    err_q = top1_err(qp, x, y, args.batch)
    rate_q, dt_q = serving_rate(qp, x, args.batch, args.timed_batches)
    print(f"int8:   top-1 err {err_q:.4f}  "
          f"{rate_q:,.0f} img/s  ({dt_q*1e3:.2f} ms/batch)", flush=True)

    agree = float((fp.predict(x[:2048]) == qp.predict(x[:2048])).mean())
    print(f"top-1 agreement (first 2048): {agree:.4f}")
    print(f"speedup: {rate_q / rate_f:.3f}x, "
          f"err delta: {err_q - err_f:+.4f}")


if __name__ == "__main__":
    main()
