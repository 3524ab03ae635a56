"""NV-trunk serving-accuracy gate on a trained STREAMING-run checkpoint.

The int8 bottleneck substrates (XLA int8-dot and the NV-layout fused
trunk, models/quantize.py) are bit-parity-tested against their own
mirrors, but substrate default flips are accuracy-gated by policy
(ACCURACY.md): they must be evaluated float-vs-quantized on a TRAINED
checkpoint of the model family they accelerate. The shipped ImageNet
recipes stream JPEGs, so eval_int8_serving.py's resident-dataset path
does not apply; this tool materializes the streamed val set through the
deterministic host test pipeline (scale + center crop) once, then
compares the float, int8-dot, and int8-NV predictors on identical
resident uint8 batches: top-1 error, top-1 agreement vs float, and
steady-state serving rate.

Usage (checkpoint from a completed streaming training run):
  python tools/eval_nv_gate.py --models_dir=/root/r5_models \
      --run_name=resnet-50_ilsvrc2012 --data_dir=/root/data_r5 \
      [--batch=128] [--timed_batches=40] [--calib_samples=512]

Reference parity target: the quantized point of the post-act bottleneck
semantics (reference residual_block.py:102-215) on the README's
headline ImageNet configs (reference README.md:76-77).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from eval_int8_serving import serving_rate  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models_dir", required=True)
    ap.add_argument("--run_name", required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--timed_batches", type=int, default=40)
    ap.add_argument("--calib_samples", type=int, default=512)
    ap.add_argument("--variants", default="dot,nv",
                    help="comma list of int8 substrates to gate "
                         "(dot = XLA int8 dots, nv = fused NV trunk)")
    ap.add_argument("--trace", action="store_true",
                    help="also profile each variant's serving forward "
                         "and print per-op device totals "
                         "(tools/trace_serving.py's aggregation)")
    args = ap.parse_args()

    from pytorch_ddp_resnet_tpu.algos.predict import Predictor
    from pytorch_ddp_resnet_tpu.algos.train import setup
    from pytorch_ddp_resnet_tpu.utils.config import get_config

    config = get_config(args.models_dir, args.run_name, mode="eval",
                        data_dir=args.data_dir, verbose=False)
    ls = setup(config, verbose=True)
    if ls["global_step"] == 0:
        raise SystemExit("no checkpoint found — the gate needs a trained "
                         "run (refusing to gate accuracy on a fresh init)")
    pipe = ls["pipeline"]
    if not hasattr(pipe, "test_ds"):
        raise SystemExit("this run is resident, not streaming — use "
                         "tools/eval_int8_serving.py instead")

    # materialize the val set once through the deterministic host test
    # path (short-side scale + center crop), identical for every variant
    idx = np.arange(len(pipe.test_ds))
    x, y = pipe._assemble(pipe.test_ds.paths, pipe.test_ds.labels,
                          pipe._proc_test, 0, idx)
    calib = pipe.fit_sample(args.calib_samples)
    print(f"val set {x.shape} {x.dtype}, {len(np.unique(y))} classes; "
          f"calib {calib.shape}; checkpoint step {ls['global_step']}",
          flush=True)

    def build(variant):
        pred = Predictor(ls["model"], ls["train_state"]["params"],
                         ls["train_state"]["model_state"],
                         ls["preprocess_fn"], batch_size=args.batch)
        if variant == "float":
            return pred
        pred.quantize_int8(calib,
                           fused_bneck="nv" if variant == "nv" else False)
        return pred

    results = {}
    labels_float = None
    for variant in ["float"] + [v for v in args.variants.split(",") if v]:
        print(f"== {variant} ==", flush=True)
        pred = build(variant)
        labels = pred.predict(x)
        err = float((labels != y).mean())
        rate, dt = serving_rate(pred, x, args.batch, args.timed_batches)
        row = {"top1_err": round(err, 4), "img_per_s": round(rate),
               "ms_per_batch": round(dt * 1e3, 2)}
        if variant == "float":
            labels_float = labels
        else:
            row["agreement"] = round(float((labels == labels_float).mean()),
                                     4)
            row["err_delta"] = round(err - results["float"]["top1_err"], 4)
            row["speedup"] = round(rate / results["float"]["img_per_s"], 3)
        results[variant] = row
        print(json.dumps({variant: row}), flush=True)
        if args.trace:
            from trace_serving import report, trace_predictor
            wall, per_op = trace_predictor(pred, x, args.batch, 8)
            report(variant, wall, per_op, 25)
    print(json.dumps({"run": args.run_name,
                      "step": int(ls["global_step"]),
                      "results": results}))


if __name__ == "__main__":
    main()
