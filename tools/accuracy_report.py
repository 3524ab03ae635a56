"""Render ACCURACY.md-style learning-curve reports from run directories.

Reads the TensorBoard event files a training run writes
(``models_dir/<run>/tensorboard_logs``) and emits a markdown section per
run: final/best validation top-1 error, a downsampled validation curve,
train-loss milestones, and sustained throughput. Used to document the
offline accuracy-gate proxy runs (VERDICT round 1 item 1 fallback).

Usage:
    python tools/accuracy_report.py <models_dir> <run_name> [<run_name>...]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


def load_scalars(log_dir: str):
    """tag -> list[(step, value)] from every event file in log_dir.

    Uses the framework's own raw protobuf reader (utils/tb.read_scalars):
    stock TensorBoard's EventFileLoader migrates legacy simple_value
    records into tensor form, so ``value.simple_value`` reads back 0.0.
    """
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pytorch_ddp_resnet_tpu.utils.tb import read_scalars

    out = defaultdict(list)
    for f in sorted(glob.glob(os.path.join(log_dir, "events.out.tfevents.*"))):
        for step, tag, value in read_scalars(f):
            out[tag].append((step, value))
    for tag in out:
        out[tag].sort()
    return dict(out)


def _fmt_pct(v: float) -> str:
    return f"{100.0 * v:.2f}%"


def _downsample(series, n=12):
    if len(series) <= n:
        return series
    idx = [round(i * (len(series) - 1) / (n - 1)) for i in range(n)]
    return [series[i] for i in sorted(set(idx))]


def report(models_dir: str, run_name: str) -> str:
    run_dir = os.path.join(models_dir, run_name)
    scalars = load_scalars(os.path.join(run_dir, "tensorboard_logs"))
    lines = [f"## {run_name}", ""]

    val_err = scalars.get("val/top1_err", [])
    val_loss = dict(scalars.get("val/loss", []))
    train_loss = scalars.get("train/loss", [])
    ips = [v for _, v in scalars.get("train/images_per_sec", [])]

    if not val_err:
        lines.append("*(no validation records found)*")
        return "\n".join(lines)

    best_ep, best = min(val_err, key=lambda sv: sv[1])
    last_ep, last = val_err[-1]
    lines.append(
        f"- **final val top-1 err: {_fmt_pct(last)}** (epoch {last_ep}); "
        f"best {_fmt_pct(best)} @ epoch {best_ep}")
    if train_loss:  # an eval-only events file has no train records
        lines.append(
            f"- final val loss: {val_loss.get(last_ep, float('nan')):.4f}; "
            f"train loss end: {train_loss[-1][1]:.4f} "
            f"(start: {train_loss[0][1]:.4f}) "
            f"over {train_loss[-1][0] + 1} steps")
    if ips:
        tail = ips[len(ips) // 2:]  # sustained: second half of the run
        lines.append(
            f"- sustained throughput: {sum(tail) / len(tail):,.0f} "
            f"images/sec/chip (mean of second half)")
    lines += ["", "| epoch | val top-1 err | val loss |", "|---|---|---|"]
    for ep, v in _downsample(val_err):
        loss = val_loss.get(ep)
        lines.append(f"| {ep} | {_fmt_pct(v)} | "
                     f"{'' if loss is None else f'{loss:.4f}'} |")
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    models_dir, runs = sys.argv[1], sys.argv[2:]
    print("\n".join(report(models_dir, r) for r in runs))
