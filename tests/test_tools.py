"""tools/ scripts: accuracy report + QDA oracle sanity."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_accuracy_report_roundtrip(tmp_path):
    """Report reads back what the framework's TB writer wrote."""
    from pytorch_ddp_resnet_tpu.utils.tb import SummaryWriter

    run = tmp_path / "models_dir" / "myrun"
    log_dir = run / "tensorboard_logs"
    w = SummaryWriter(str(log_dir))
    for step in range(200):
        w.add_scalar("train/loss", 2.0 / (1 + step), step)
        w.add_scalar("train/images_per_sec", 1000.0, step)
    for ep in range(4):
        w.add_scalar("val/top1_err", 0.5 - 0.1 * ep, ep)
        w.add_scalar("val/loss", 1.0 - 0.2 * ep, ep)
    w.close()

    from accuracy_report import load_scalars, report

    scalars = load_scalars(str(log_dir))
    assert len(scalars["train/loss"]) == 200
    assert scalars["val/top1_err"][-1] == (3, np.float32(0.2))

    md = report(str(tmp_path / "models_dir"), "myrun")
    assert "final val top-1 err: 20.00%" in md
    assert "best 20.00% @ epoch 3" in md
    assert "1,000 images/sec" in md


def test_spectral_qda_oracle_ordering():
    """The QDA oracle separates easy from hard settings (the calibration
    ACCURACY.md cites): fully-separated masks are near zero error, tiny
    class_sep is near chance."""
    from spectral_qda import qda_error

    easy = qda_error(1.0, n_train=1200, n_test=400)
    hard = qda_error(0.01, n_train=1200, n_test=400)
    assert easy < 0.05
    assert hard > 0.5  # chance for 10 classes is 0.9


def test_accuracy_report_cli(tmp_path):
    from pytorch_ddp_resnet_tpu.utils.tb import SummaryWriter

    log_dir = tmp_path / "m" / "r" / "tensorboard_logs"
    w = SummaryWriter(str(log_dir))
    w.add_scalar("train/loss", 1.0, 0)
    w.add_scalar("val/top1_err", 0.25, 0)
    w.add_scalar("val/loss", 0.9, 0)
    w.close()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "accuracy_report.py"),
         str(tmp_path / "m"), "r"],
        capture_output=True, text=True, check=True)
    assert "25.00%" in out.stdout
