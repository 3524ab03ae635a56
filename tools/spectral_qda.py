"""Near-Bayes-oracle baseline for the SyntheticSpectral proxy task.

SyntheticSpectral samples are class-conditional Gaussian random fields
(data/datasets.py:load_synthetic_spectral), so the (approximately) optimal
classifier is quadratic discriminant analysis on the periodogram: each
rfft2 bin's power is ~exponential with class-dependent scale V_k(f), giving
log-likelihood  sum_f [ -P(f)/V_k(f) - log V_k(f) ].

This script scores that oracle (with V_k estimated from train samples) per
``class_sep`` — it is how the difficulty knob of the *-hard run configs was
calibrated (class_sep=0.05 -> ~7.4% QDA error, a CIFAR-10-like floor), and
it provides the reference line the trained networks are compared against
in ACCURACY.md. A conv net must beat/approach this oracle from pixels
alone, through the full augmentation + bf16 + SPMD training stack.

Usage: python tools/spectral_qda.py [class_sep ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def qda_error(class_sep: float, n_train: int = 8000, n_test: int = 2000,
              num_classes: int = 10) -> float:
    from pytorch_ddp_resnet_tpu.data.datasets import load_synthetic_spectral

    tr = load_synthetic_spectral(None, True, n_train=n_train, n_test=n_test,
                                 num_classes=num_classes, class_sep=class_sep)
    te = load_synthetic_spectral(None, False, n_train=n_train, n_test=n_test,
                                 num_classes=num_classes, class_sep=class_sep)

    def periodogram(x):
        xm = x.astype(np.float32)
        xm = xm - xm.mean((1, 2, 3), keepdims=True)
        return np.abs(np.fft.rfft2(xm.mean(-1), axes=(1, 2))) ** 2

    p_tr, p_te = periodogram(tr.x), periodogram(te.x)
    v = np.stack([p_tr[tr.y == k].mean(0)
                  for k in range(num_classes)]) + 1e-3
    loglik = (-(p_te[:, None] / v[None]).sum((2, 3))
              - np.log(v).sum((1, 2))[None])
    return float((loglik.argmax(1) != te.y).mean())


if __name__ == "__main__":
    seps = [float(s) for s in sys.argv[1:]] or [1.0, 0.1, 0.05, 0.04]
    for sep in seps:
        print(f"class_sep={sep:g}: QDA test err = {100 * qda_error(sep):.2f}%",
              flush=True)
