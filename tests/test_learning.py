"""Generalization test on a NONlinearly-separable task.

Loss-goes-down tests can pass with broken feature learning (the synthetic
dataset's class signal is linear). Here the label is the XOR of two spatial
pattern presences — a linear probe on raw pixels scores chance — so passing
requires the full stack (conv features, BN statistics, augmentation,
momentum SGD) to actually work. The full-size version (ResNet-20, 32x32,
600 steps on a v5e) reaches 0.1% test error vs the linear probe's 49%.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pytorch_ddp_resnet_tpu.algos.steps import (
    finalize_eval_metrics,
    init_train_state,
    make_eval_step,
    make_train_step,
)
from pytorch_ddp_resnet_tpu.data.transforms import (
    FlipTransform,
    PaddingTransform,
    RandomCropTransform,
    StandardizeWhiteningTransform,
    ToTensorTransform,
    make_batch_augment_fn,
)
from pytorch_ddp_resnet_tpu.models import ResNet
from pytorch_ddp_resnet_tpu.utils.optim import get_optimizer
import pytest

HW = 16


def _make_xor_patterns(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(128, 25, size=(n, HW, HW, 3))
    b1 = rng.integers(0, 2, n)
    b2 = rng.integers(0, 2, n)
    yy, xx = np.mgrid[0:6, 0:6]
    pat_a = 90 * np.exp(-((yy - 2.5) ** 2 + (xx - 2.5) ** 2) / 5)
    pat_b = 90 * ((yy + xx) % 2)
    for i in range(n):
        if b1[i]:
            r, c = rng.integers(2, HW - 8, 2)
            x[i, r:r + 6, c:c + 6, 0] += pat_a
        if b2[i]:
            r, c = rng.integers(2, HW - 8, 2)
            x[i, r:r + 6, c:c + 6, 1] += pat_b
    return np.clip(x, 0, 255).astype(np.uint8), (b1 ^ b2).astype(np.int32)


@pytest.mark.slow
def test_learns_nonlinear_task():
    xtr, ytr = _make_xor_patterns(2048, seed=0)
    xte, yte = _make_xor_patterns(512, seed=7)

    # linear probe baseline: raw pixels carry no linear class signal
    xf = xtr[:1024].reshape(1024, -1).astype(np.float64) / 255.0
    w, *_ = np.linalg.lstsq(
        np.concatenate([xf, np.ones((1024, 1))], 1),
        2.0 * ytr[:1024] - 1, rcond=None)
    xt = xte.reshape(512, -1).astype(np.float64) / 255.0
    probe_acc = ((np.concatenate([xt, np.ones((512, 1))], 1) @ w > 0)
                 == yte.astype(bool)).mean()
    assert probe_acc < 0.62, probe_acc  # ~chance

    shape = (HW, HW, 3)
    std = StandardizeWhiteningTransform(shape)
    std.fit(jnp.asarray(xtr, jnp.float32) / 255.0)
    aug = make_batch_augment_fn([
        ToTensorTransform(shape), std, FlipTransform(shape, 0.5),
        PaddingTransform(shape, 2, "zero"),
        RandomCropTransform((HW + 4, HW + 4, 3), HW),
    ])

    model = ResNet(f"c3,16,3,1,1 n a r1 r1 ap{HW // 2},1,0 fc32,2",
                   preact=False, use_proj=False, dropout_prob=0.0,
                   compute_dtype=jnp.float32)
    opt = get_optimizer("SGD", {"lr": 0.1, "momentum": 0.9,
                                "weight_decay": 1e-4})
    ts = init_train_state(model, opt, jax.random.key(0), shape)
    base = make_train_step(model, opt, 1, augment_fn=aug)
    dx, dy = jnp.asarray(xtr), jnp.asarray(ytr)
    n, batch = len(xtr), 128

    def dev_step(ts, lr, rng):
        idx = jax.random.randint(jax.random.fold_in(rng, 0), (1, batch), 0, n)
        return base(ts, dx[idx], dy[idx], lr, rng)

    step = jax.jit(dev_step, donate_argnums=0)
    for i in range(200):
        ts, m = step(ts, jnp.float32(0.1 if i < 150 else 0.01),
                     jax.random.key(i))

    test_fn = lambda x: std.apply_batch(  # noqa: E731
        ToTensorTransform(shape).apply_batch(x))
    ev = jax.jit(make_eval_step(model, test_fn))
    sums = ev(ts["params"], ts["model_state"], jnp.asarray(xte),
              jnp.asarray(yte), jnp.ones((512,)))
    metrics = finalize_eval_metrics(sums)
    # convnet must crush the linear probe
    assert metrics["top1_err"] < 0.25, metrics
